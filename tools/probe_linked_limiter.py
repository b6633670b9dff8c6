"""Chip A/B probe: config-3 chain with the round-5 LINKED FUSED
limiter (ops.limiter linked_fuse=True -> kernels.envelope.
linked_limiter_pallas: in-kernel soft-knee gain, segmented pass B on an
exact decay-window-dot init) vs the default unfused gain pass.

Usage: python tools/probe_linked_limiter.py [linked=0|1]

Same shape/timing convention as benchmarks.config3_effects (public
xmtpu.effects, one fetch per timed region, iters=40); run each variant
in its OWN process, >=3 runs each before any default flip (CLAUDE.md
rule). Prints one JSON line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    linked = any(a == "linked=1" for a in sys.argv[1:])
    for a in sys.argv[1:]:
        if a not in ("linked=0", "linked=1"):
            sys.exit(f"probe_linked_limiter: unknown argument {a!r}")

    import jax.numpy as jnp

    from xmtpu import effects
    from xmtpu.batch import DEFAULT_BANDS
    from xmtpu.benchmarks import _acquire_chip_lock, _timeit
    from xmtpu.ops import reverb

    _lock = _acquire_chip_lock()  # noqa: F841 — held until process exit
    sr, seconds, batch = 48000, 10.0, 16
    n = int(sr * seconds)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (0.3 * rng.standard_normal((batch, n, 2))).astype(np.float32))
    ir = reverb.synthetic_ir(0.5, sr).astype(np.float32)
    chain = [
        {"name": "equalizer", "params": {"bands": list(DEFAULT_BANDS)}},
        {"name": "reverb", "params": {"ir": ir, "wet": 0.3, "dry": 0.7}},
        {"name": "limiter", "params": {"linked_fuse": bool(linked)}},
    ]
    run = lambda: effects(x, sr, chain, device_out=True)  # noqa: E731
    dt = _timeit(run, lambda o: np.asarray(o[0, :4, 0]))
    print(json.dumps({
        "probe": "linked_limiter", "linked_fuse": bool(linked),
        "audio_sec_per_sec": round(batch * seconds / dt, 1)}))


if __name__ == "__main__":
    main()
