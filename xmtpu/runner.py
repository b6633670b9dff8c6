"""Batch runner: many clips through the fused pipeline (config 4,
BASELINE.json:10 — "256 podcast clips ... on one TPU chip").

Reference analogue: there is none — the C library is invoked once per
clip by the caller [upstream, SURVEY.md §2.2]; the batch axis IS the
rebuild's data-parallel strategy.

Mechanics (SURVEY.md §5/§7.3):
* **bucketing by (native rate, length)** — clips group by their native
  sample rate and pad to geometric length edges (ratio 1.25) so the
  jitted masked step compiles once per rate and bucket, not per clip;
* **failure isolation** — a clip that fails to decode is skipped and
  reported; the batch never dies (SURVEY.md §5 failure detection);
* **resume** — a done-marker (``<out>.done``) is written per clip; a
  re-run skips clips already marked (SURVEY.md §5 checkpoint/resume);
* **metrics** — clips, audio-sec, wall-sec, realtime factor, printed
  and JSON-dumpable (SURVEY.md §5 observability).
"""

from __future__ import annotations

import json
import logging
import math
import os
import time
from dataclasses import dataclass, field

import numpy as np

from xmtpu.io import open_audio
from xmtpu.io.wav import write_wav
from xmtpu.utils.errors import XmtpuError

log = logging.getLogger("xmtpu.runner")

_BUCKET_RATIO = 1.25


@dataclass
class ClipJob:
    """One clip: voice (path or (pcm, sr)), optional bgm, output path."""

    voice: object
    out: str
    bgm: object = None


@dataclass
class BatchReport:
    total: int = 0
    done: int = 0
    skipped_resume: int = 0
    failed: list = field(default_factory=list)  # (out_path, error str)
    audio_sec: float = 0.0
    wall_sec: float = 0.0
    buckets: int = 0

    @property
    def realtime_factor(self) -> float:
        return self.audio_sec / self.wall_sec if self.wall_sec > 0 else 0.0

    def to_json(self) -> str:
        return json.dumps(
            {
                "total": self.total,
                "done": self.done,
                "skipped_resume": self.skipped_resume,
                "failed": self.failed,
                "audio_sec": round(self.audio_sec, 3),
                "wall_sec": round(self.wall_sec, 3),
                "realtime_factor": round(self.realtime_factor, 1),
                "buckets": self.buckets,
            }
        )


def _bucket_edge(n: int, base: int = 16384) -> int:
    """Smallest geometric bucket edge >= n (ratio 1.25, floor ``base``)."""
    e = base
    while e < n:
        e = int(math.ceil(e * _BUCKET_RATIO))
    return e


def _load_mono_i16(src, sr_default: int):
    """Decode to mono int16 (host-side, thin). -> (pcm, native_rate)."""
    if isinstance(src, tuple):
        pcm, sr = src
    elif isinstance(src, np.ndarray):
        pcm, sr = src, sr_default
    else:
        with open_audio(src) as d:
            pcm, sr = d.read_all(), d.sample_rate
    pcm = np.asarray(pcm)
    if pcm.ndim > 1:
        pcm = pcm.mean(axis=1) if pcm.dtype != np.int16 else pcm[:, 0]
    if pcm.dtype != np.int16:
        from xmtpu.ops.convert import f32_to_pcm16_np

        pcm = f32_to_pcm16_np(pcm.astype(np.float32))
    return pcm, int(sr)


def run_batch(
    jobs,
    sr_in: int = 44100,
    sr_bus: int = 16000,
    batch_size: int = 64,
    resume: bool = True,
    step_kw: dict | None = None,
    write_done_markers: bool = True,
) -> BatchReport:
    """Run clips through the fused masked pipeline.

    Clips bucket by (native rate, length edge); mixed-rate manifests
    are fine. ``sr_in`` is only the assumed rate for bare-ndarray
    inputs (files carry their own). A clip whose rate would produce an
    unreasonable polyphase ratio is failed individually, and a bucket
    that errors fails only its own clips — the batch never dies
    (SURVEY.md §5 failure isolation).
    """
    import jax
    import jax.numpy as jnp
    from xmtpu import batch as xbatch

    report = BatchReport(total=len(jobs))
    t_start = time.perf_counter()

    # -- resolve + decode (failure-isolated), assign buckets ---------------
    # mixed input rates are supported: clips bucket by (native_rate,
    # length edge) so each bucket compiles one masked step for its rate
    pending = []  # (job, voice_i16, bgm_i16_or_None, (rate, edge))
    for job in jobs:
        if not isinstance(job, ClipJob):
            job = ClipJob(**job)
        if resume and os.path.exists(job.out + ".done"):
            report.skipped_resume += 1
            continue
        try:
            v, v_sr = _load_mono_i16(job.voice, sr_in)
            if job.bgm is not None:
                b, b_sr = _load_mono_i16(job.bgm, sr_in)
                if b_sr != v_sr:  # align bgm to the voice's rate on host
                    from xmtpu.ops.convert import (f32_to_pcm16_np,
                                                   pcm16_to_f32_np)
                    from xmtpu.ops.resample import resample_oracle_np

                    b = f32_to_pcm16_np(
                        resample_oracle_np(
                            pcm16_to_f32_np(b).astype(np.float64), b_sr, v_sr
                        ).astype(np.float32)
                    )
            else:
                b = None
            if len(v) == 0:
                raise XmtpuError("empty clip")
            g = math.gcd(v_sr, sr_bus)
            if not (4000 <= v_sr <= 192000) or v_sr // g > 2048:
                raise XmtpuError(
                    f"unreasonable input rate {v_sr} (polyphase ratio "
                    f"{sr_bus // g}/{v_sr // g})"
                )
        except Exception as e:  # isolate per-clip decode failures
            log.warning("clip %s failed to decode: %s", job.out, e)
            report.failed.append((job.out, str(e)))
            continue
        pending.append((job, v, b, (v_sr, _bucket_edge(len(v)))))

    # -- group by bucket, process in device batches -------------------------
    step_cache: dict = {}
    buckets: dict[tuple, list] = {}
    for item in pending:
        buckets.setdefault(item[3], []).append(item)
    report.buckets = len(buckets)

    for (rate, edge), items in sorted(buckets.items()):
        try:
            g = math.gcd(rate, sr_bus)
            L, M = sr_bus // g, rate // g
            if rate not in step_cache:
                step_cache[rate] = jax.jit(
                    xbatch.make_batch_step(sr_in=rate, sr_bus=sr_bus,
                                           **(step_kw or {}))
                )
            step = step_cache[rate]
        except Exception as e:  # a bad bucket fails only its own clips
            log.warning("bucket (%s Hz, %s) failed to build: %s", rate, edge, e)
            for (job, _, _, _) in items:
                report.failed.append((job.out, f"bucket build failed: {e}"))
            continue
        for i in range(0, len(items), batch_size):
            chunk = items[i : i + batch_size]
            B = len(chunk)
            voice = np.zeros((B, edge), np.int16)
            bgm = np.zeros((B, edge), np.int16)
            lengths = np.zeros((B,), np.int32)
            for r, (job, v, b, _) in enumerate(chunk):
                voice[r, : len(v)] = v
                lengths[r] = len(v)
                if b is not None and len(b) > 0:
                    reps = -(-len(v) // len(b))
                    bgm[r, : len(v)] = np.tile(b, reps)[: len(v)]
            try:
                out = np.asarray(
                    step(jnp.asarray(voice), jnp.asarray(bgm),
                         jnp.asarray(lengths))
                )
            except Exception as e:
                log.warning("bucket (%s Hz, %s) chunk failed: %s",
                            rate, edge, e)
                for (job, _, _, _) in chunk:
                    report.failed.append((job.out, f"device step failed: {e}"))
                continue
            for r, (job, v, b, _) in enumerate(chunk):
                m = -(-(int(lengths[r]) * L) // M)  # ceil (parens matter)
                write_wav(job.out, out[r, :m], sr_bus)
                if write_done_markers:
                    with open(job.out + ".done", "w") as f:
                        f.write("ok\n")
                report.done += 1
                report.audio_sec += int(lengths[r]) / rate

    report.wall_sec = time.perf_counter() - t_start
    log.info("batch: %s", report.to_json())
    return report
