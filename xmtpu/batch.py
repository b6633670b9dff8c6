"""Batched offline pipeline (layer N6; BASELINE.json:10 config 4).

Reference analogue: processing many clips by invoking the C library once
per clip [upstream has no batch mode — SURVEY.md §2.2]. The TPU-native
replacement is a **batch axis**: a [B, n] clip tensor runs the whole
decode-side chain (resample -> mix -> EQ -> reverb -> limiter -> i16)
as ONE jitted computation; clips shard over chips via a ``("dp",)``
mesh (``jax.sharding.NamedSharding``), the data-parallel strategy of
SURVEY.md §2.2.

``flagship_step`` is the framework's headline computation: it is what
``bench.py`` times and what ``__graft_entry__`` compile-checks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from xmtpu.ops import biquad as _biquad
from xmtpu.ops import convert as _convert
from xmtpu.ops import limiter as _limiter
from xmtpu.ops import mix as _mix
from xmtpu.ops import resample as _resample
from xmtpu.ops import reverb as _reverb

DEFAULT_BANDS = (
    {"freq_hz": 100.0, "gain_db": 4.0, "q": 1.0},
    {"freq_hz": 400.0, "gain_db": -3.0, "q": 1.2},
    {"freq_hz": 1000.0, "gain_db": 2.5, "q": 0.9},
    {"freq_hz": 4000.0, "gain_db": -2.0, "q": 1.1},
    {"freq_hz": 7000.0, "gain_db": 3.0, "q": 0.8},
)


def make_flagship_step(
    sr_in: int = 44100,
    sr_bus: int = 16000,
    bands=DEFAULT_BANDS,
    ir_seconds: float = 0.25,
    wet: float = 0.25,
    dry: float = 0.75,
    bgm_gain: float = 0.4,
    fade_ms: float = 250.0,
    threshold_db: float = -3.0,
    iir_dtype=jnp.float64,
):
    """Build the full-chain step fn(voice_i16[B,n], bgm_i16[B,n]) -> i16[B,m].

    Chain per BASELINE.json:5: int16->f32, polyphase resample sr_in->
    sr_bus, voice+BGM mix with gain/fade, peak normalize, 5-band EQ,
    FIR reverb, soft-knee limiter, f32->int16 — all fused in one jit,
    never leaving HBM between stages.

    ``iir_dtype``: float64 (oracle-grade, SURVEY.md §7.4②) or float32
    (fast path; -77 dB floor).
    """
    sos = _biquad.eq_sos(list(bands), sr_bus)
    ir = _reverb.synthetic_ir(ir_seconds, sr_bus).astype("float32")

    def step(voice_i16: jnp.ndarray, bgm_i16: jnp.ndarray) -> jnp.ndarray:
        v = _convert.pcm16_to_f32(voice_i16)
        b = _convert.pcm16_to_f32(bgm_i16)
        v = _resample.polyphase_resample(v, sr_in, sr_bus)
        b = _resample.polyphase_resample(b, sr_in, sr_bus)
        n = v.shape[-1]
        fade = int(round(fade_ms * sr_bus / 1000.0))
        v = _mix.apply_gain_fade(v, 1.0, fade, fade, length=n)
        b = _mix.apply_gain_fade(b, bgm_gain, fade, fade, length=n)
        out = v + b
        out, _ = _mix.peak_normalize(out, _mix.db_to_amp(-1.0))
        out, _ = _biquad.sosfilt_scan(sos, out, state_dtype=iir_dtype)
        out = _reverb.reverb(out, jnp.asarray(ir), wet=wet, dry=dry)
        out, _ = _limiter.limiter(
            out[..., None, :], sr_bus, threshold_db=threshold_db
        )
        return _convert.f32_to_pcm16(out[..., 0, :])

    return step


def shard_over_batch(n_devices: int | None = None):
    """1-D data-parallel mesh over clips (SURVEY.md §2.2 DP row)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    mesh = jax.sharding.Mesh(devs[:n], ("dp",))
    return mesh, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp", None)
    )


def flagship_step_sharded(mesh, **kw):
    """Jit the flagship step with clips sharded over the ``dp`` axis."""
    step = make_flagship_step(**kw)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp", None)
    )
    return jax.jit(step, in_shardings=(spec, spec), out_shardings=spec)
