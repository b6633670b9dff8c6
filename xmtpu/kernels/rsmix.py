"""Pallas kernel: fused int16 voice+BGM polyphase resample + gain/fade
mix — the batch chain's front end in ONE pass over the int16 inputs.

Reference analogue: the decode->resample->mix front of the pipeline
(``src/effects/mixer_effects/`` + resampler [upstream, SURVEY.md §2.1]).

Why a kernel: the XLA front end (concat i16 -> f32 convert -> banded
resample matmul -> gain/fade -> sum) moves ~2.1 GB of HBM traffic at
batch 256 (measured 10.6 ms + the mix pass); reading the two int16
sources directly and emitting the MIXED bus-rate f32 signal moves
~0.6 GB. Uses the frame-ALIGNED banded formulation
(ops.resample.aligned_tables — requires n % M == 0): output frame c is
A[c] @ H1 plus two narrow edge corrections from neighbor frames, which
arrive as two extra single-frame BlockSpec inputs (index maps may
address any frame, so no carry or overlap machinery is needed; the
out-of-range neighbors at the row's first/last frame are masked to the
zero-padding the offline semantics prescribe).

Precision: int16 splits EXACTLY into two bf16 terms (hi = bf16(x),
lo = x - hi with |lo| <= 256 — both exact); with host-split filter
tables the matmul is a 3-pass bf16 product (drop lo*lo ~ 2^-17
relative), HIGH-equivalent (~-98 dB vs the f64 oracle; the XLA path's
HIGHEST is -143 dB — both far inside the -80 dB budget).

Fade ramps are computed in-kernel from the absolute output index
(iota + clip), matching ops.mix.fade_ramp sample-for-sample:
``out = ramp * (v + bgm_gain * b)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmtpu.ops import resample as _rs


# ONE implementation of the bf16 3-pass split machinery: fftconv owns
# it (incl. the mantissa-masking rationale vs --xla_allow_excess_
# precision); this module used to carry a verbatim clone that a fix to
# the original would silently miss (review find).
from xmtpu.kernels.fftconv import _dot3  # noqa: F401
from xmtpu.kernels.fftconv import _split as _splitf  # noqa: F401
from xmtpu.kernels.fftconv import _split_host  # noqa: F401


def _rsmix_kernel(*refs, G, F, L, M, lo, hi, r0, r2, fade, out_n, nblk,
                  bgm_gain, side_rows):
    (v_ref, vp_ref, vn_ref, b_ref, bp_ref, bn_ref,
     h1h, h1l, h0h, h0l, h2h, h2l, o_ref) = refs
    blk = pl.program_id(1)
    # out-of-range neighbor masks: frame -1 (blk 0) / frame nc (last
    # blk) are the offline zero-padding; they mask ONLY the fetched
    # neighbor frame — in-block neighbor rows come from X itself.
    # Side blocks are ``side_rows`` frames tall (Mosaic wants the
    # second-minor block dim divisible by 8): the previous frame is the
    # prev block's LAST row, the next frame its block's FIRST row.
    pmask = jnp.where(blk == 0, 0.0, 1.0).astype(jnp.float32)
    nmask = jnp.where(blk == nblk - 1, 0.0, 1.0).astype(jnp.float32)

    def resample_rows(x_ref, p_ref, n_ref):
        """All G rows stacked into ONE (G*F, .) operand per matmul —
        144 per-g dots/step measured ~60 us; 18 stacked dots ~halve it
        (per-dot fixed cost dominates at these sizes)."""
        Xf = x_ref[:].astype(jnp.float32)  # (G, F, M)
        xh, xl = _splitf(Xf.reshape(G * F, M))
        y = _dot3(xh, xl, h1h[:], h1l[:])  # (G*F, L) f32
        if lo < 0:
            rows = []
            for g in range(G):
                p_row = p_ref[g, side_rows - 1 : side_rows].astype(
                    jnp.float32) * pmask
                rows.append(p_row[:, M + lo :])
                rows.append(Xf[g, :-1, M + lo :])
            ph, pl_ = _splitf(jnp.concatenate(rows, axis=0))
            c0 = _dot3(ph, pl_, h0h[:], h0l[:])  # (G*F, r0)
            y = y + jnp.concatenate(
                [c0, jnp.zeros((G * F, L - r0), jnp.float32)], axis=1)
        if hi > 0:
            rows = []
            for g in range(G):
                n_row = n_ref[g, 0:1].astype(jnp.float32) * nmask
                rows.append(Xf[g, 1:, :hi])
                rows.append(n_row[:, :hi])
            nh, nl = _splitf(jnp.concatenate(rows, axis=0))
            c2 = _dot3(nh, nl, h2h[:], h2l[:])  # (G*F, L - r2)
            y = y + jnp.concatenate(
                [jnp.zeros((G * F, r2), jnp.float32), c2], axis=1)
        return y.reshape(G, F, L)

    vs = resample_rows(v_ref, vp_ref, vn_ref)
    bs = resample_rows(b_ref, bp_ref, bn_ref)

    base = jnp.float32(blk * (F * L))  # abs index < 2^24: exact in f32
    ii = (jax.lax.broadcasted_iota(jnp.int32, (F, L), 0) * jnp.int32(L)
          + jax.lax.broadcasted_iota(jnp.int32, (F, L), 1))
    i = base + ii.astype(jnp.float32)
    if fade > 0:
        ramp = jnp.minimum((i + 1.0) / jnp.float32(fade), 1.0)
        ramp = ramp * jnp.clip(
            (jnp.float32(out_n) - i) / jnp.float32(fade), 0.0, 1.0)
    else:
        ramp = jnp.ones((F, L), jnp.float32)
    gb = jnp.float32(bgm_gain)
    o_ref[:] = ramp[None] * (vs + gb * bs)


def _pick_F(nc: int) -> int:
    """Frames per grid step: largest divisor of nc that is a multiple
    of 8 and <= 256; falls back to nc itself (single-block rows, all
    neighbors masked) when nc has no such divisor but is small."""
    best = 0
    for f in range(8, min(nc, 256) + 1, 8):
        if nc % f == 0:
            best = f
    if best == 0 and nc <= 1024:
        best = nc
    return best


@functools.partial(
    jax.jit,
    static_argnames=("L", "M", "F", "G", "fade", "bgm_gain", "tpp",
                     "beta", "interpret"),
)
def _rsmix_call(v3, b3, L, M, F, G, fade, bgm_gain, tpp, beta, interpret):
    B, nc, _ = v3.shape
    plan = _rs.make_plan(L, M, tpp, beta)
    t = _rs.aligned_tables(plan)
    h1h, h1l = _split_host(t.H1)
    # zero-size weight slabs upset Mosaic; pad dead tables to 8x128
    h0 = t.H0 if t.lo < 0 else np.zeros((8, 128))
    h2 = t.H2 if t.hi > 0 else np.zeros((8, 128))
    h0h, h0l = _split_host(h0)
    h2h, h2l = _split_host(h2)
    nblk = nc // F
    if nblk > 1:
        # 8-frame side blocks (F % 8 == 0 so nc % 8 == 0): block index
        # units of 8 frames; prev = last row of the block ending at
        # b*F, next = first row of the block starting at (b+1)*F
        side_rows = 8
        F8 = F // 8
        prevf = lambda r, b: (r, jnp.maximum(b * F8 - 1, 0), 0)  # noqa: E731
        nextf = lambda r, b: (r, jnp.minimum((b + 1) * F8, nc // 8 - 1), 0)  # noqa: E731
    else:
        # single block: neighbors are fully masked; alias the main spec
        side_rows = F
        prevf = nextf = lambda r, b: (r, b, 0)  # noqa: E731
    kern = functools.partial(
        _rsmix_kernel, G=G, F=F, L=L, M=M, lo=t.lo, hi=t.hi, r0=t.r0,
        r2=t.r2, fade=fade, out_n=nc * L, nblk=nblk, bgm_gain=bgm_gain,
        side_rows=side_rows)
    frame = lambda r, b: (r, b, 0)  # noqa: E731
    io = [
        pl.BlockSpec((G, F, M), frame, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, side_rows, M), prevf, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, side_rows, M), nextf, memory_space=pltpu.VMEM),
    ]
    with jax.enable_x64(False):  # Mosaic rejects i64 index types
        out = pl.pallas_call(
            kern,
            grid=(B // G, nblk),
            in_specs=io + io + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((G, F, L), frame,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nc, L), jnp.float32),
            # stacked (G*F, .) f32 intermediates exceed the default
            # 16 MB scoped-vmem cap; the chip accepts more (see
            # kernels/fftconv.py)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),
            interpret=interpret,
        )(v3, v3, v3, b3, b3, b3, *(jnp.asarray(a) for a in
                                    (h1h, h1l, h0h, h0l, h2h, h2l)))
    return out.reshape(B, nc * L)


def resample_mix_supported(n: int, B: int, sr_in: int, sr_out: int,
                           taps_per_phase: int = 24) -> bool:
    import math

    g = math.gcd(int(sr_in), int(sr_out))
    L, M = sr_out // g, sr_in // g
    if L == M or n % M or n < 2 * M:
        return False
    if (n // M) * L > 1 << 24:
        # the in-kernel fade ramp computes its absolute sample index in
        # f32, which quantizes past 2^24 output samples (~17.5 min at
        # 16 kHz) and diverges from the f64 ops.mix.fade_ramp this
        # kernel must match sample-for-sample (round-2 advisor find)
        return False
    plan = _rs.make_plan(L, M, taps_per_phase, 9.0)
    # no batch-divisor condition: resample_mix_pallas's group pick
    # falls back to G=1 for any B (a `B % g == 0 for g in (...,1)`
    # check here was a tautology — review find)
    return plan.width <= 2 * M and _pick_F(n // M) > 0


def resample_mix_pallas(voice_i16, bgm_i16, sr_in: int, sr_out: int,
                        bgm_gain: float = 0.4, fade: int = 0,
                        taps_per_phase: int = 24, beta: float = 9.0,
                        interpret: bool = False):
    """Fused resample+gain/fade+mix of two (B, n) int16 tracks ->
    (B, out_n) f32 mixed signal at sr_out. Semantics ==

        ramp * (resample(v) + bgm_gain * resample(b))

    with ramp = ops.mix.fade_ramp(out_n, fade, fade, out_n). Requires
    n % M == 0 (use resample_mix_supported to gate)."""
    import math

    g = math.gcd(int(sr_in), int(sr_out))
    L, M = sr_out // g, sr_in // g
    B, n = voice_i16.shape
    if not resample_mix_supported(n, B, sr_in, sr_out,
                                  taps_per_phase=taps_per_phase):
        # the unsupported-geometry path used to fall through into an
        # opaque ZeroDivisionError from _pick_F()==0 (review find)
        from xmtpu.utils.errors import ConfigError

        raise ConfigError(
            f"resample_mix_pallas does not support n={n}, B={B}, "
            f"{sr_in}->{sr_out} Hz (gate with resample_mix_supported)")
    nc = n // M
    F = _pick_F(nc)
    G = next(g_ for g_ in (8, 4, 2, 1) if B % g_ == 0)
    v3 = voice_i16.reshape(B, nc, M)
    b3 = bgm_i16.reshape(B, nc, M)
    return _rsmix_call(v3, b3, L, M, F, G, int(fade), float(bgm_gain),
                       taps_per_phase, beta, interpret)
