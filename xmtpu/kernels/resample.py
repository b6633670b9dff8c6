"""Pallas kernel: polyphase resampling as a strided MXU convolution.

Reference analogue: the resampler C inner loop (``src/effects/``
[upstream, SURVEY.md §2.1]); the SURVEY §2.3 mapping row "Resampler C
loop -> Pallas strided-convolution kernel".

The ops twin (``ops.resample``) materializes the frame tensor
``F[c, u] = x[c*M + u]`` in HBM (~width/M ≈ 3.5x the input bytes) and
lets XLA matmul it. This kernel builds each F tile ON THE FLY in VMEM:
the wrapper views the padded input as M-sample rows ``(R, rows, M)``;
per grid step the kernel DMAs the ``tj + nslab`` rows its tile needs
(consecutive tiles OVERLAP by nslab rows, which BlockSpec index maps
can't express — hence input in ANY/HBM + manual async copy), forms the
(tj, width) frame tile with static slices, and hits the MXU with
``(tj, width) @ (width, L)`` against the same zero-banked filter table
as the ops twin — identical math, ~3.5x less HBM traffic.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmtpu.ops import resample as _ops


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _resample_kernel(x_hbm, h0_ref, h1_ref, o_ref, slab_ref, sem, *,
                     tj, rows_dma, lanes2, precision):
    r = pl.program_id(0)
    c = pl.program_id(1)
    dma = pltpu.make_async_copy(  # rows_dma is 8-aligned (Mosaic tiling)
        x_hbm.at[r, pl.ds(c * tj, rows_dma), :], slab_ref, sem
    )
    dma.start()
    dma.wait()
    # Banded F @ hbank: the filter band spans u in [0, width) with
    # width <= M + K2 < 2M, i.e. input rows c and c+1 only. So instead
    # of ceil(width/M)+1 FULL-width dots against a mostly-zero bank
    # (3x dense flops), do exactly two: row c against the first M bank
    # rows, and row c+1's first K2 lanes against the K2-row remainder.
    # precision>=HIGH mandatory: TPU default-precision matmul is bf16,
    # which costs ~90 dB here (measured -52 dB vs -142 dB; SURVEY.md
    # §7.4① rule — every DSP dot product must set this).
    acc = jnp.dot(
        slab_ref[0:tj, :], h0_ref[:, :],
        preferred_element_type=jnp.float32, precision=precision,
    )
    if lanes2:  # width > M: the band's tail rows live in input row c+1
        acc = acc + jnp.dot(
            slab_ref[1 : 1 + tj, 0:lanes2], h1_ref[0:lanes2, :],
            preferred_element_type=jnp.float32, precision=precision,
        )
    o_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("L", "M", "taps_per_phase",
                                             "beta", "tj", "interpret",
                                             "precision"))
def _resample_pallas_2d(x2d, L, M, taps_per_phase=24, beta=9.0, tj=128,
                        interpret=False,
                        precision=jax.lax.Precision.HIGHEST):
    """x2d: (R, n) f32 -> (R, out_len) f32. Same pinned semantics as
    ops.resample._apply_plan (shared plan/hbank)."""
    plan = _ops.make_plan(L, M, taps_per_phase, beta)
    R, n = x2d.shape
    out_len = _ops.resample_output_len(n, L, M)
    nj = _cdiv(out_len, L)
    njp = _cdiv(nj, tj) * tj  # output blocks padded to a tile multiple
    width = plan.width
    assert width <= 2 * M, (width, M)  # guaranteed by the M >= 64 gate
    rows_dma = _cdiv(tj + 1, 8) * 8  # sublane-aligned DMA block
    rows_total = njp + (rows_dma - tj)

    m_pad = _cdiv(M, 128) * 128  # lane-aligned row width (Mosaic DMA rule)

    # host-side pre-pad: xs[k] = x[k + base - pad_left], then view as
    # M-sample rows (tile c needs rows [c*tj, c*tj + rows_dma)), each row
    # zero-extended to m_pad lanes; the filter pieces get matching zero
    # rows so the padding contributes nothing to the matmul.
    need = rows_total * M
    pad_l = plan.pad_left
    pad_r = max(0, plan.base + need - (n + pad_l))
    xs = jnp.pad(x2d.astype(jnp.float32), ((0, 0), (pad_l, pad_r)))
    xs = jax.lax.slice_in_dim(xs, plan.base, plan.base + need, axis=-1)
    xs3 = jnp.pad(xs.reshape(R, rows_total, M),
                  ((0, 0), (0, 0), (0, m_pad - M)))

    # banded filter split (see _resample_kernel): rows [0, min(M, width))
    # against input row c, rows [M, width) against row c+1's first lanes
    h0 = np.zeros((m_pad, plan.L), np.float32)
    h0[: min(M, width)] = plan.hbank[: min(M, width)]
    w2 = max(0, width - M)
    lanes2 = _cdiv(w2, 128) * 128 if w2 else 0
    h1 = np.zeros((max(lanes2, 8), plan.L), np.float32)
    if w2:
        h1[:w2] = plan.hbank[M:width]
    kern = functools.partial(_resample_kernel, tj=tj, rows_dma=rows_dma,
                             lanes2=lanes2, precision=precision)
    with jax.enable_x64(False):  # Mosaic rejects i64 index types
        out = pl.pallas_call(
            kern,
            grid=(R, njp // tj),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # xs3 in HBM, manual DMA
                pl.BlockSpec(memory_space=pltpu.VMEM),  # h0 whole
                pl.BlockSpec(memory_space=pltpu.VMEM),  # h1 whole
            ],
            out_specs=pl.BlockSpec((1, tj, plan.L), lambda r, c: (r, c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, njp, plan.L), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rows_dma, m_pad), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(xs3, jnp.asarray(h0), jnp.asarray(h1))
    return out.reshape(R, njp * plan.L)[:, :out_len]


def resample_pallas(x, sr_in: int, sr_out: int, taps_per_phase: int = 24,
                    beta: float = 9.0, tj: int = 128, interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST):
    """Drop-in twin of ops.resample.polyphase_resample (f32)."""
    g = math.gcd(int(sr_in), int(sr_out))
    L, M = sr_out // g, sr_in // g
    x = jnp.asarray(x)
    if L == M:
        # ops-twin convention: ALWAYS f32 out. The three paths used to
        # disagree (kernel cast back to x.dtype, fallback returned
        # ops' f32, L==M passed through), so the result dtype depended
        # on the rate pair (review find)
        return x.astype(jnp.float32)
    plan = _ops.make_plan(L, M, taps_per_phase, beta)
    if M < 64 or plan.width > 2 * M:
        # small M: lane padding M->128 dominates; wide band (large
        # taps_per_phase): the two-slab kernel decomposition doesn't
        # apply — the ops path handles both (forwarding precision)
        return _ops.polyphase_resample(x, sr_in, sr_out, taps_per_phase,
                                       beta, precision=precision)
    batch = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(batch)) if batch else 1
    y = _resample_pallas_2d(x.reshape(R, n), L, M, taps_per_phase, beta,
                            tj=tj, interpret=interpret, precision=precision)
    return y.reshape(*batch, y.shape[-1]).astype(jnp.float32)
