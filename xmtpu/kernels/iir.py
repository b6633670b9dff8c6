"""Pallas kernel: batched sequential biquad cascade (IIR).

Reference analogue: the equalizer's per-sample C loop (``src/effects/``
[upstream, SURVEY.md §2.1]).

Why a sequential kernel when ``ops.biquad`` already has a parallel
associative scan: the scan needs float64 state to hit -80 dB (f32 scan
arithmetic floors at -77 dB) and f64 is emulated on TPU; a *sequential*
f32 time loop measures -86 dB (SURVEY.md §7.4②) and gets its
parallelism from the batch instead — ideal for the 256-clip mode
(BASELINE.json:10). Layout: time on sublanes, batch rows on lanes
(128/tile); the per-timestep update is ~9 VPU madds per section on a
(1, 128) row, all five sections fused between one load and one store.

Grid: (batch_tiles, time_chunks), time innermost; filter state lives in
a VMEM scratch that persists across the sequential grid steps of one
batch tile and resets at time-chunk 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _iir_kernel(sos_ref, zi_ref, x_ref, o_ref, zf_ref, st_ref, *, n_total, tc, ns):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        st_ref[:] = zi_ref[:]

    # Hoist coefficients out of the time loop (loop-invariant SMEM reads).
    coef = [
        (sos_ref[s, 0], sos_ref[s, 1], sos_ref[s, 2], sos_ref[s, 4], sos_ref[s, 5])
        for s in range(ns)
    ]

    state = tuple(
        st_ref[s, z : z + 1, :] for s in range(ns) for z in range(2)
    )  # 2*ns arrays of (1, LANES)

    UNROLL = 8  # one (8, LANES) load/store per iteration: full vreg traffic,
    # 8x fewer loop steps; the recurrence itself stays sequential per sample

    def cascade(v, st):
        new = []
        for s in range(ns):
            b0, b1, b2, a1, a2 = coef[s]
            z1 = st[2 * s]
            z2 = st[2 * s + 1]
            y = b0 * v + z1
            new.append(b1 * v - a1 * y + z2)
            new.append(b2 * v - a2 * y)
            v = y
        return v, tuple(new)

    def body8(i, st):
        tile = x_ref[pl.ds(i * UNROLL, UNROLL), :]  # (8, LANES)
        ys = []
        for j in range(UNROLL):
            v, st = cascade(tile[j : j + 1, :], st)
            ys.append(v)
        o_ref[pl.ds(i * UNROLL, UNROLL), :] = jnp.concatenate(ys, axis=0)
        return st

    def body1(i, st):
        v, st = cascade(x_ref[pl.ds(i, 1), :], st)
        o_ref[pl.ds(i, 1), :] = v
        return st

    # Dynamic bound: don't advance state through zero-padded tail samples.
    # (int32 throughout — x64 mode is on package-wide and Mosaic rejects i64.)
    rem = jnp.minimum(
        jnp.int32(tc), jnp.int32(n_total) - t.astype(jnp.int32) * jnp.int32(tc)
    )
    full = rem // jnp.int32(UNROLL)
    state = jax.lax.fori_loop(jnp.int32(0), full, body8, state)
    state = jax.lax.fori_loop(full * jnp.int32(UNROLL), rem, body1, state)

    for s in range(ns):
        st_ref[s, 0:1, :] = state[2 * s]
        st_ref[s, 1:2, :] = state[2 * s + 1]
    zf_ref[:] = st_ref[:]


@functools.partial(
    jax.jit, static_argnames=("time_chunk", "interpret", "return_state")
)
def _sosfilt_pallas_2d(sos, x2d, zi, time_chunk=2048, interpret=False,
                       return_state=True):
    """x2d: (R, n) f32, rows independent. zi: (S, 2, R). -> (y2d, zf)."""
    S = sos.shape[0]
    R, n = x2d.shape
    Rp = _cdiv(R, LANES) * LANES
    tc = time_chunk
    ntc = _cdiv(n, tc)
    npad = ntc * tc

    xt = jnp.zeros((npad, Rp), jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x2d.T.astype(jnp.float32), (0, 0))
    zip_ = jnp.zeros((S, 2, Rp), jnp.float32)
    zip_ = jax.lax.dynamic_update_slice(zip_, zi.astype(jnp.float32), (0, 0, 0))

    kern = functools.partial(_iir_kernel, n_total=n, tc=tc, ns=S)
    # x64 mode is on package-wide (IIR f64 scans); trace the kernel with it
    # off — Mosaic rejects the i64 index types x64 tracing produces.
    with jax.enable_x64(False):
        y, zf = _call(kern, sos, zip_, xt, S, Rp, npad, tc, ntc, interpret)
    y = y[:n, :R].T
    if not return_state:
        return y, None
    return y, zf[:, :, :R]


def _call(kern, sos, zip_, xt, S, Rp, npad, tc, ntc, interpret):
    return pl.pallas_call(
        kern,
        grid=(Rp // LANES, ntc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sos (S, 6), whole
            pl.BlockSpec((S, 2, LANES), lambda b, t: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, LANES), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, LANES), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2, LANES), lambda b, t: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, Rp), jnp.float32),
            jax.ShapeDtypeStruct((S, 2, Rp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, 2, LANES), jnp.float32)],
        interpret=interpret,
    )(sos.astype(jnp.float32), zip_, xt)


def sosfilt_pallas(sos, x, zi=None, time_chunk=2048, interpret=False):
    """Drop-in twin of :func:`xmtpu.ops.biquad.sosfilt_scan` (f32 path).

    ``x``: (..., n); ``zi``: (S, ..., 2) or None. Returns (y, zf) in the
    same layout as the ops twin. Accuracy: ~-86 dB vs the f64 oracle
    (sequential f32; SURVEY.md §7.4②) — use the f64 scan twin when
    oracle-grade output is required.
    """
    sos = jnp.asarray(sos)
    x = jnp.asarray(x)
    S = sos.shape[0]
    batch = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(batch)) if batch else 1
    x2d = x.reshape(R, n)
    if zi is None:
        zi3 = jnp.zeros((S, 2, R), jnp.float32)
    else:
        # (S, ..., 2) -> (S, 2, R)
        zi3 = jnp.moveaxis(jnp.asarray(zi).reshape(S, R, 2), -1, 1)
    y2d, zf3 = _sosfilt_pallas_2d(
        sos, x2d, zi3, time_chunk=time_chunk, interpret=interpret
    )
    y = y2d.reshape(*batch, n).astype(x.dtype)
    zf = jnp.moveaxis(zf3, 1, -1).reshape((S,) + batch + (2,))
    return y, zf
