"""Pallas kernel: fused biquad-cascade EQ + limiter envelope follower.

Reference analogue: the voice-effects chain's adjacent EQ and limiter C
loops (``src/effects/`` [upstream, SURVEY.md §2.1]).

Both ``kernels.iir`` and ``kernels.envelope`` are *sequential* kernels
whose cost is dominated by the per-timestep loop, not arithmetic
throughput — running them as two separate passes pays that loop (and
the HBM round trip of the intermediate) twice. This kernel runs the
5-section cascade AND the limiter's detector+envelope recurrences in
ONE pass per timestep:

    y       = cascade(x)                      (2*ns-state biquad chain)
    d       = |y|                             (detector; mono rows, so
                                               the channel link is trivial)
    env     = max(d, k_rel * env)             (peak hold, exp release)
    e2      = (1-c_att) e2 + c_att env        (attack smoothing)

emitting both y and e2; the soft-knee gain curve and the final multiply
stay in XLA where they fuse into neighboring elementwise stages. Used
by the mono batch chain (``batch.py``), where the preceding reverb is
LTI and therefore commutes with the EQ — evaluation order is chosen to
make EQ/limiter adjacent (equal to the pinned EQ->reverb order up to
f32 rounding; tested).

Layout/grid identical to ``kernels.iir``: time on sublanes, batch rows
on lanes (128/tile), state in VMEM scratch across sequential time-chunk
grid steps.
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


def _eq_env_kernel(sos_ref, cf_ref, zi_ref, ei_ref, x_ref, y_ref, e2_ref,
                   zf_ref, ef_ref, st_ref, es_ref, *, n_total, tc, ns):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        st_ref[:] = zi_ref[:]
        es_ref[:] = ei_ref[:]

    coef = [
        (sos_ref[s, 0], sos_ref[s, 1], sos_ref[s, 2], sos_ref[s, 4], sos_ref[s, 5])
        for s in range(ns)
    ]
    k_rel = cf_ref[0, 0]
    c_att = cf_ref[0, 1]
    a_att = 1.0 - c_att

    state = tuple(
        st_ref[s, z : z + 1, :] for s in range(ns) for z in range(2)
    ) + (es_ref[0:1, :], es_ref[1:2, :])

    UNROLL = 8  # one (8, LANES) load/store per loop step (see kernels/iir.py)

    def fused_step(v, st):
        new = []
        for s in range(ns):
            b0, b1, b2, a1, a2 = coef[s]
            z1 = st[2 * s]
            z2 = st[2 * s + 1]
            y = b0 * v + z1
            new.append(b1 * v - a1 * y + z2)
            new.append(b2 * v - a2 * y)
            v = y
        env = jnp.maximum(jnp.abs(v), k_rel * st[2 * ns])
        e2 = a_att * st[2 * ns + 1] + c_att * env
        return v, e2, tuple(new) + (env, e2)

    def body8(i, st):
        tile = x_ref[pl.ds(i * UNROLL, UNROLL), :]
        ys, es = [], []
        for j in range(UNROLL):
            y, e2, st = fused_step(tile[j : j + 1, :], st)
            ys.append(y)
            es.append(e2)
        y_ref[pl.ds(i * UNROLL, UNROLL), :] = jnp.concatenate(ys, axis=0)
        e2_ref[pl.ds(i * UNROLL, UNROLL), :] = jnp.concatenate(es, axis=0)
        return st

    def body1(i, st):
        y, e2, st = fused_step(x_ref[pl.ds(i, 1), :], st)
        y_ref[pl.ds(i, 1), :] = y
        e2_ref[pl.ds(i, 1), :] = e2
        return st

    # int32 throughout — x64 mode is on package-wide and Mosaic rejects i64
    rem = jnp.minimum(
        jnp.int32(tc), jnp.int32(n_total) - t.astype(jnp.int32) * jnp.int32(tc)
    )
    full = rem // jnp.int32(UNROLL)
    state = jax.lax.fori_loop(jnp.int32(0), full, body8, state)
    state = jax.lax.fori_loop(full * jnp.int32(UNROLL), rem, body1, state)

    for s in range(ns):
        st_ref[s, 0:1, :] = state[2 * s]
        st_ref[s, 1:2, :] = state[2 * s + 1]
    es_ref[0:1, :] = state[2 * ns]
    es_ref[1:2, :] = state[2 * ns + 1]
    zf_ref[:] = st_ref[:]
    ef_ref[:] = es_ref[:]


@functools.partial(jax.jit, static_argnames=("time_chunk", "interpret"))
def _eq_env_2d(sos, x2d, coefs, zi, ei, time_chunk=2048, interpret=False):
    """x2d: (R, n) f32 mono rows. zi: (S, 2, R); ei: (2, R).
    -> (y (R, n), e2 (R, n), zf (S, 2, R), ef (2, R))."""
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
    eip = jnp.zeros((2, Rp), jnp.float32)
    eip = jax.lax.dynamic_update_slice(eip, ei.astype(jnp.float32), (0, 0))

    kern = functools.partial(_eq_env_kernel, n_total=n, tc=tc, ns=S)
    with jax.enable_x64(False):  # Mosaic rejects the i64 index types
        y, e2, zf, ef = pl.pallas_call(
            kern,
            grid=(Rp // LANES, ntc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # sos (S, 6)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs (1, 2)
                pl.BlockSpec((S, 2, LANES), lambda b, t: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, LANES), lambda b, t: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tc, LANES), lambda b, t: (t, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tc, LANES), lambda b, t: (t, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tc, LANES), lambda b, t: (t, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 2, LANES), lambda b, t: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, LANES), lambda b, t: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((npad, Rp), jnp.float32),
                jax.ShapeDtypeStruct((npad, Rp), jnp.float32),
                jax.ShapeDtypeStruct((S, 2, Rp), jnp.float32),
                jax.ShapeDtypeStruct((2, Rp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((S, 2, LANES), jnp.float32),
                pltpu.VMEM((2, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(sos.astype(jnp.float32), coefs.astype(jnp.float32), zip_, eip, xt)
    return (y[:n, :R].T, e2[:n, :R].T, zf[:, :, :R], ef[:, :R])


def eq_env_pallas(sos, x, k_rel: float, c_att: float, zi=None, env_init=None,
                  time_chunk=2048, interpret=False):
    """Fused 5-band EQ + limiter envelope over mono rows ``x`` (..., n).

    Semantics == ``kernels.iir.sosfilt_pallas`` followed by
    ``kernels.envelope.envelope_pallas`` on ``|y|`` (channels unlinked:
    each row is its own detector — the mono batch-chain case). Returns
    ``(y, e2, zf, (env_last, e2_last))`` with zf shaped like the
    sosfilt twin's ``(S, ..., 2)``.
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
        zi3 = jnp.moveaxis(jnp.asarray(zi).reshape(S, R, 2), -1, 1)
    if env_init is None:
        ei = jnp.zeros((2, R), jnp.float32)
    else:
        ei = jnp.stack([jnp.asarray(env_init[0]).reshape(R),
                        jnp.asarray(env_init[1]).reshape(R)])
    coefs = jnp.array([[k_rel, c_att]], jnp.float32)
    y2d, e2_2d, zf3, ef = _eq_env_2d(sos, x2d, coefs, zi3, ei,
                                     time_chunk=time_chunk,
                                     interpret=interpret)
    y = y2d.reshape(*batch, n).astype(x.dtype)
    e2 = e2_2d.reshape(*batch, n).astype(x.dtype)
    zf = jnp.moveaxis(zf3, 1, -1).reshape((S,) + batch + (2,))
    return y, e2, zf, (ef[0].reshape(batch), ef[1].reshape(batch))
