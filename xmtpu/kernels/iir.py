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
    jax.jit, static_argnames=("time_chunk", "interpret", "return_state",
                              "lanes")
)
def _sosfilt_pallas_2d(sos, x2d, zi, time_chunk=2048, interpret=False,
                       return_state=True, lanes=LANES):
    """x2d: (R, n) f32, rows independent. zi: (S, 2, R). -> (y2d, zf).

    ``lanes``: row-tile width. 128 = one f32 vreg (the measured round-2
    default). Wider tiles interleave independent rows' recurrence
    chains in each VPU op — the same latency-hiding that won 256 for
    the envelope kernel (kernels/envelope.py) — at zero extra
    arithmetic; opt-in pending an IIR chip measurement."""
    S = sos.shape[0]
    R, n = x2d.shape
    Rp = _cdiv(R, lanes) * lanes
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
        y, zf = _call(kern, sos, zip_, xt, S, Rp, npad, tc, ntc, interpret,
                      lanes)
    y = y[:n, :R].T
    if not return_state:
        return y, None
    return y, zf[:, :, :R]


def _call(kern, sos, zip_, xt, S, Rp, npad, tc, ntc, interpret, lanes):
    return pl.pallas_call(
        kern,
        grid=(Rp // lanes, ntc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sos (S, 6), whole
            pl.BlockSpec((S, 2, lanes), lambda b, t: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, lanes), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tc, lanes), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2, lanes), lambda b, t: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, Rp), jnp.float32),
            jax.ShapeDtypeStruct((S, 2, Rp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, 2, lanes), jnp.float32)],
        interpret=interpret,
    )(sos.astype(jnp.float32), zip_, xt)


# ---------------------------------------------------------------------------
# Time segmentation: in-chip sequence parallelism for small batches.
#
# With R rows < 128 lanes the sequential kernel wastes the VPU; splitting
# each row's time axis into S segments fills the lanes (R*S rows of
# n/S), then an EXACT affine correction fixes the zero-initialized
# segment states — the single-chip twin of parallel/sp.py's cross-chip
# state chain (SURVEY.md §5 long-context): the whole 2*ns-state cascade
# is LTI, so the true output is
#
#     y[t] = y0[t] + C A^t z_in       (z_in = state entering the segment)
#
# with A/C the cascade's state-space matrices (probed numerically from
# the kernel's own recurrence), A^t evaluated per sample via the
# eigendecomposition A = V diag(lam) V^-1 — so the correction is ONE
# tiny (R*S, 2ns) x (2ns, seglen) matmul on the MXU, and the incoming
# states chain through A^seglen in a trivial lax.scan over S. Exact in
# exact arithmetic; measured ~4x on the config-3 EQ (R=32).
# ---------------------------------------------------------------------------

_SEG_CACHE: dict = {}


def _cascade_step_np(state, x, sos):
    """One f64 numpy step of the kernel's exact cascade recurrence.
    ``state``: (ns, 2). -> (y, new_state)."""
    v = x
    new = np.empty_like(state)
    for s in range(sos.shape[0]):
        b0, b1, b2, a1, a2 = sos[s, 0], sos[s, 1], sos[s, 2], sos[s, 4], sos[s, 5]
        z1, z2 = state[s, 0], state[s, 1]
        y = b0 * v + z1
        new[s, 0] = b1 * v - a1 * y + z2
        new[s, 1] = b2 * v - a2 * y
        v = y
    return v, new


def _seg_consts(sos_np: np.ndarray, seglen: int):
    """Host-side segmentation constants for one (sos, seglen), or None
    when the cascade isn't safely diagonalizable (caller falls back)."""
    key = (sos_np.tobytes(), seglen)
    if key in _SEG_CACHE:
        return _SEG_CACHE[key]
    sos64 = np.asarray(sos_np, np.float64)
    ns = sos64.shape[0]
    D = 2 * ns
    A = np.zeros((D, D))
    C = np.zeros(D)
    for j in range(D):  # probe the recurrence with unit states, x=0
        e = np.zeros(D)
        e[j] = 1.0
        y, nstate = _cascade_step_np(e.reshape(ns, 2).copy(), 0.0, sos64)
        A[:, j] = nstate.reshape(D)
        C[j] = y
    lam, V = np.linalg.eig(A)
    if np.max(np.abs(lam)) >= 1.0 - 1e-12 or np.linalg.cond(V) > 1e8:
        _SEG_CACHE[key] = None  # unstable / defective: no segmentation
        return None
    T = (C @ V)[:, None] * np.linalg.inv(V)  # corr = sum_j lam_j^t (T z)_j
    # truncate the per-sample table where every |lam|^t < 1e-40: the
    # correction is below any f32 signal's resolution there, so the
    # corrected span shrinks from seglen to the filter's actual memory
    # (~2k-20k samples for audio EQs) — essential at the 1M-sample
    # shards of parallel/sp.py, a free matmul-shrink for in-chip
    # segmentation
    lam_max = float(np.max(np.abs(lam)))
    t_cut = seglen if lam_max <= 0.0 else min(
        seglen, int(np.ceil(np.log(1e-40) / np.log(lam_max))))
    t = np.arange(max(1, t_cut))
    L = lam[:, None] ** t[None, :]  # (D, t_cut), |lam|<1 so underflow->0
    consts = {
        "A_seg": np.linalg.matrix_power(A, seglen),  # f64 (D, D)
        "Tr": np.ascontiguousarray(T.real),
        "Ti": np.ascontiguousarray(T.imag),
        "Lr": np.ascontiguousarray(L.real, np.float32),
        "Li": np.ascontiguousarray(L.imag, np.float32),
    }
    _SEG_CACHE[key] = consts
    if len(_SEG_CACHE) > 32:  # L tables are ~MBs per distinct seglen
        _SEG_CACHE.pop(next(iter(_SEG_CACHE)))
    return consts


def pick_segments(R: int, n: int, min_seglen: int = 4096,
                  lanes: int = LANES, aligned: bool = False) -> int:
    """Segment count that (a) keeps R*S <= lanes, (b) divides n exactly
    (exact state math needs equal segments), and (c) leaves segments
    long enough to amortize the correction.

    LANE-ALIGNMENT: MEASURED-AND-REJECTED as the auto policy (round 5,
    don't retry without a new chain-level reading). When the
    power-of-2 choice leaves ``n/S % 128 != 0``, every segment row of
    the (R*S, seglen) split starts mid-(8,128)-tile and the relayout
    runs ~5x its byte roofline (config-3 XProf: the (16, 480000) ->
    (256, 30000) split alone cost 0.36 ms of a 3.05 ms step), and a
    non-power-of-2 aligned divisor DOES win standalone: S=15 (seglen
    32000 = 250*128, 240/256 lanes) measured 1.463 ms vs 1.89 at S=16
    on the standalone envelope (S=10, 62%% lanes: 1.91 — occupancy
    gives it back). But IN-CHAIN it LOST: config 3 measured
    36.5-38.6k a-s/s over three runs with aligned=auto vs 41.7-42.6k
    over six same-day controls — the chain overlaps the misaligned
    reshape behind the conv/MXU stages, while the aligned pick's 6.7%%
    LONGER segments land directly on the latency-bound envelope
    chain's critical path (the rsmix lesson again: judge fusions and
    layout fixes by bench.py, never by standalone stage timings).
    ``aligned=True`` keeps the probe reachable
    (tools/probe_seg_alignment.py)."""
    s = 1
    while (R * s * 2 <= lanes and n % (s * 2) == 0
           and n // (s * 2) >= min_seglen):
        s *= 2
    if aligned and s > 1 and (n // s) % 128:
        for cand in range(lanes // R, 1, -1):
            if (n % cand == 0 and n // cand >= min_seglen
                    and (n // cand) % 128 == 0):
                if 4 * cand >= 3 * s:  # occupancy within 25% of pow2
                    return cand
                break
    return s


def _sosfilt_seg(sos, x2d, zi3, S_seg: int, consts, time_chunk, interpret,
                 lanes=LANES):
    """Segmented exact sosfilt: x2d (R, n) -> (y2d, zf3 (ns, 2, R))."""
    _HI = jax.lax.Precision.HIGHEST
    ns = sos.shape[0]
    D = 2 * ns
    R, n = x2d.shape
    seglen = n // S_seg
    xs = x2d.reshape(R * S_seg, seglen)  # row index = r*S + k
    zi0 = jnp.zeros((ns, 2, R * S_seg), jnp.float32)
    y0, zf0 = _sosfilt_pallas_2d(sos, xs, zi0, time_chunk=time_chunk,
                                 interpret=interpret, lanes=lanes)
    # per-segment zero-init final states -> (S_seg, R, D) in probe order
    v = jnp.transpose(zf0.reshape(ns, 2, R, S_seg), (3, 2, 0, 1))
    v = v.reshape(S_seg, R, D).astype(jnp.float64)
    z0 = jnp.transpose(zi3, (2, 0, 1)).reshape(R, D).astype(jnp.float64)
    A = jnp.asarray(consts["A_seg"])  # (D, D) f64

    def chain(zk, vk):  # exact cross-segment state chain
        return zk @ A.T + vk, zk

    z_last, z_ins = jax.lax.scan(chain, z0, v)  # z_ins: (S_seg, R, D)
    zin_rows = jnp.moveaxis(z_ins, 0, 1).reshape(R * S_seg, D)
    wr = (zin_rows @ jnp.asarray(consts["Tr"]).T).astype(jnp.float32)
    wi = (zin_rows @ jnp.asarray(consts["Ti"]).T).astype(jnp.float32)
    corr = (
        jnp.einsum("rd,dt->rt", wr, jnp.asarray(consts["Lr"]), precision=_HI)
        - jnp.einsum("rd,dt->rt", wi, jnp.asarray(consts["Li"]), precision=_HI)
    )
    # L tables are truncated at the filter's memory (see _seg_consts);
    # past that the correction is < 1e-40 absolute — exact zero in f32
    y = y0.at[:, : corr.shape[-1]].add(corr).reshape(R, n)
    zf = jnp.transpose(z_last.reshape(R, ns, 2), (1, 2, 0)).astype(jnp.float32)
    return y, zf


def sosfilt_pallas(sos, x, zi=None, time_chunk=2048, interpret=False,
                   segments=None, lanes=None):
    """Drop-in twin of :func:`xmtpu.ops.biquad.sosfilt_scan` (f32 path).

    ``x``: (..., n); ``zi``: (S, ..., 2) or None. Returns (y, zf) in the
    same layout as the ops twin. Accuracy: ~-86 dB vs the f64 oracle
    (sequential f32; SURVEY.md §7.4②) — use the f64 scan twin when
    oracle-grade output is required.

    ``segments``: time-segmentation factor for small batches (see
    module comment above `_seg_consts`); None = auto (fills the 128
    lanes when the flattened batch is small and n divides evenly; the
    256-clip batch path is unaffected). Exact: the affine state
    corrections reproduce the unsegmented recurrence.

    ``lanes``: row-tile width (None = 128, the default). 256
    interleaves two independent recurrence chains per VPU op — the
    envelope kernel's measured latency-hiding trick. Chip probe
    2026-08-19 (tools/probe_kernel_variants.py): 256 is 5.5% faster
    at the big-batch (256, 160k) shape (5.72 vs 6.05 ms) but 11%
    SLOWER at the segmented (32, 480k) shape (3.41 vs 3.06 ms — the
    5-section cascade already has enough in-flight work per lane
    there), so 128 stays the default and 256 stays opt-in for
    large-batch EQ-only chains.
    """
    try:  # host-side consts need concrete coefficients; a traced sos
        # (rare: sos passed through a jit boundary) falls back to the
        # unsegmented kernel
        sos_host = np.asarray(sos, np.float64)
    except Exception:
        sos_host = None
    sos = jnp.asarray(sos)
    x = jnp.asarray(x)
    S = sos.shape[0]
    if S == 0:
        # empty cascade is the identity, matching the scan twin's
        # zero-band EQ convention — the segment picker used to reduce
        # over an empty eigenvalue array and crash (review find)
        return (x.astype(jnp.float32),
                jnp.zeros((0,) + x.shape[:-1] + (2,), jnp.float32))
    batch = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(batch)) if batch else 1
    x2d = x.reshape(R, n)
    if zi is None:
        zi3 = jnp.zeros((S, 2, R), jnp.float32)
    else:
        # (S, ..., 2) -> (S, 2, R)
        zi3 = jnp.moveaxis(jnp.asarray(zi).reshape(S, R, 2), -1, 1)

    lane_w = LANES if lanes is None else int(lanes)
    if lane_w < LANES or lane_w % LANES:
        raise ValueError(f"lanes={lane_w} must be a multiple of {LANES}")
    S_seg = (pick_segments(R, n, lanes=lane_w)
             if segments is None else int(segments))
    if S_seg > 1 and n % S_seg:
        raise ValueError(
            f"segments={S_seg} does not divide n={n} (exact state "
            "corrections need equal segments)")
    consts = _seg_consts(sos_host, n // S_seg) \
        if (S_seg > 1 and sos_host is not None) else None
    if consts is not None:
        y2d, zf3 = _sosfilt_seg(sos, x2d, zi3, S_seg, consts,
                                time_chunk, interpret, lanes=lane_w)
    else:
        y2d, zf3 = _sosfilt_pallas_2d(
            sos, x2d, zi3, time_chunk=time_chunk, interpret=interpret,
            lanes=lane_w
        )
    y = y2d.reshape(*batch, n).astype(x.dtype)
    zf = jnp.moveaxis(zf3, 1, -1).reshape((S,) + batch + (2,))
    return y, zf
