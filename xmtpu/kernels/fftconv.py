"""Pallas kernel: overlap-save FIR convolution with VMEM-resident
four-step MXU DFTs — the whole forward-DFT / spectral-multiply /
inverse-DFT pipeline of one block runs between ONE input DMA and ONE
output store.

Reference analogue: the reverb convolution hot loop of
``src/effects/reverb/`` [upstream, SURVEY.md §2.1].

Why a kernel when ``ops.fftmm`` already routes the DFTs to the MXU:
the XLA einsum pipeline materializes every stage to HBM — measured
round 2 it is exactly HBM-bound (~2.2 GB of intermediates / 207 GB/s
= the observed 10.6 ms at the config-3 shape) while its flops need
only ~2 ms. Keeping one block's six stages in VMEM cuts traffic to
input + output only (~13x).

Precision: Mosaic rejects XLA ``precision=`` on dots (a plain f32
``jnp.dot`` lowers to ONE bf16 pass: measured -52.6 dB). Every matmul
here is therefore a hand-rolled 3-pass bf16 split (hi/lo operand
decomposition, f32 accumulate) — measured -107 dB on a (256,256)x
(256,512) dot on chip, better than XLA HIGH's -97.7 dB.

Math (see ops/fftmm.py for the four-step factorization): with
symmetric DFT matrices W1, W2 and conj(W) @ v == conj(W @ conj(v)),
the inverse reuses the forward's two matmul stages:

    a  = W1 @ z            (contract n1;  [n1,n1] @ [n1,n2])
    b  = tw * a            (elementwise twiddle)
    X  = b @ W2            (contract n2;  [n1,n2] @ [n2,n2])
    S  = (H/B) * X         (spectral multiply, 1/B folded into H)
    y  = conj( W1 @ (tw * (conj(S) @ W2)) )

Each complex matmul uses Gauss's 3-multiplication identity (the sum
matrices Ws = Wr + Wi are host-precomputed) — 25% fewer MXU flops;
with everything on-chip the extra elementwise work is free.

Layout: rows pair two-for-one onto complex transforms (conv of a
complex signal with a real IR is the convs of its real/imag parts).
``hop`` is rounded down to a multiple of 8*n2 so every DMA offset and
block is tile-aligned; frames are (n1, n2) sub-blocks of the padded
signal viewed as (R, rows, n2) — zero host-side framing copies.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmtpu.ops.fftmm import _split_factors


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _split_host(a: np.ndarray):
    """f64/f32 -> (hi, lo) bf16 numpy pair (3-pass operand split)."""
    import ml_dtypes

    a32 = np.asarray(a, np.float32)
    hi = a32.astype(ml_dtypes.bfloat16)
    lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@lru_cache(maxsize=8)
def _consts_np(block: int, ir_bytes: bytes):
    """Host-side DFT/filter constants for one (block, IR). NUMPY only
    (the lru_cache must never hold tracers — fftmm._dft_consts rule)."""
    ir = np.frombuffer(ir_bytes, np.float64)
    n1, n2 = _split_factors(block)
    j1, j2 = np.arange(n1), np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)
    w2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / block)
    H = np.fft.fft(ir, block) / block  # 1/B folded here
    Hs = H.reshape(n2, n1).T  # scrambled [k1, k2] layout
    out = {}
    for name, mat in (("w1r", w1.real), ("w1i", w1.imag),
                      ("w1s", w1.real + w1.imag),
                      ("w2r", w2.real), ("w2i", w2.imag),
                      ("w2s", w2.real + w2.imag)):
        out[name + "h"], out[name + "l"] = _split_host(mat)
    out["twr"] = np.ascontiguousarray(tw.real, np.float32)
    out["twi"] = np.ascontiguousarray(tw.imag, np.float32)
    out["hr"] = np.ascontiguousarray(Hs.real, np.float32)
    out["hi"] = np.ascontiguousarray(Hs.imag, np.float32)
    return out


_W_NAMES = ("w1rh", "w1rl", "w1ih", "w1il", "w1sh", "w1sl",
            "w2rh", "w2rl", "w2ih", "w2il", "w2sh", "w2sl",
            "twr", "twi", "hr", "hi")


def _split(v):
    """f32 -> (hi, lo) bf16 pair via MANTISSA MASKING, not astype:
    under --xla_allow_excess_precision (set on the axon TPU backend)
    XLA folds ``v - f32(bf16(v))`` to zero, silently erasing the lo
    term and collapsing the 3-pass product to one bf16 pass (-52 dB;
    caught when the interpret-mode kernel diverged on TPU only,
    round 2). The integer truncation split cannot be elided; hi is
    exactly a bf16 value (truncated rather than rounded — |lo| <=
    2^-8 |v|, still well inside the 3-pass error budget)."""
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    return hi.astype(jnp.bfloat16), (v - hi).astype(jnp.bfloat16)


def _dot3(ah, al, bh, bl):
    """3-pass bf16 a @ b with f32 accumulate (the a_lo*b_lo term is
    below the f32 mantissa — HIGH-equivalent, measured -107 dB)."""
    f = jnp.float32
    return (jnp.dot(ah, bh, preferred_element_type=f)
            + jnp.dot(ah, bl, preferred_element_type=f)
            + jnp.dot(al, bh, preferred_element_type=f))


def _cmm(w, pre, vr, vi, right: bool, gauss: bool = True):
    """Complex matmul: W @ v (right=False) or v @ W (right=True); W's
    r/i/s parts host-split into bf16 hi/lo pairs.

    ``gauss=True``: Gauss 3-mult identity (25% fewer MXU flops, but an
    extra activation SPLIT + two recombination passes — more VPU/VMEM
    traffic). ``gauss=False``: classic 4-mult (33% more MXU flops, one
    less split, one-op recombines) — the better trade if the kernel is
    elementwise-pass-bound rather than MXU-bound."""
    vrh, vrl = _split(vr)
    vih, vil = _split(vi)
    if not gauss:
        if right:
            re = (_dot3(vrh, vrl, w[pre + "rh"], w[pre + "rl"])
                  - _dot3(vih, vil, w[pre + "ih"], w[pre + "il"]))
            im = (_dot3(vrh, vrl, w[pre + "ih"], w[pre + "il"])
                  + _dot3(vih, vil, w[pre + "rh"], w[pre + "rl"]))
        else:
            re = (_dot3(w[pre + "rh"], w[pre + "rl"], vrh, vrl)
                  - _dot3(w[pre + "ih"], w[pre + "il"], vih, vil))
            im = (_dot3(w[pre + "ih"], w[pre + "il"], vrh, vrl)
                  + _dot3(w[pre + "rh"], w[pre + "rl"], vih, vil))
        return re, im
    vs = vr + vi
    vsh, vsl = _split(vs)
    if right:
        m1 = _dot3(vrh, vrl, w[pre + "rh"], w[pre + "rl"])
        m2 = _dot3(vih, vil, w[pre + "ih"], w[pre + "il"])
        m3 = _dot3(vsh, vsl, w[pre + "sh"], w[pre + "sl"])
    else:
        m1 = _dot3(w[pre + "rh"], w[pre + "rl"], vrh, vrl)
        m2 = _dot3(w[pre + "ih"], w[pre + "il"], vih, vil)
        m3 = _dot3(w[pre + "sh"], w[pre + "sl"], vsh, vsl)
    return m1 - m2, m3 - m1 - m2


_NW = 16  # len(_W_NAMES)


def _fftconv_kernel(x_ref, *refs, pp_rows, gp, wide=False,
                    gauss=True, has_pre=False, tail=None):
    """One (pair-group, frame) step over ``gp`` row pairs.

    Perf structure (each measured round 2 at the config-3 shape):
    - weights live in HBM and are DMA'd into a PERSISTENT VMEM scratch
      once at the first grid step — as plain VMEM inputs Mosaic
      re-fetched all ~2-6 MB of them EVERY step (~11-27 us/step, the
      single biggest cost in the first version of this kernel);
    - the input BlockSpec delivers the frame's DISJOINT hop rows
      (auto double-buffered); the block-hop overlap rows are carried
      across the sequential frame steps in the ``zbuf`` scratch
      (frame b's window is [carry | hop rows]; the b=0 carry is the
      overlap-save left zero-pad);
    - ``gp`` pairs per step amortize the ~15 us fixed grid-step cost.
    - ``wide`` (round 3): the N1-DFT stages contract each pair's OWN
      n1 axis, so the baseline runs 2*gp small (n1,n1)@(n1,n2) Gauss
      dots per step — each pays the MXU weight-load/drain overhead on
      only n2 streamed columns. Concatenating the pairs along the LANE
      axis turns them into ONE (n1,n1)@(n1,gp*n2) dot per stage (the
      same weight loads amortized over gp times the columns); the
      strip gather/scatter around it is cheap VPU traffic.
    """
    if has_pre:
        pr_ref, pc_ref = refs[0], refs[1]
        refs = refs[2:]
    w_hbm = refs[:_NW]
    o_ref = refs[_NW]
    wv = refs[_NW + 1 : 2 * _NW + 1]
    zbuf = refs[2 * _NW + 1]
    sem = refs[2 * _NW + 2]
    p = pl.program_id(0)
    b = pl.program_id(1)
    n1 = zbuf.shape[1]

    @pl.when((p == 0) & (b == 0))
    def _():
        for i in range(_NW):
            cp = pltpu.make_async_copy(w_hbm[i], wv[i], sem)
            cp.start()
            cp.wait()

    w = {name: wv[i][:] for i, name in enumerate(_W_NAMES)}

    @pl.when(b == 0)
    def _():
        zbuf[:, :pp_rows] = jnp.zeros_like(zbuf[:, :pp_rows])

    @pl.when(b != 0)
    def _():
        # next carry = last pp rows of the previous window (disjoint
        # from the destination rows: n1 >= 2*pp_rows by construction)
        zbuf[:, :pp_rows] = zbuf[:, n1 - pp_rows :]

    if has_pre:
        # input-side gain fusion: per-row prescale x per-sample window
        # (fade ramp) applied ON THE TILE as it enters the overlap-save
        # window — the carry rows then hold already-scaled samples, so
        # the result is exactly conv(pre_row * pre_col * x) with no
        # full-array elementwise pass in front of the kernel
        zbuf[:, pp_rows:] = (x_ref[:] * pr_ref[:].reshape(2 * gp, 1, 1)
                             * pc_ref[:][None])
    else:
        zbuf[:, pp_rows:] = x_ref[:]
    if tail is not None:
        # PAD-FREE input (see _fftconv_2d): the last grid block is a
        # PARTIAL edge block — Mosaic clips its DMA to the array
        # extent, delivering only ``tail[1]`` valid rows (no 8-row
        # alignment guarantee: the headline shape leaves 98 of 1250,
        # tests pin a 44-row case) and leaving the rest of the buffer
        # stale, so the overlap-save zero-pad is written here instead
        # of by a full-array jnp.pad in front of the kernel (measured
        # 0.51 ms at the headline shape). The zero-fill covers
        # whatever is stale regardless of alignment.
        nblk_last, valid_rows = tail

        @pl.when(b == nblk_last)
        def _():
            zbuf[:, pp_rows + valid_rows :] = jnp.zeros_like(
                zbuf[:, pp_rows + valid_rows :])
    n2 = zbuf.shape[2]

    def bmul(a3, c):  # (gp, n1, n2) * broadcast (n1, n2) elementwise
        return a3 * c[None]

    # forward N1-DFT per pair (it contracts the pair's own n1 axis);
    # everything downstream runs on the gp-STACKED (gp*n1, n2) tensor —
    # the N2 stages contract the shared lane axis, so stacking turns
    # 8x ([n1,n2]@[n2,n2]) dots into one big one, and the
    # twiddle/spectral VPU work into one broadcast op per stage
    # (measured round 2: 6.9 -> see BASELINE for the gain).
    if wide and gp > 1:
        # one (n1,n1)@(n1,gp*n2) dot per Gauss pass instead of gp small
        # ones: same weight loads stream gp x the columns
        zr = jnp.concatenate([zbuf[2 * g] for g in range(gp)], axis=1)
        zi = jnp.concatenate([zbuf[2 * g + 1] for g in range(gp)], axis=1)
        arw, aiw = _cmm(w, "w1", zr, zi, right=False, gauss=gauss)
        ar = jnp.concatenate(
            [arw[:, g * n2 : (g + 1) * n2] for g in range(gp)], axis=0
        ).reshape(gp, n1, n2)
        ai = jnp.concatenate(
            [aiw[:, g * n2 : (g + 1) * n2] for g in range(gp)], axis=0
        ).reshape(gp, n1, n2)
    else:
        ar_l, ai_l = [], []
        for g in range(gp):
            r_, i_ = _cmm(w, "w1", zbuf[2 * g], zbuf[2 * g + 1],
                          right=False, gauss=gauss)
            ar_l.append(r_)
            ai_l.append(i_)
        ar = jnp.concatenate(ar_l, axis=0).reshape(gp, n1, n2)
        ai = jnp.concatenate(ai_l, axis=0).reshape(gp, n1, n2)
    br = (bmul(ar, w["twr"]) - bmul(ai, w["twi"])).reshape(gp * n1, n2)
    bi = (bmul(ar, w["twi"]) + bmul(ai, w["twr"])).reshape(gp * n1, n2)
    xr, xi = _cmm(w, "w2", br, bi, right=True, gauss=gauss)          # forward N2-DFT
    xr = xr.reshape(gp, n1, n2)
    xi = xi.reshape(gp, n1, n2)
    sr = (bmul(xr, w["hr"]) - bmul(xi, w["hi"])).reshape(gp * n1, n2)
    si = (bmul(xr, w["hi"]) + bmul(xi, w["hr"])).reshape(gp * n1, n2)
    # inverse via the conjugation identity (module docstring): the same
    # two stage matrices rerun on conj(S); conjugate the result
    ur, ui = _cmm(w, "w2", sr, -si, right=True, gauss=gauss)
    ur = ur.reshape(gp, n1, n2)
    ui = ui.reshape(gp, n1, n2)
    vr = (bmul(ur, w["twr"]) - bmul(ui, w["twi"])).reshape(gp, n1, n2)
    vi = (bmul(ur, w["twi"]) + bmul(ui, w["twr"])).reshape(gp, n1, n2)
    if wide and gp > 1:
        vrw = jnp.concatenate([vr[g] for g in range(gp)], axis=1)
        viw = jnp.concatenate([vi[g] for g in range(gp)], axis=1)
        yr, yi = _cmm(w, "w1", vrw, viw, right=False, gauss=gauss)
        for g in range(gp):
            o_ref[2 * g] = yr[pp_rows:, g * n2 : (g + 1) * n2]
            o_ref[2 * g + 1] = -yi[pp_rows:, g * n2 : (g + 1) * n2]
    else:
        for g in range(gp):
            yr, yi = _cmm(w, "w1", vr[g], vi[g], right=False,
                          gauss=gauss)
            o_ref[2 * g] = yr[pp_rows:, :]
            o_ref[2 * g + 1] = -yi[pp_rows:, :]


@functools.partial(
    jax.jit,
    static_argnames=("block", "hm", "pp_rows", "nblk", "n", "gp",
                     "interpret", "wide", "gauss"),
)
def _fftconv_2d(x2d, weights, block, hm, pp_rows, nblk, n, gp, interpret,
                wide=False, gauss=True, pre_row=None, pre_col=None):
    """x2d: (R, n) f32, R a multiple of 2*gp -> (R, n) f32 same-length
    causal conv.

    ``weights``: tuple of jnp arrays in _W_NAMES order. Static geometry
    (all multiples of the f32 (8, n2) tile): hop = hm*n2 useful samples
    per frame, pp = pp_rows*n2 = block - hop samples of left overlap.
    ``pre_row``/``pre_col``: optional (R,)/(n,) input gains applied
    in-kernel (both or neither): conv(pre_row * pre_col * x).
    """
    n1, n2 = _split_factors(block)
    R = x2d.shape[0]
    hop = hm * n2
    has_pre = pre_row is not None
    tail = None
    if n % n2 == 0 and n < nblk * hop:
        # PAD-FREE path: view the input as (R, n//n2, n2) with NO copy
        # and let the last grid block be a PARTIAL edge block (Mosaic
        # clips the DMA to the array extent); the kernel zero-fills the
        # stale window tail itself (tail=). Saves the full-array
        # jnp.pad copy (0.51 ms at the headline shape). The OUTPUT
        # stays (R, nblk*hm, n2): trim=False consumers are padded-
        # aware, and a partial out block would drop the valid conv
        # tail the docstring promises.
        x3 = x2d.astype(jnp.float32).reshape(R, n // n2, n2)
        tail = (nblk - 1, n // n2 - (nblk - 1) * hm)
    else:
        # disjoint hop tiling (the carry scratch supplies the overlap):
        # right-pad to nblk*hop and view as (R, nblk*hm, n2)
        xp = jnp.pad(x2d.astype(jnp.float32), ((0, 0), (0, nblk * hop - n)))
        x3 = xp.reshape(R, nblk * hm, n2)
    kern = functools.partial(_fftconv_kernel, pp_rows=pp_rows, gp=gp,
                             wide=wide, gauss=gauss, has_pre=has_pre,
                             tail=tail)
    wscratch = [pltpu.VMEM(wa.shape, wa.dtype) for wa in weights]
    pre_args, pre_specs = (), []
    if has_pre:
        prp = pre_row.astype(jnp.float32).reshape(R, 1)
        pcp = jnp.pad(pre_col.astype(jnp.float32),
                      (0, nblk * hop - n)).reshape(nblk * hm, n2)
        pre_args = (prp, pcp)
        pre_specs = [
            pl.BlockSpec((2 * gp, 1), lambda p, b: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hm, n2), lambda p, b: (b, 0),
                         memory_space=pltpu.VMEM),
        ]
    with jax.enable_x64(False):  # Mosaic rejects i64 index types
        out = pl.pallas_call(
            kern,
            grid=(R // (2 * gp), nblk),
            in_specs=[pl.BlockSpec((2 * gp, hm, n2), lambda p, b: (p, b, 0),
                                   memory_space=pltpu.VMEM)]
            + pre_specs
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(_W_NAMES),
            out_specs=pl.BlockSpec((2 * gp, hm, n2), lambda p, b: (p, b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, nblk * hm, n2), jnp.float32),
            scratch_shapes=wscratch
            + [pltpu.VMEM((2 * gp, n1, n2), jnp.float32),
               pltpu.SemaphoreType.DMA(())],
            # the gp-stacked intermediates overflow the default 16 MB
            # scoped-vmem budget; the chip accepts a higher cap
            # (verified up to 100 MB on v5e, round 2)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20),
            interpret=interpret,
        )(x3, *pre_args, *weights)
    return out.reshape(R, nblk * hm * n2)


def _auto_gp(block: int, n1: int, n2: int, R: int) -> int:
    """Pairs per grid step: as many as fit a ~10 MB VMEM budget
    (weights scratch + zbuf + double-buffered in/out blocks)."""
    wbytes = 6 * (n1 * n1 + n2 * n2) * 2 + 4 * n1 * n2 * 4
    gp = 1
    while gp < 8 and 2 * gp <= max(2, R // 2):
        nxt = gp * 2
        need = wbytes + nxt * 2 * n1 * n2 * 4 * 3  # zbuf + 2x in/out bufs
        if need > 10 << 20:
            break
        gp = nxt
    return gp


def fir_convolve_os_pallas(x: jnp.ndarray, ir, block: int = 65536,
                           gp: int | None = None,
                           interpret: bool = False,
                           wide: bool | None = None,
                           gauss: bool = True,
                           pre_row=None, pre_col=None,
                           trim: bool = True) -> jnp.ndarray:
    """Same-length causal convolution of the last axis with host-known
    ``ir``; drop-in twin of ops.fftmm.fir_convolve_os_mxu.

    Requires power-of-two ``block`` with an aligned hop of at least
    block/2 (i.e. block >= ~2*len(ir)). Rows pair two-for-one onto
    complex transforms and process ``gp`` pairs per grid step (None =
    auto from the VMEM budget); the row count is zero-padded up to a
    multiple of 2*gp.

    ``pre_row`` (batch-shaped) / ``pre_col`` ((n,)) — optional input
    gains applied in-kernel on the tile load: the result equals
    ``conv(pre_row[..., None] * pre_col * x)`` with no elementwise HBM
    pass in front of the kernel (the batch chain's fade ramp +
    normalize prescale ride here). Either may be None (treated as 1).

    ``trim=False`` returns the full hop-padded output (..., nblk*hop)
    — samples [n, nblk*hop) are the (valid) convolution tail of the
    zero-padded input, NOT garbage. Trimming materializes a full-array
    slice copy when the consumer is another opaque kernel (measured
    0.59 ms at the headline shape); padded-aware consumers (the
    limiter envelope's ``n_valid``) skip it and fuse the final slice
    into their own elementwise epilogue.
    """
    if block < 2 or block & (block - 1):
        # enforced here at the public boundary: the only other guard
        # was a bare assert in ops.fftmm._split_factors — opaque to
        # the caller and stripped under python -O, after which a
        # non-power-of-two block died much later in hop geometry with
        # a confusing shape error (review find)
        raise ValueError(f"block must be a power of two, got {block}")
    ir_np = np.ascontiguousarray(np.asarray(ir, np.float64))
    m = ir_np.shape[-1]
    n1, n2 = _split_factors(block)
    hop = (block - (m - 1)) // (8 * n2) * (8 * n2)
    if hop <= 0 or 2 * (block - hop) > n1 * n2:
        # second clause: the carry-shift scratch copy needs the overlap
        # to fit in the first half of the window (disjoint rows)
        raise ValueError(
            f"block {block} too small for {m}-tap IR (needs an aligned "
            f"hop >= block/2; got hop={hop})")
    hm, pp_rows = hop // n2, (block - hop) // n2
    n = x.shape[-1]
    nblk = _cdiv(n, hop)
    batch = x.shape[:-1]
    R = int(np.prod(batch)) if batch else 1
    if gp is None:
        gp = _auto_gp(block, n1, n2, R)
    gp = max(1, min(gp, _cdiv(R, 2)))  # don't pad rows past the batch
    x2 = x.reshape(R, n).astype(jnp.float32)
    rpad = _cdiv(R, 2 * gp) * 2 * gp - R
    if rpad:
        x2 = jnp.concatenate([x2, jnp.zeros((rpad, n), jnp.float32)])
    if wide is None:
        wide = gp > 1  # measured round 3: the wide N1 dots win at gp>1
    pr = pc = None
    if pre_row is not None or pre_col is not None:
        pr = (jnp.ones((R,), jnp.float32) if pre_row is None
              else jnp.asarray(pre_row, jnp.float32).reshape(R))
        if rpad:
            pr = jnp.concatenate([pr, jnp.zeros((rpad,), jnp.float32)])
        pc = (jnp.ones((n,), jnp.float32) if pre_col is None
              else jnp.asarray(pre_col, jnp.float32).reshape(n))
    c = _consts_np(block, ir_np.tobytes())
    weights = tuple(jnp.asarray(c[k]) for k in _W_NAMES)
    y = _fftconv_2d(x2, weights, block, hm, pp_rows, nblk, n, gp, interpret,
                    wide=bool(wide), gauss=gauss, pre_row=pr, pre_col=pc)
    if trim:
        return y[:R, :n].reshape(*batch, n).astype(x.dtype)
    return y[:R].reshape(*batch, y.shape[-1]).astype(x.dtype)
