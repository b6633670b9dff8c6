"""MXU-DFT convolution: overlap-save FIR filtering whose FFTs are
four-step Cooley-Tukey DFTs expressed as MATMULS (``precision=HIGHEST``),
so the transform runs on the systolic array instead of the VPU.

Reference analogue: the reverb convolution of ``src/effects/reverb/``
[upstream, SURVEY.md §2.1]; this module is the TPU-first answer to its
hot loop — route the FLOPs to the MXU (SURVEY.md §3.5 "DECIDE by
benchmark"; measured round 2: ~3x the ``jnp.fft`` overlap-save path at
the headline shapes).

Math
----
Size-B complex DFT with B = N1*N2, input index n = n1*N2 + n2, output
index k = k2*N1 + k1 kept in SCRAMBLED layout [k1, k2]:

    A[k1, n2] = sum_n1 W_N1^(k1 n1) x[n1, n2]        (matmul, N1-DFT)
    Bm[k1,n2] = A[k1, n2] * W_B^(k1 n2)              (twiddle)
    X[k1, k2] = sum_n2 W_N2^(k2 n2) Bm[k1, n2]       (matmul, N2-DFT)

The inverse consumes the scrambled layout symmetrically (inner inverse
N2-DFT, conjugate twiddle, inverse N1-DFT, 1/B scale), so no
bit-reversal or transpose is ever materialized. Spectral filtering
multiplies by the IR spectrum pre-scrambled into the same [k1, k2]
layout.

Two-for-one real filtering: for REAL rows x0, x1 and REAL filter h,
``ifft(fft(x0 + i x1) * H) = (x0*h) + i (x1*h)`` exactly (linearity;
both outputs are real), so pairs of rows ride one complex transform
with no Hermitian unpacking.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST
_PRECISION = _HI  # module default; fir_convolve_os_mxu can override


def _split_factors(block: int) -> tuple[int, int]:
    """Balanced power-of-two factorization N1*N2 = block (N1 <= N2)."""
    if block < 4 or block & (block - 1):
        # a typed error at the shared helper (every DFT-as-matmul
        # entry funnels through here): the bare assert was opaque to
        # callers and stripped under python -O, after which a bad
        # block surfaced as an unrelated reshape error (review find)
        raise ValueError(
            f"block must be a power of two >= 4, got {block}")
    p = block.bit_length() - 1
    return 1 << (p // 2), 1 << (p - p // 2)


@lru_cache(maxsize=16)
def _dft_consts(block: int):
    """Host-precomputed f64->f32 DFT matrices + twiddles for one size.

    Cached as NUMPY (never jnp): the first call may happen inside a jit
    trace, and caching traced constants across traces leaks tracers.
    ``jnp.asarray`` at the use site is free (constant-folded per trace).
    """
    n1, n2 = _split_factors(block)
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)  # [k1, n1]
    w2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)  # [k2, n2]
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / block)  # [k1, n2]
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    return {
        "n1": n1, "n2": n2,
        "w1r": f32(w1.real), "w1i": f32(w1.imag),
        "w2r": f32(w2.real), "w2i": f32(w2.imag),
        "twr": f32(tw.real), "twi": f32(tw.imag),
    }


def _cmatmul(ar, ai, br, bi, sub: str, prec=None, gauss: bool = False):
    """Complex einsum at >= HIGH precision (never the bf16 default —
    SURVEY.md §7.3 matmul-precision rule).

    ``gauss``: use Gauss's 3-multiplication identity
    (re = m1 - m2, im = m3 - m1 - m2 with m3 = (ar+ai)(br+bi)) — 25%
    fewer MXU flops at the cost of one extra subtract and slightly
    worse cancellation (still far inside the -80 dB budget, tested)."""
    p = prec if prec is not None else _PRECISION
    m1 = jnp.einsum(sub, ar, br, precision=p)
    m2 = jnp.einsum(sub, ai, bi, precision=p)
    if gauss:
        m3 = jnp.einsum(sub, ar + ai, br + bi, precision=p)
        return m1 - m2, m3 - m1 - m2
    ri = jnp.einsum(sub, ar, bi, precision=p)
    ir = jnp.einsum(sub, ai, br, precision=p)
    return m1 - m2, ri + ir


def _dft_scrambled(zr, zi, c, prec=None, gauss: bool = False):
    """(R, block) complex -> (R, n1, n2) scrambled spectrum."""
    r = zr.shape[0]
    zr = zr.reshape(r, c["n1"], c["n2"])
    zi = zi.reshape(r, c["n1"], c["n2"])
    # inner N1-DFT over n1: [k1,n1] x [r,n1,n2] -> [r,k1,n2]
    ar, ai = _cmatmul(c["w1r"], c["w1i"], zr, zi, "kn,rnm->rkm", prec, gauss)
    # twiddle [k1, n2]
    br = ar * c["twr"] - ai * c["twi"]
    bi = ar * c["twi"] + ai * c["twr"]
    # outer N2-DFT over n2: [k2,n2] x [r,k1,n2] -> [r,k1,k2]
    return _cmatmul(c["w2r"], c["w2i"], br, bi, "lm,rkm->rkl", prec, gauss)


def _idft_scrambled(xr, xi, c, prec=None, gauss: bool = False):
    """(R, n1, n2) scrambled spectrum -> (R, block) complex (scaled)."""
    # inner inverse N2-DFT over k2 (conjugate matrix = transpose of w2
    # conj; w2 symmetric so conj alone suffices)
    ar, ai = _cmatmul(c["w2r"], -c["w2i"], xr, xi, "ml,rkl->rkm", prec,
                      gauss)
    # conjugate twiddle
    br = ar * c["twr"] + ai * c["twi"]
    bi = -ar * c["twi"] + ai * c["twr"]
    # inverse N1-DFT over k1
    yr, yi = _cmatmul(c["w1r"], -c["w1i"], br, bi, "nk,rkm->rnm", prec,
                      gauss)
    r = yr.shape[0]
    block = c["n1"] * c["n2"]
    s = jnp.float32(1.0 / block)
    return (yr.reshape(r, block) * s, yi.reshape(r, block) * s)


def scramble_spectrum(h_lin: np.ndarray, block: int):
    """Linear length-``block`` complex spectrum -> scrambled [k1, k2]
    layout (k = k2*n1 + k1)."""
    n1, n2 = _split_factors(block)
    hs = h_lin.reshape(n2, n1).T  # [k1, k2]
    return (jnp.asarray(hs.real.astype(np.float32)),
            jnp.asarray(hs.imag.astype(np.float32)))


# ---------------------------------------------------------------------------
# Fused-middle variant: for a FIXED filter, everything between the two
# N1-DFTs — forward twiddle, forward N2-DFT, spectral multiply, inverse
# N2-DFT, conjugate twiddle, 1/B scale — is one linear map per k1:
#
#   M[k1] = diag(ctw[k1,:]) . (W2^H diag(H[k1,:]) W2) . diag(tw[k1,:]) / B
#
# so the whole convolution becomes THREE complex matmuls (N1-DFT,
# batched-over-k1 middle, inverse N1-DFT) with zero elementwise complex
# stages: 25% fewer MXU flops than the four-step path and ~3 fewer HBM
# round trips of the row tensor. W2^H diag(H) W2 is circulant (it IS
# circular convolution along n2), so the host build is an ifft + a
# strided index, not a matrix product. M is (N1, N2, N2) complex f32 —
# 16.8 MB at block 16384 — streamed weight traffic amortized over all
# rows of the batch.
# ---------------------------------------------------------------------------

_FUSED_CACHE: dict = {}

# The fused middle matrix M is baked into the compiled program as a
# constant, so it must stay small: the axon remote-compile endpoint
# rejects oversized request bodies (HTTP 413 observed at ~0.5 GB), and
# a device-side gather materialization was measured SLOWER than the
# four-step path (round 2: 9.6-12.4 ms vs 8.95 ms at the config-3
# shapes). variant="auto" therefore uses fused only below this limit.
_BAKE_LIMIT_BYTES = 48 << 20


def _fused_consts(block: int, ir_np: np.ndarray):
    key = (block, ir_np.tobytes())
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]
    n1, n2 = _split_factors(block)
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    H = np.fft.fft(ir_np, block)
    Hs = H.reshape(n2, n1).T  # [k1, k2] scrambled layout
    g = np.fft.ifft(Hs, axis=1)  # (W2^H diag(Hs[k1]) W2)[m,n] = n2*g[k1,(m-n)%n2]
    g *= n2 / block  # fold the circulant n2 and the iDFT 1/block scales
    idx = (j2[:, None] - j2[None, :]) % n2  # [m, n]
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / block)  # [k1, n2]
    w1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)  # noqa: E731
    Mr = np.empty((n1, n2, n2), np.float32)
    Mi = np.empty((n1, n2, n2), np.float32)
    for k1 in range(n1):  # per-k1 f64 build keeps peak host memory small
        Mk = np.conj(tw[k1])[:, None] * g[k1][idx] * tw[k1][None, :]
        Mr[k1] = Mk.real
        Mi[k1] = Mk.imag
    consts = {"n1": n1, "n2": n2, "Mr": Mr, "Mi": Mi,
              "w1r": f32(w1.real), "w1i": f32(w1.imag)}
    _FUSED_CACHE[key] = consts
    if len(_FUSED_CACHE) > 4:  # entries are up to ~48 MB each
        _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
    return consts


def _convolve_fused(zr, zi, c, prec, gauss):
    """(R, block) complex rows -> (R, block) filtered rows (scaled)."""
    r = zr.shape[0]
    n1, n2 = c["n1"], c["n2"]
    zr = zr.reshape(r, n1, n2)
    zi = zi.reshape(r, n1, n2)
    ar, ai = _cmatmul(c["w1r"], c["w1i"], zr, zi, "kn,rnm->rkm", prec,
                      gauss)  # forward N1-DFT
    dr, di = _cmatmul(ar, ai, c["Mr"], c["Mi"], "rkn,kmn->rkm", prec,
                      gauss)  # fused twiddle+N2-DFT+filter+iN2-DFT+ctwiddle
    yr, yi = _cmatmul(c["w1r"], -c["w1i"], dr, di, "nk,rkm->rnm", prec,
                      gauss)  # inverse N1-DFT (1/B folded into the circulant)
    return yr.reshape(r, -1), yi.reshape(r, -1)


def fir_convolve_os_mxu(x: jnp.ndarray, ir, block: int = 16384,
                        precision=None, variant: str = "auto",
                        gauss: bool = False):
    """Same-length causal convolution: overlap-save with MXU DFTs.

    ``x``: (..., n) f32; ``ir``: 1-D numpy/jnp array (host-known values
    — its spectrum is precomputed in f64 on the host). Requires
    ``block`` a power of two > 2*(len(ir)-1); batch*nblk rows pair up
    two-for-one onto complex transforms. ``precision``: matmul
    precision for the DFT stages (None = module default HIGHEST;
    HIGH = 3-pass f32 emulation, ~2x the matmul rate). ``variant``:
    "fused" (3 matmul stages, filter baked into the middle — see module
    comment above `_fused_consts`), "four_step" (explicit forward/
    inverse DFT pair), or "auto" (fused when M is small enough to bake,
    measured 12% faster at the headline block 16384; four_step above
    the bake limit, where it measured faster anyway). ``gauss``: 3-mult
    complex products — measured slightly SLOWER on chip at these
    (memory-bound) shapes, so off by default; kept for flop-bound uses.
    """
    ir_np = np.asarray(ir, np.float64)
    m = ir_np.shape[-1]
    n = x.shape[-1]
    if block <= 2 * (m - 1):
        raise ValueError(f"block {block} too small for {m}-tap IR")
    if variant == "auto":
        n1, n2 = _split_factors(block)
        variant = "fused" if n1 * n2 * n2 * 8 <= _BAKE_LIMIT_BYTES \
            else "four_step"
    if variant not in ("fused", "four_step"):
        raise ValueError(f"unknown variant {variant!r}; "
                         "use 'fused', 'four_step' or 'auto'")
    if variant == "fused":
        n1, n2 = _split_factors(block)
        baked = n1 * n2 * n2 * 8
        if baked > _BAKE_LIMIT_BYTES:
            # the auto pick enforced the limit but an EXPLICIT 'fused'
            # bypassed it, baking GB-scale constants that the remote
            # compile endpoint rejects (~0.5 GB HTTP 413) with no
            # message naming the cause (review find)
            raise ValueError(
                f"variant='fused' at block {block} bakes "
                f"{baked >> 20} MB of circulant constants "
                f"(limit {_BAKE_LIMIT_BYTES >> 20} MB); use "
                f"variant='four_step' or a smaller block")
        c = _fused_consts(block, ir_np)
    else:
        c = _dft_consts(block)
        hr, hi = scramble_spectrum(np.fft.fft(ir_np, block), block)

    hop = block - (m - 1)
    nblk = -(-n // hop)
    batch = x.shape[:-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(m - 1, nblk * hop - n)]
    xp = jnp.pad(x.astype(jnp.float32), pad)
    frames = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, b * hop, block, axis=-1)
         for b in range(nblk)],
        axis=-2,
    )  # (..., nblk, block)
    rows = frames.reshape(-1, block)
    r = rows.shape[0]
    if r % 2:
        rows = jnp.concatenate([rows, jnp.zeros((1, block), rows.dtype)])
    zr, zi = rows[0::2], rows[1::2]

    if variant == "fused":
        yr, yi = _convolve_fused(zr, zi, c, precision, gauss)
    else:
        xr_s, xi_s = _dft_scrambled(zr, zi, c, precision, gauss)
        yr_s = xr_s * hr - xi_s * hi
        yi_s = xr_s * hi + xi_s * hr
        yr, yi = _idft_scrambled(yr_s, yi_s, c, precision, gauss)

    y = jnp.stack([yr, yi], axis=1).reshape(-1, block)[:r]
    y = y.reshape(*batch, nblk, block)[..., m - 1:]  # valid region
    y = y.reshape(*batch, nblk * hop)[..., :n]
    return y.astype(x.dtype)
