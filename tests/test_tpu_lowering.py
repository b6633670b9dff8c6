"""Cross-platform TPU lowering of every Pallas kernel variant.

``jax.export(..., platforms=["tpu"])`` builds and serializes the Mosaic
kernel MLIR on any host — no chip needed — so structural lowering
regressions (bad block shapes, i64 leaking into kernel index math, an
op Mosaic's serializer rejects) surface in CI instead of on the first
chip run. This is NOT a full Mosaic compile (layout assignment and
code-gen still happen in the backend at XLA-compile time), but it has
real teeth: the 2026-08-18 outage left the blocked-envelope variant
(`block=`) interpret-tested only, and this gate is the strongest local
check available for it.
"""

from __future__ import annotations

import numpy as np
import pytest

import xmtpu  # noqa: F401  (cache-dir + x64 config)
import jax
import jax.numpy as jnp
from jax import export


def _xlower(fn, *args):
    return export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.fixture(scope="module")
def det(rng):
    return jnp.asarray(
        np.abs(rng.standard_normal((8, 1600))).astype(np.float32))


@pytest.mark.parametrize("block", [None, 8, 16])
def test_envelope_lowering(det, block):
    from xmtpu.kernels import envelope as E

    exp = _xlower(
        lambda d: E.envelope_pallas(d, k_rel=0.999, c_att=0.2, block=block),
        det)
    assert exp.platforms == ("tpu",)


def test_envelope_segmented_blocked_lowering(rng):
    # small batch -> auto segmentation, combined with block lookahead
    from xmtpu.kernels import envelope as E

    d = jnp.asarray(np.abs(rng.standard_normal((2, 4096))).astype(np.float32))
    _xlower(lambda d: E.envelope_pallas(d, k_rel=0.999, c_att=0.2, block=8), d)


@pytest.mark.parametrize("lanes", [None, 256])
def test_iir_lowering(rng, lanes):
    from xmtpu.kernels import iir as I
    from xmtpu.ops import biquad

    sos = biquad.eq_sos(
        [{"freq_hz": 1000.0, "gain_db": 3.0, "q": 1.0}], 48000)
    x = jnp.asarray((0.3 * rng.standard_normal((8, 1600))).astype(np.float32))
    _xlower(lambda x: I.sosfilt_pallas(np.asarray(sos, np.float32), x,
                                       lanes=lanes)[0], x)


def test_fftconv_lowering(rng):
    from xmtpu.kernels import fftconv as F

    x = jnp.asarray((0.3 * rng.standard_normal((4, 8192))).astype(np.float32))
    ir = (0.5 ** np.arange(256)).astype(np.float32)
    _xlower(lambda x: F.fir_convolve_os_pallas(x, ir, block=4096), x)


def test_resample_kernel_lowering(rng):
    from xmtpu.kernels import resample as R

    x = jnp.asarray((0.3 * rng.standard_normal((4, 44100))).astype(np.float32))
    _xlower(lambda x: R.resample_pallas(x, 44100, 16000), x)


def test_rsmix_kernel_lowering(rng):
    from xmtpu.kernels import rsmix as RM

    n = 44100  # n % M == 0 for the 441/160 ratio
    v = jnp.asarray((rng.standard_normal((2, n)) * 9000).astype(np.int16))
    b = jnp.asarray((rng.standard_normal((2, n)) * 9000).astype(np.int16))
    assert RM.resample_mix_supported(n, 2, 44100, 16000)
    _xlower(lambda v, b: RM.resample_mix_pallas(v, b, 44100, 16000,
                                                fade=160), v, b)


def test_eq_env_lowering(rng):
    from xmtpu.kernels import eq_env as EE
    from xmtpu.ops import biquad

    sos = biquad.eq_sos(
        [{"freq_hz": 1000.0, "gain_db": 3.0, "q": 1.0}], 48000)
    x = jnp.asarray((0.3 * rng.standard_normal((8, 1600))).astype(np.float32))
    _xlower(lambda x: EE.eq_env_pallas(
        np.asarray(sos, np.float32), x, k_rel=0.999, c_att=0.2)[0], x)


@pytest.mark.parametrize("block", [1, 8])
def test_limiter_fused_lowering(rng, block):
    # the fused curve epilogue is the first kernel using VPU
    # transcendentals (exp/log) — serialize its Mosaic MLIR for TPU
    from xmtpu.kernels import envelope as E

    x = jnp.asarray(rng.standard_normal((8, 1600)).astype(np.float32))
    exp = _xlower(
        lambda x: E.limiter_pallas(x, 0.995, 0.4, threshold_db=-6.0,
                                   block=block)[0], x)
    assert exp.platforms == ("tpu",)


def test_fftconv_padfree_unaligned_tail_lowering(rng):
    # pad-free partial edge block whose valid-row count is NOT a
    # multiple of 8 (n=6400, n2=64 -> 100 rows, 44 past the last full
    # block): the in-kernel zero-fill store lands on an unaligned
    # sublane offset — the headline shape's case (98 of 1250 rows)
    from xmtpu.kernels import fftconv as F

    x = jnp.asarray((0.3 * rng.standard_normal((4, 6400))).astype(np.float32))
    ir = (0.5 ** np.arange(256)).astype(np.float32)
    _xlower(lambda x: F.fir_convolve_os_pallas(x, ir, block=4096), x)
