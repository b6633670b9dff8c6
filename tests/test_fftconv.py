"""kernels/fftconv.py: VMEM-resident overlap-save DFT convolution.

Interpret-mode (CPU) checks against the scipy f64 oracle; the bf16
3-pass split arithmetic runs identically under interpret, so these
accuracies are representative of chip behavior (chip spot-check
measured -98.9 dB at the config-3 shape, round 2).
"""

import numpy as np
import pytest
from scipy import signal

import jax.numpy as jnp

from xmtpu.kernels.fftconv import fir_convolve_os_pallas
from xmtpu.ops import reverb as _rv


from tests.conftest import rms_db


def _err_db(y, ref):
    return rms_db(np.asarray(y, np.float64) - ref, ref)


@pytest.mark.parametrize(
    "R,n,m,block,gp",
    [
        (3, 48000, 24000, 65536, None),  # odd rows, config-3-like IR
        (4, 48000, 8000, 16384, 2),      # multi-frame, grouped
        (1, 9600, 4000, 32768, 4),       # single row, n < hop
        (5, 48000, 4000, 16384, None),   # rows % 2*gp != 0
    ],
)
def test_fftconv_matches_oracle(rng, R, n, m, block, gp):
    x = rng.standard_normal((R, n)).astype(np.float32)
    ir = rng.standard_normal(m) * np.exp(-np.arange(m) / m * 5.0)
    ir /= np.sqrt((ir**2).sum())
    y = fir_convolve_os_pallas(jnp.asarray(x), ir, block=block, gp=gp,
                               interpret=True)
    ref = signal.fftconvolve(x.astype(np.float64), ir[None, :],
                             axes=-1)[:, :n]
    assert y.shape == x.shape
    err = _err_db(y, ref)
    assert err < -90, err


def test_fftconv_3d_batch(rng):
    """(B, C, n) batches flatten/restore through the kernel."""
    x = rng.standard_normal((2, 2, 9600)).astype(np.float32)
    ir = _rv.synthetic_ir(0.1, 16000)
    y = fir_convolve_os_pallas(jnp.asarray(x), ir, block=16384,
                               interpret=True)
    ref = signal.fftconvolve(
        x.astype(np.float64), np.asarray(ir)[None, None, :], axes=-1
    )[..., :9600]
    assert y.shape == x.shape
    assert _err_db(y, ref) < -90


def test_fftconv_block_too_small():
    with pytest.raises(ValueError, match="too small"):
        fir_convolve_os_pallas(jnp.zeros((2, 1000)), np.ones(24000),
                               block=32768, interpret=True)


def test_reverb_pallas_backend_matches_xla(rng):
    """reverb(backend='pallas') == reverb(backend='xla') wet/dry mix —
    BOTH backends actually run (review find: the old version compared
    pallas to the numpy oracle only)."""
    x = rng.standard_normal((2, 9600)).astype(np.float32)
    ir = _rv.synthetic_ir(0.1, 16000)
    y_pl = _rv.reverb(jnp.asarray(x), jnp.asarray(ir), backend="pallas",
                      block=16384, interpret=True)
    y_xla = _rv.reverb(jnp.asarray(x), jnp.asarray(ir), backend="xla")
    ref = _rv.reverb_np(x, np.asarray(ir))
    assert _err_db(y_pl, ref) < -90
    assert _err_db(y_xla, ref) < -90
    assert _err_db(np.asarray(y_pl, np.float64),
                   np.asarray(y_xla, np.float64)) < -90


def test_fftconv_pre_gains_and_trim(rng):
    """pre_row/pre_col in-kernel input gains == explicit pre-multiply;
    trim=False returns the hop-padded output whose [:n] equals the
    trimmed result (round-3 batch-chain fusions)."""
    R, n = 4, 9600
    x = rng.standard_normal((R, n)).astype(np.float32)
    ir = _rv.synthetic_ir(0.1, 16000)
    pr = np.linspace(0.5, 2.0, R).astype(np.float32)
    pc = np.abs(rng.standard_normal(n)).astype(np.float32)
    y = fir_convolve_os_pallas(jnp.asarray(x), ir, block=16384,
                               interpret=True, pre_row=jnp.asarray(pr),
                               pre_col=jnp.asarray(pc))
    ref = fir_convolve_os_pallas(
        jnp.asarray(x * pr[:, None] * pc[None, :]), ir, block=16384,
        interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=0, atol=1e-6)
    yp = fir_convolve_os_pallas(jnp.asarray(x), ir, block=16384,
                                interpret=True, pre_row=jnp.asarray(pr),
                                pre_col=jnp.asarray(pc), trim=False)
    assert yp.shape[-1] >= n and yp.shape[-1] % 128 == 0
    np.testing.assert_array_equal(np.asarray(yp[..., :n]), np.asarray(y))
    # row-only gain (pre_col=None) matches linearity
    y_r = fir_convolve_os_pallas(jnp.asarray(x), ir, block=16384,
                                 interpret=True, pre_row=jnp.asarray(pr))
    ref_r = fir_convolve_os_pallas(jnp.asarray(x * pr[:, None]), ir,
                                   block=16384, interpret=True)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(ref_r),
                               rtol=0, atol=1e-6)


def test_reverb_trim_requires_pure_conv():
    with pytest.raises(ValueError, match="trim"):
        _rv.reverb(jnp.zeros((2, 4800)), jnp.ones(100), wet=0.3, dry=0.7,
                   backend="pallas", block=16384, interpret=True,
                   trim=False)


def test_non_power_of_two_block_raises():
    """The block requirement used to be enforced only by a bare assert
    in ops.fftmm._split_factors — opaque to the caller and stripped
    under python -O (review find)."""
    import numpy as np
    import pytest

    from xmtpu.kernels.fftconv import fir_convolve_os_pallas

    x = np.zeros((2, 4096), np.float32)
    ir = np.zeros(64, np.float32)
    with pytest.raises(ValueError, match="power of two"):
        fir_convolve_os_pallas(x, ir, block=48000, interpret=True)


def test_fftconv_padfree_input_parity(rng):
    """PAD-FREE input path (n % n2 == 0: the last grid block is a
    partial edge block and the kernel zero-fills the window tail
    itself) must be bit-identical to the explicit-pad run, including
    the trim=False valid conv tail the docstring promises."""
    from xmtpu.ops.fftmm import _split_factors

    block, m, n = 4096, 500, 6400
    n1, n2 = _split_factors(block)
    hop = (block - (m - 1)) // (8 * n2) * (8 * n2)
    nblk = -(-n // hop)
    assert n % n2 == 0 and n < nblk * hop  # pins the pad-free branch
    x = rng.standard_normal((4, n)).astype(np.float32)
    ir = rng.standard_normal(m) * np.exp(-np.arange(m) / m * 5.0)
    yp = fir_convolve_os_pallas(jnp.asarray(x), ir, block=block,
                                interpret=True, trim=False)
    # caller-side explicit zero-pad to exactly nblk*hop: n == nblk*hop
    # there, so that run takes the full-blocks path (tail=None)
    xpad = np.zeros((4, nblk * hop), np.float32)
    xpad[:, :n] = x
    y_ref = fir_convolve_os_pallas(jnp.asarray(xpad), ir, block=block,
                                   interpret=True, trim=False)
    assert yp.shape == y_ref.shape == (4, nblk * hop)
    np.testing.assert_array_equal(np.asarray(yp), np.asarray(y_ref))
    # the [n, nblk*hop) region is the VALID conv tail of the
    # zero-padded input, not garbage
    full = np.stack([np.convolve(r.astype(np.float64), ir) for r in x])
    full = np.pad(full, ((0, 0), (0, max(0, nblk * hop - full.shape[1]))))
    tail_ref = full[:, n : nblk * hop]
    tail_err = np.sqrt(np.mean((np.asarray(yp, np.float64)[:, n:]
                                - tail_ref) ** 2))
    assert tail_err < 1e-4 * max(1.0, np.sqrt(np.mean(tail_ref**2)))


def test_fftconv_padfree_with_pre_gains_parity(rng):
    """Pad-free input combined with the in-kernel pre_row/pre_col gain
    fusion and trim=False — the exact headline-chain configuration
    (batch.py fuses fade+prescale into the reverb tile load). The
    stale rows of the partial edge block pass through the pre-multiply
    before the tail zero-fill overwrites them, so this pins that
    ordering: must be bit-identical to the explicit-pad run."""
    from xmtpu.ops.fftmm import _split_factors

    block, m, n, R = 4096, 500, 6400, 4
    n1, n2 = _split_factors(block)
    hop = (block - (m - 1)) // (8 * n2) * (8 * n2)
    nblk = -(-n // hop)
    assert n % n2 == 0 and n < nblk * hop  # pins the pad-free branch
    x = rng.standard_normal((R, n)).astype(np.float32)
    ir = rng.standard_normal(m) * np.exp(-np.arange(m) / m * 5.0)
    pr = np.linspace(0.5, 2.0, R).astype(np.float32)
    pc = np.abs(rng.standard_normal(n)).astype(np.float32)
    yp = fir_convolve_os_pallas(jnp.asarray(x), ir, block=block,
                                interpret=True, trim=False,
                                pre_row=jnp.asarray(pr),
                                pre_col=jnp.asarray(pc))
    xpad = np.zeros((R, nblk * hop), np.float32)
    xpad[:, :n] = x
    pcpad = np.zeros(nblk * hop, np.float32)
    pcpad[:n] = pc
    y_ref = fir_convolve_os_pallas(jnp.asarray(xpad), ir, block=block,
                                   interpret=True, trim=False,
                                   pre_row=jnp.asarray(pr),
                                   pre_col=jnp.asarray(pcpad))
    np.testing.assert_array_equal(np.asarray(yp), np.asarray(y_ref))
