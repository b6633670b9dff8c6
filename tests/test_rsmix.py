"""kernels/rsmix.py: fused i16 resample+gain/fade+mix front end.

Interpret-mode checks against the composed XLA reference
(pcm16_to_f32 -> polyphase_resample -> apply_gain_fade -> sum); the
kernel's bf16 3-pass arithmetic runs identically under interpret
(chip spot-check measured -108 dB, round 2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xmtpu.kernels.rsmix import resample_mix_pallas, resample_mix_supported
from xmtpu.ops import convert as C
from xmtpu.ops import mix as M
from xmtpu.ops import resample as R


def _ref(v, b, sri, sro, fade, gb):
    vf = C.pcm16_to_f32(jnp.asarray(v))
    bf = C.pcm16_to_f32(jnp.asarray(b))
    rv = R.polyphase_resample(vf, sri, sro)
    rb = R.polyphase_resample(bf, sri, sro)
    on = rv.shape[-1]
    return np.asarray(
        M.apply_gain_fade(rv, 1.0, fade, fade, length=on)
        + M.apply_gain_fade(rb, gb, fade, fade, length=on)
    ) * 32768.0


@pytest.mark.parametrize(
    "B,n,sri,sro,fade,gb",
    [
        (3, 44100, 44100, 16000, 4000, 0.4),   # single-block rows (F=nc)
        (8, 441 * 288, 44100, 16000, 0, 1.0),  # multi-block (F=144, 2 blocks)
        (2, 9600, 48000, 44100, 100, 0.7),     # upward-ish ratio
        (5, 441 * 24, 44100, 16000, 300, 0.4), # odd batch -> G=1
    ],
)
def test_rsmix_matches_xla_front(rng, B, n, sri, sro, fade, gb):
    assert resample_mix_supported(n, B, sri, sro)
    v = (rng.standard_normal((B, n)) * 9000).astype(np.int16)
    b = (rng.standard_normal((B, n)) * 7000).astype(np.int16)
    y = np.asarray(
        resample_mix_pallas(jnp.asarray(v), jnp.asarray(b), sri, sro,
                            bgm_gain=gb, fade=fade, interpret=True))
    ref = _ref(v, b, sri, sro, fade, gb)
    assert y.shape == ref.shape
    from tests.conftest import rms_db

    err = rms_db(y.astype(np.float64) - ref, ref)
    assert err < -80, err


def test_rsmix_unsupported_ratios():
    # pure decimation: the filter band spans many frames (width > 2M)
    assert not resample_mix_supported(9600, 2, 48000, 16000)
    # unaligned length
    assert not resample_mix_supported(44101, 2, 44100, 16000)
    # identity rate
    assert not resample_mix_supported(44100, 2, 16000, 16000)


def test_rsmix_unsupported_geometry_typed_refuse():
    """An ungateable frame count used to fall into an opaque
    ZeroDivisionError from _pick_F()==0 (review find)."""
    import pytest

    from xmtpu.kernels import rsmix
    from xmtpu.utils.errors import ConfigError

    n = 1025 * 441  # nc=1025: no divisor that is a multiple of 8, >1024
    assert not rsmix.resample_mix_supported(n, 2, 44100, 16000)
    v = np.zeros((2, n), np.int16)
    with pytest.raises(ConfigError, match="resample_mix_supported"):
        rsmix.resample_mix_pallas(v, v, 44100, 16000, interpret=True)
