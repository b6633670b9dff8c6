"""Bit-exactness tests for int16<->f32 conversion (SURVEY.md §4.2: the one
place bit equality is demanded — it defines "same PCM formats",
BASELINE.json:5)."""

import numpy as np
import jax.numpy as jnp

from xmtpu.ops import convert as C


def test_pcm16_to_f32_exact():
    x = np.arange(-32768, 32768, dtype=np.int16)
    got = np.asarray(C.pcm16_to_f32(jnp.asarray(x)))
    want = C.pcm16_to_f32_np(x)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)
    assert want[0] == -1.0  # INT16_MIN -> -1.0 exactly
    assert want[32768] == 0.0


def test_f32_to_pcm16_bit_exact(rng):
    x = (rng.standard_normal(100000) * 0.7).astype(np.float32)
    # include exact halves, clip region, signed zeros, boundaries
    special = np.array(
        [0.0, -0.0, 0.5 / 32768, -0.5 / 32768, 1.5 / 32768, -1.5 / 32768,
         1.0, -1.0, 1.5, -1.5, 32766.5 / 32768, -32768.5 / 32768],
        dtype=np.float32,
    )
    x = np.concatenate([x, special])
    got = np.asarray(C.f32_to_pcm16(jnp.asarray(x)))
    want = C.f32_to_pcm16_np(x)
    np.testing.assert_array_equal(got, want)


def test_round_half_away_rule():
    x = np.array([0.5, -0.5, 1.5, 2.5, -2.5], dtype=np.float32) / 32768.0
    got = C.f32_to_pcm16_np(x)
    np.testing.assert_array_equal(got, [1, -1, 2, 3, -3])


def test_roundtrip_int16_identity():
    """i16 -> f32 -> i16 must be the identity for every int16 value."""
    x = np.arange(-32768, 32768, dtype=np.int16)
    back = C.f32_to_pcm16_np(C.pcm16_to_f32_np(x))
    np.testing.assert_array_equal(back, x)


def test_clipping():
    x = np.array([2.0, -2.0, 1.0001, -1.0001], dtype=np.float32)
    got = C.f32_to_pcm16_np(x)
    np.testing.assert_array_equal(got, [32767, -32768, 32767, -32768])
