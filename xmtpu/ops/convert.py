"""Sample-format conversion: int16 <-> float32.

This is the ONE place the framework demands bit-exactness (SURVEY.md
§4.2): it defines "same PCM in/out formats" as the reference
(``BASELINE.json:5``). The pinned rule:

* int16 -> float32:  ``f = i / 32768.0``  (so INT16_MIN -> -1.0 exactly;
  32767 -> 0.99996948...)
* float32 -> int16:  ``i = clip(round_half_away(f * 32768.0),
  -32768, 32767)``

Round-half-away-from-zero matches the C idiom ``(short)(x + (x >= 0 ?
0.5f : -0.5f))`` used by the reference's short<->float helpers
(``src/tools/conversion.*`` [upstream, SURVEY.md §2.1]).

Both a JAX version (device, jittable) and a numpy version (host oracle)
are provided; tests assert they agree bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PCM16_SCALE = 32768.0
INT16_MIN = -32768
INT16_MAX = 32767


def pcm16_to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 in [-1.0, 1.0). Jittable."""
    return x.astype(jnp.float32) * jnp.float32(1.0 / PCM16_SCALE)


def f32_to_pcm16(x: jnp.ndarray) -> jnp.ndarray:
    """float32 -> int16 PCM: scale, round half away from zero, clip. Jittable."""
    scaled = x.astype(jnp.float32) * jnp.float32(PCM16_SCALE)
    # round half away from zero: sign(x) * floor(|x| + 0.5)
    rounded = jnp.sign(scaled) * jnp.floor(jnp.abs(scaled) + jnp.float32(0.5))
    return jnp.clip(rounded, INT16_MIN, INT16_MAX).astype(jnp.int16)


def pcm16_to_f32_np(x: np.ndarray) -> np.ndarray:
    """Numpy oracle for :func:`pcm16_to_f32`."""
    return (x.astype(np.float32) / np.float32(PCM16_SCALE)).astype(np.float32)


def f32_to_pcm16_np(x: np.ndarray) -> np.ndarray:
    """Numpy oracle for :func:`f32_to_pcm16`."""
    scaled = x.astype(np.float32) * np.float32(PCM16_SCALE)
    rounded = np.sign(scaled) * np.floor(np.abs(scaled) + np.float32(0.5))
    return np.clip(rounded, INT16_MIN, INT16_MAX).astype(np.int16)


