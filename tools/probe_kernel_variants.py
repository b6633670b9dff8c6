"""Chip probe: opt-in kernel variants vs their defaults, standalone.

Measures (one process, chip lock held, benchmarks._timeit convention):
  1. sosfilt_pallas lanes=128 vs 256 at the big-batch shape (256, 160k)
     and the small-batch segmented shape (32, 480k);
  2. envelope_pallas block=None vs 8 vs 16 at the headline detector
     shape (256, 160k).

STANDALONE numbers only gate which variants graduate to a bench.py
chain probe — per CLAUDE.md, chain defaults flip ONLY on a bench.py
win (a faster-standalone opaque stage has lost in-chain before).

Usage:  python tools/probe_kernel_variants.py
Prints one JSON line with ms-per-iter for every variant.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from xmtpu._cachedir import host_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", host_cache_dir())

import numpy as np  # noqa: E402

from xmtpu.benchmarks import _acquire_chip_lock, _timeit  # noqa: E402


def main() -> dict:
    import jax
    import jax.numpy as jnp
    from xmtpu.kernels.envelope import envelope_pallas
    from xmtpu.kernels.iir import sosfilt_pallas
    from xmtpu.ops import biquad, limiter as L

    rng = np.random.default_rng(0)
    res: dict = {}

    def fetch(o):
        _ = np.asarray((o[0] if isinstance(o, tuple) else o)[0, :4])

    sos = biquad.eq_sos(
        [{"freq_hz": f, "gain_db": g, "q": q} for f, g, q in
         [(100.0, 4.0, 1.0), (400.0, -3.0, 1.2), (1000.0, 2.5, 0.9),
          (4000.0, -2.0, 1.1), (7000.0, 3.0, 0.8)]], 16000)
    for shape in ((256, 160000), (32, 480000)):
        x = jnp.asarray((0.3 * rng.standard_normal(shape)).astype(np.float32))
        for lanes in (128, 256):
            fn = jax.jit(lambda x, lanes=lanes: sosfilt_pallas(
                sos, x, lanes=lanes)[0])
            res[f"iir_{shape[0]}x{shape[1]}_lanes{lanes}_ms"] = round(
                _timeit(lambda: fn(x), fetch) * 1e3, 3)

    k_rel = L._release_coeff(100.0, 16000)
    c_att = L._attack_coeff(1.0, 16000)
    d = jnp.asarray(np.abs(
        rng.standard_normal((256, 160000))).astype(np.float32))
    for blk in (None, 8, 16):
        fn = jax.jit(lambda d, blk=blk: envelope_pallas(
            d, k_rel, c_att, block=blk)[0])
        res[f"envelope_256x160k_block{blk}_ms"] = round(
            _timeit(lambda: fn(d), fetch) * 1e3, 3)
    return res


if __name__ == "__main__":
    _lock = _acquire_chip_lock()
    print(json.dumps(main()))
