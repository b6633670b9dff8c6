"""Chip probe: segmented-envelope segment-count alignment (round 5).

The config-3 XProf trace shows the det (16, 480000) -> (256, 30000)
segment-split reshape costing 0.36 ms — 5x its 61 MB roofline — while
the neighboring transpose/merge ops run at roofline. Hypothesis:
seglen 30000 is not lane-aligned (30000 % 128 != 0), so every segment
row starts mid-(8,128)-tile and the relayout pays lane rotations; a
NON-power-of-2 segment count with 128-aligned seglen (S=15 ->
seglen 32000 = 250*128, RS=240 of 256 lanes) should cut it.

Usage: python tools/probe_seg_alignment.py
Times envelope_pallas (the stage that owns the reshape) at the
config-3 limiter detector shape for S in {16, 15, 10}; one JSON line
per variant (iters=40, one-fetch convention).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xmtpu.benchmarks import _acquire_chip_lock, _timeit
    from xmtpu.kernels.envelope import envelope_pallas
    from xmtpu.ops import limiter as L

    _lock = _acquire_chip_lock()  # noqa: F841
    R, n, sr = 16, 480000, 48000
    rng = np.random.default_rng(0)
    d = jnp.asarray(np.abs(0.4 * rng.standard_normal((R, n))
                           ).astype(np.float32))
    k_rel = L._release_coeff(100.0, sr)
    c_att = L._attack_coeff(1.0, sr)
    ref = None
    for S in (16, 15, 10):
        fn = jax.jit(lambda x, S=S: envelope_pallas(
            x, k_rel, c_att, segments=S)[0])
        out = np.asarray(fn(d))
        if ref is None:
            ref = out.astype(np.float64)
        else:
            err = out.astype(np.float64) - ref
            db = 10 * np.log10(
                max(float(np.mean(err**2)), 1e-300)
                / float(np.mean(ref**2)))
            assert db <= -80.0, (S, db)
        dt = _timeit(lambda: fn(d), lambda o: np.asarray(o[0, :4]))
        print(json.dumps({"probe": "seg_alignment", "segments": S,
                          "seglen": n // S, "lane_aligned":
                          (n // S) % 128 == 0,
                          "ms": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()
