"""Mix two tracks and master to -16 LUFS (ITU-R BS.1770 gated loudness).

    python examples/lufs_mastering.py
"""

import numpy as np

from xmtpu import api


def main() -> None:
    sr = 48000
    rng = np.random.default_rng(1)
    n = sr * 5
    voice = (0.2 * rng.standard_normal(n)).astype(np.float32)
    music = (0.1 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)).astype(
        np.float32)
    out = api.mix(
        [
            {"pcm": voice, "sr": sr, "fade_in_ms": 250},
            {"pcm": music, "sr": sr, "gain_db": -6.0, "loop": True},
        ],
        sr,
        normalize="lufs",
        target_db=-16.0,
    )
    from xmtpu.ops.loudness import measure_lufs_np

    x = out[:, None] if out.ndim == 1 else out
    print(f"mixed {out.shape}, integrated loudness "
          f"{measure_lufs_np(x.T, sr):.2f} LUFS")


if __name__ == "__main__":
    main()
