"""Interactive-style streaming: seek + 20 ms frame reads + grouped reads.

    python examples/streaming_session.py
"""

import numpy as np

from xmtpu.api import Session


def main() -> None:
    sr = 16000
    rng = np.random.default_rng(3)
    voice = (0.3 * rng.standard_normal(sr * 8)).astype(np.float32)
    bgm = (0.1 * np.sin(2 * np.pi * 110 * np.arange(sr * 2) / sr)).astype(
        np.float32)
    config = {
        "sampleRate": sr,
        "normalize": None,
        "tracks": [
            {"url": "voice", "kind": "voice"},
            {"url": "bgm", "kind": "bgm", "loop": True, "sideDuck": True},
        ],
        "effects": [
            {"name": "equalizer",
             "params": {"bands": [
                 {"freq_hz": 300.0, "gain_db": 2.0, "q": 1.0}]}},
            {"name": "limiter", "params": {"threshold_db": -3.0}},
        ],
    }
    s = Session(config, frame_ms=20,
                sources={"voice": (voice, sr), "bgm": (bgm, sr)},
                prefetch_depth=2)        # frames dispatched + host-copied
    # ahead of the read cadence: with depth*frame_ms above the link RTT,
    # sequential read() calls stop being round-trip-bound
    s.seek(1500.0)                       # sample-accurate, state re-primed
    frame = s.read()                     # one 20 ms int16 frame
    group = s.read_many(25)              # 500 ms in ONE device dispatch
    print(f"frame {frame.shape}, group {group.shape}, "
          f"peak {np.abs(group).max()}")


if __name__ == "__main__":
    main()
