"""End-to-end generator tests (reference parity: xm_audio_generator —
voice+bgm config -> mixed file with progress, SURVEY.md §3.1)."""

import json

import numpy as np
import pytest

from xmtpu import process_file
from xmtpu.config.schema import load_config
from xmtpu.io import read_wav, write_wav
from xmtpu.ops import mix as M
from tests.conftest import rms_db


@pytest.fixture
def voice_bgm_files(tmp_path, rng):
    sr = 16000
    voice = (rng.standard_normal(sr * 2) * 6000).astype(np.int16)  # 2 s
    bgm = (np.sin(2 * np.pi * 220 * np.arange(sr) / sr) * 8000).astype(np.int16)
    vp, bp = tmp_path / "voice.wav", tmp_path / "bgm.wav"
    write_wav(vp, voice, sr)
    write_wav(bp, bgm, sr)
    return vp, bp, voice, bgm, sr


def test_generator_end_to_end(tmp_path, voice_bgm_files):
    vp, bp, voice, bgm, sr = voice_bgm_files
    cfg_json = {
        "sampleRate": sr,
        "normalize": "peak",
        "normalizeTargetDb": -1.0,
        "tracks": [
            {"url": str(vp), "kind": "voice", "volume": 1.0,
             "fadeInTimeMs": 50, "fadeOutTimeMs": 100},
            {"url": str(bp), "kind": "bgm", "volume": 0.4, "loop": True},
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_json))
    out_path = tmp_path / "out.wav"

    seen = []
    process_file(None, load_config(cfg_path), out_path, progress=seen.append)

    assert seen[0] == 0.0 and seen[-1] == 100.0 and seen == sorted(seen)
    out, out_sr = read_wav(out_path)
    assert out_sr == sr and out.shape[0] == 2 * sr

    # golden: numpy oracle of the same chain
    v = voice.astype(np.float64) / 32768.0
    b = np.tile(bgm.astype(np.float64) / 32768.0, 2)
    want = M.mix_oracle_np(
        [v, b], [1.0, 0.4],
        [int(0.05 * sr), 0], [int(0.1 * sr), 0],
        normalize="peak", target_amp=M.db_to_amp(-1.0),
    )
    got = out[:, 0].astype(np.float64) / 32768.0
    assert rms_db(got - want, want) <= -60.0  # int16 quantization floor ~-68 dB


def test_generator_in_memory_input(tmp_path, rng):
    """The reference passes voice PCM in-memory (not via file) — parity."""
    sr = 16000
    voice = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    cfg = load_config(json.dumps({
        "sampleRate": sr, "normalize": None,
        "tracks": [{"url": "voice", "kind": "voice"}],
    }))
    out_path = tmp_path / "o.wav"
    process_file({"voice": (voice, sr)}, cfg, out_path)
    out, _ = read_wav(out_path)
    from xmtpu.ops.convert import f32_to_pcm16_np

    np.testing.assert_array_equal(out[:, 0], f32_to_pcm16_np(voice))


def test_generator_track_trim_end_ms(tmp_path, rng):
    sr = 16000
    x = np.full(sr, 0.5, np.float32)
    cfg = load_config(json.dumps({
        "sampleRate": sr, "normalize": None,
        "tracks": [{"url": "x", "endTimeMs": 250}],
    }))
    p = tmp_path / "t.wav"
    process_file({"x": (x, sr)}, cfg, p)
    out, _ = read_wav(p)
    assert out.shape[0] == sr // 4


def test_generator_missing_url_raises(tmp_path):
    from xmtpu.utils.errors import ConfigError

    cfg = load_config(json.dumps({"tracks": [{"kind": "voice"}]}))
    with pytest.raises(ConfigError):
        process_file(None, cfg, tmp_path / "x.wav")
