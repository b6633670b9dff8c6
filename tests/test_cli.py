"""CLI surface tests (in-process main(), CPU-friendly shapes)."""

from __future__ import annotations

import json

import numpy as np
import pytest

import xmtpu  # noqa: F401
from xmtpu.cli import main
from xmtpu.io.wav import read_wav, write_wav


@pytest.fixture()
def tone(tmp_path):
    sr = 44100
    t = np.arange(sr) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    p = tmp_path / "tone.wav"
    write_wav(str(p), pcm, sr)
    return str(p), sr


def test_cli_resample(tone, tmp_path):
    inp, sr = tone
    out = str(tmp_path / "out16k.wav")
    assert main(["resample", inp, out, "--rate", "16000"]) == 0
    pcm, got_sr = read_wav(out)
    assert got_sr == 16000 and pcm.shape[0] == 16000


def test_cli_effects(tone, tmp_path):
    inp, sr = tone
    chain = [{"name": "volume", "params": {"gain_db": -6.0}}]
    cpath = tmp_path / "chain.json"
    cpath.write_text(json.dumps(chain))
    out = str(tmp_path / "fx.wav")
    assert main(["effects", inp, out, "--chain", str(cpath)]) == 0
    got, _ = read_wav(out)
    ref, _ = read_wav(inp)
    ratio = np.max(np.abs(got)) / np.max(np.abs(ref))
    assert abs(20 * np.log10(ratio) + 6.0) < 0.1


def test_cli_generate(tone, tmp_path):
    inp, sr = tone
    cfg = {"sampleRate": 16000,
           "tracks": [{"url": inp, "volume": 0.8}]}
    cpath = tmp_path / "cfg.json"
    cpath.write_text(json.dumps(cfg))
    out = str(tmp_path / "gen.wav")
    assert main(["generate", str(cpath), out]) == 0
    got, got_sr = read_wav(out)
    assert got_sr == 16000 and got.shape[0] == 16000


def test_cli_batch(tone, tmp_path):
    inp, sr = tone
    manifest = [{"voice": inp, "out": str(tmp_path / "b0.wav")}]
    mpath = tmp_path / "manifest.json"
    mpath.write_text(json.dumps(manifest))
    assert main(["batch", str(mpath)]) == 0
    got, got_sr = read_wav(str(tmp_path / "b0.wav"))
    assert got_sr == 16000 and got.shape[0] == 16000


def test_cli_unknown_subcommand():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
