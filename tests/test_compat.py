"""Handle-style compat API tests (reference call-shape parity) + raw PCM."""

from __future__ import annotations

import json
import time

import numpy as np
import pytest

import xmtpu  # noqa: F401
from xmtpu import compat
from xmtpu.io import open_audio
from xmtpu.io.wav import write_wav


@pytest.fixture()
def wav_fixture(tmp_path, rng):
    sr = 16000
    pcm = (rng.standard_normal(sr) * 9000).astype(np.int16)  # 1 s
    p = tmp_path / "v.wav"
    write_wav(str(p), pcm, sr)
    return str(p), pcm, sr


def test_mixer_handle_flow(wav_fixture):
    path, pcm, sr = wav_fixture
    cfg = json.dumps({"sampleRate": sr,
                      "tracks": [{"url": path, "volume": 1.0}]})
    h = compat.XmAudioUtils()
    assert h.mixer_init(cfg) == 0
    assert h.mixer_seek(100.0) == 0
    f = h.mixer_get_frame()
    assert f is not None and f.dtype == np.int16
    h.mixer_seek(0.0)
    frames = []
    while True:
        f = h.mixer_get_frame()
        if f is None:
            break
        frames.append(f)
        assert len(frames) < 200  # 1 s / 20 ms = 50 + slack
    total = np.concatenate(frames)[: len(pcm), 0]
    # mixer passthrough of a single full-gain track == input samples
    np.testing.assert_allclose(total.astype(np.int32), pcm.astype(np.int32),
                               atol=1)
    h.freep()


CHAIN = [{"name": "equalizer",
          "params": {"bands": [{"freq_hz": 1000.0, "gain_db": 3.0,
                                "q": 1.0}]}},
         {"name": "limiter", "params": {"threshold_db": -6.0}}]


def test_effects_handle_matches_offline(wav_fixture):
    """xm_audio_effects_* parity: the effects handle streams the SAME
    output as the offline xmtpu.effects() chain (streaming == offline
    invariant, SURVEY.md §4.2)."""
    from tests.conftest import rms_db

    path, pcm, sr = wav_fixture
    h = compat.XmAudioUtils()
    assert h.effects_init(json.dumps(CHAIN), path) == 0
    frames = []
    while (f := h.effects_get_frame()) is not None:
        frames.append(f)
        assert len(frames) < 200
    got = np.concatenate(frames)[: len(pcm), 0].astype(np.float64)
    want = np.asarray(
        xmtpu.effects(pcm, sr, CHAIN)).reshape(-1).astype(np.float64)
    assert rms_db(got - want, want) <= -80.0
    # seek back: frame 0 reproduces bit-for-bit
    h.effects_seek(0.0)
    np.testing.assert_array_equal(h.effects_get_frame(), frames[0])
    h.freep()
    from xmtpu.utils.errors import XmtpuError

    with pytest.raises(XmtpuError, match="effects_init"):
        h.effects_get_frame()


def test_effects_handle_in_memory_and_eos(wav_fixture):
    path, pcm, sr = wav_fixture
    h = compat.XmAudioUtils()
    # dict config with sampleRate + (pcm, sr) in-memory voice
    h.effects_init({"effects": CHAIN, "sampleRate": sr}, (pcm, sr))
    f = h.effects_get_frame()
    assert f is not None and f.dtype == np.int16
    h.effects_seek(2000.0)  # past the 1 s clip -> end-of-stream
    assert h.effects_get_frame() is None


def test_effects_handle_adopts_native_rate(tmp_path, rng):
    """No sampleRate in the config -> the session runs at the VOICE's
    native rate (the reference processes at the input PCM's rate); the
    silent 16 kHz default used to resample a 44.1k voice."""
    sr = 44100
    pcm = (rng.standard_normal(sr // 2) * 9000).astype(np.int16)
    p = tmp_path / "v44.wav"
    write_wav(str(p), pcm, sr)
    h = compat.XmAudioUtils()
    h.effects_init(json.dumps(CHAIN), str(p))
    f = h.effects_get_frame()
    assert f.shape[0] == sr // 50  # 20 ms at 44.1k = 882, not 320
    # in-memory pair without a config rate: same rule
    h.effects_init(CHAIN, (pcm, sr))
    assert h.effects_get_frame().shape[0] == sr // 50
    # explicit config rate still wins
    h.effects_init({"effects": CHAIN, "sampleRate": 16000}, (pcm, sr))
    assert h.effects_get_frame().shape[0] == 320


def test_effects_handle_bytes_and_list_pair(wav_fixture):
    path, pcm, sr = wav_fixture
    h = compat.XmAudioUtils()
    # bytes JSON + bytes path used to be mangled by str() ("b'...'")
    h.effects_init(json.dumps(CHAIN).encode(), path.encode())
    assert h.effects_get_frame() is not None
    # list pair, like mix()'s track coercion
    h.effects_init(CHAIN, [pcm, sr])
    assert h.effects_get_frame() is not None


def test_effects_handle_rejects_tracks_config(wav_fixture):
    path, pcm, sr = wav_fixture
    from xmtpu.utils.errors import ConfigError

    h = compat.XmAudioUtils()
    with pytest.raises(ConfigError, match="mixer_init"):
        h.effects_init({"effects": CHAIN,
                        "tracks": [{"url": path}]}, path)
    with pytest.raises(ConfigError, match="chain list"):
        h.effects_init(42, path)
    # a plausible (path, sr) pair used to register a unicode array as
    # PCM (review find) — typed refuse naming the accepted forms
    with pytest.raises(ConfigError, match=r"\(path, rate\)"):
        h.effects_init(CHAIN, (path, sr))


def test_generator_double_start_atomic(tmp_path, wav_fixture, monkeypatch):
    """Two concurrent start()s must not both launch workers: the
    unlocked check-then-act let both pass (review find). The second
    call returns the reference's -1 'already running'."""
    import threading

    from xmtpu.graph import pipeline

    gate = threading.Event()
    started = threading.Event()

    def slow_process(inputs, cfg, out_path, progress=None):
        started.set()
        gate.wait(10)

    monkeypatch.setattr(pipeline, "process_file", slow_process)
    path, pcm, sr = wav_fixture
    cfg = json.dumps({"sampleRate": sr, "tracks": [{"url": path}]})
    g = compat.XmAudioGenerator()
    assert g.start(cfg, str(tmp_path / "o.wav")) == 0
    started.wait(10)
    assert g.start(cfg, str(tmp_path / "o2.wav")) == -1
    gate.set()
    assert g.wait(30) == compat.GS_COMPLETED


def test_generator_async_flow(tmp_path, wav_fixture):
    path, pcm, sr = wav_fixture
    out = str(tmp_path / "out.wav")
    cfg = json.dumps({"sampleRate": sr, "normalize": "peak",
                      "tracks": [{"url": path, "volume": 0.8,
                                  "fadeInTimeMs": 10}]})
    g = compat.XmAudioGenerator()
    assert g.start(cfg, out) == 0
    status = g.wait(120)
    assert status == compat.GS_COMPLETED, (status, g.error)
    assert g.get_progress() == 100.0
    got, got_sr = xmtpu.io.read_wav(out)
    assert got_sr == sr and got.shape[0] == len(pcm)


def test_generator_error_pollable(tmp_path):
    cfg = json.dumps({"sampleRate": 16000,
                      "tracks": [{"url": "/nonexistent/x.wav"}]})
    g = compat.XmAudioGenerator()
    g.start(cfg, str(tmp_path / "o.wav"))
    assert g.wait(60) == compat.GS_ERROR
    assert g.error is not None


def test_raw_pcm_decoder(tmp_path, rng):
    pcm = (rng.standard_normal(4000) * 9000).astype(np.int16)
    p = tmp_path / "a.pcm"
    pcm.tofile(str(p))
    with open_audio(str(p), sample_rate=8000) as d:
        assert d.sample_rate == 8000
        got = d.read_all()
    np.testing.assert_array_equal(got[:, 0], pcm)
    with pytest.raises(ValueError):
        open_audio(str(p))  # missing sample_rate


def test_decoder_recreate_closes_previous(tmp_path, rng):
    """decoder_create on an already-open handle must close it first
    (the old handle used to leak a native decoder / file descriptor
    per file in a directory-scan loop — review find)."""
    import numpy as np

    from xmtpu.compat import XmAudioUtils
    from xmtpu.io.wav import write_wav

    p = str(tmp_path / "a.wav")
    write_wav(p, (rng.standard_normal(4000) * 9000).astype(np.int16),
              16000)
    u = XmAudioUtils()
    u.decoder_create(p)
    first = u._decoder
    closed = []
    orig = first.close
    first.close = lambda: (closed.append(1), orig())
    u.decoder_create(p)
    assert closed, "previous decoder was not closed on re-create"
    assert u.decoder_get_pcm(1000) is not None
    u.decoder_freep()
