"""FFmpeg shim tests: compressed encode/decode round trips.

These run for real in this environment (libav* 59 present); they skip
cleanly where FFmpeg libraries are missing.
"""

from __future__ import annotations

import numpy as np
import pytest

import xmtpu  # noqa: F401
from xmtpu.native import ffmpeg as ff

pytestmark = pytest.mark.skipif(not ff.available(),
                                reason="no FFmpeg libraries")

SR = 44100


def _tone(seconds=1.0, freq=440.0, amp=12000):
    t = np.arange(int(SR * seconds)) / SR
    return (np.sin(2 * np.pi * freq * t) * amp).astype(np.int16)


def _dominant(pcm, sr):
    x = pcm.reshape(-1).astype(np.float64)
    f = np.fft.rfftfreq(len(x), 1 / sr)
    return f[np.argmax(np.abs(np.fft.rfft(x)))]


@pytest.mark.parametrize("ext", ["mp3", "m4a", "flac"])
def test_encode_decode_roundtrip(tmp_path, ext):
    pcm = _tone()
    p = str(tmp_path / f"tone.{ext}")
    ff.encode(p, pcm, SR)
    got, sr = ff.decode(p)
    assert sr == SR
    # duration within codec padding tolerance (±60 ms)
    assert abs(got.shape[0] - len(pcm)) < 0.06 * SR
    assert abs(_dominant(got, sr) - 440.0) < 2.0
    if ext == "flac":  # lossless: sample-accurate after priming trim
        n = min(got.shape[0], len(pcm))
        np.testing.assert_allclose(got[:n, 0], pcm[:n], atol=1)


def test_io_registry_roundtrip(tmp_path):
    from xmtpu.io import HAVE_FFMPEG, encode_audio, open_audio

    assert HAVE_FFMPEG
    pcm = _tone(0.5)
    p = str(tmp_path / "t.mp3")
    encode_audio(p, pcm, SR)
    with open_audio(p) as d:
        assert d.sample_rate == SR
        got = d.read_all()
    assert abs(_dominant(got, SR) - 440.0) < 2.0


def test_pipeline_with_mp3_input(tmp_path):
    """Generator parity: compressed input through the full pipeline."""
    import json

    from xmtpu import compat

    pcm = _tone(0.6)
    mp3 = str(tmp_path / "voice.mp3")
    ff.encode(mp3, pcm, SR)
    cfg = json.dumps({"sampleRate": 16000,
                      "tracks": [{"url": mp3, "volume": 1.0}]})
    out = str(tmp_path / "out.wav")
    g = compat.XmAudioGenerator()
    g.start(cfg, out)
    assert g.wait(180) == compat.GS_COMPLETED, g.error
    got, sr = xmtpu.io.read_wav(out)
    assert sr == 16000
    assert abs(_dominant(got, sr) - 440.0) < 2.0


def test_decode_rejects_garbage(tmp_path):
    p = tmp_path / "junk.mp3"
    p.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError):
        ff.decode(str(p))


def test_stream_decoder_chunked_flac_exact(tmp_path, rng):
    """Handle-style chunked decode (xm_ff_open/seek/read/close,
    reference audio_decoder_* parity): FLAC is sample-exact, so chunked
    reads and sample-accurate seeks must reproduce the source PCM, and
    the internal buffer must stay small (constant-memory streaming)."""
    sr = 16000
    pcm = (rng.standard_normal(sr * 60) * 8000).astype(np.int16)  # 60 s
    p = str(tmp_path / "long.flac")
    ff.encode(p, pcm, sr)
    with ff.StreamDecoder(p) as d:
        assert d.sample_rate == sr and d.num_channels == 1
        assert abs(d.num_samples - len(pcm)) < 0.01 * sr  # duration known
        np.testing.assert_array_equal(d.read(4000)[:, 0], pcm[:4000])
        d.seek_sample(123_457)  # keyframe seek + decode-and-drop
        np.testing.assert_array_equal(
            d.read(5000)[:, 0], pcm[123_457:128_457])
        d.seek(0.0)
        total = 0
        while True:
            c = d.read(4096)
            if not len(c):
                break
            total += len(c)
        assert total == len(pcm)
        # constant memory: never more than a codec frame + chunk buffered
        assert d.max_buffered <= 16384, d.max_buffered


def test_stream_decoder_registered_backend(tmp_path, rng):
    """open_audio on a compressed file returns the CHUNKED decoder (the
    session reads through read_all; direct users get seek/read)."""
    from xmtpu.io import open_audio

    sr = 16000
    pcm = (rng.standard_normal(sr * 2) * 8000).astype(np.int16)
    p = str(tmp_path / "x.flac")
    ff.encode(p, pcm, sr)
    with open_audio(p) as d:
        assert isinstance(d, ff.StreamDecoder)
        got = d.read_all()
        np.testing.assert_array_equal(got[:, 0], pcm)


def test_compat_decoder_surface(tmp_path, rng):
    """XmAudioUtils decoder_create/seek/get_pcm/freep (the reference's
    audio_decoder handle path through the utils facade)."""
    from xmtpu.compat import XmAudioUtils

    sr = 16000
    pcm = (rng.standard_normal(sr * 3) * 8000).astype(np.int16)
    p = str(tmp_path / "h.flac")
    ff.encode(p, pcm, sr)
    u = XmAudioUtils()
    assert u.decoder_create(p) == 0
    a = u.decoder_get_pcm(2000)
    np.testing.assert_array_equal(a[:, 0], pcm[:2000])
    assert u.decoder_seek(1000.0) == 0  # 1 s -> sample 16000
    b = u.decoder_get_pcm(2000)
    np.testing.assert_array_equal(b[:, 0], pcm[16000:18000])
    # drain to EOF -> None
    while u.decoder_get_pcm(1 << 16) is not None:
        pass
    u.freep()


def test_encode_float_pcm(tmp_path):
    """Float PCM encodes via the pinned int16 conversion instead of a
    silent truncate-to-zero cast (round-2 review find)."""
    from xmtpu.io import HAVE_FFMPEG, encode_audio, open_audio

    if not HAVE_FFMPEG:
        import pytest
        pytest.skip("ffmpeg shim unavailable")
    pcm = _tone(0.4).astype(np.float32) / 32768.0
    p = str(tmp_path / "f.mp3")
    encode_audio(p, pcm, SR)
    with open_audio(p) as d:
        got = d.read_all()
    assert np.abs(got).max() > 5000  # audibly non-silent
    assert abs(_dominant(got, SR) - 440.0) < 2.0


def test_stream_read_all_position_independent(tmp_path):
    """StreamDecoder.read_all returns the whole clip regardless of the
    read position, like the WAV Decoder (round-2 review find)."""
    from xmtpu.io import HAVE_FFMPEG, encode_audio, open_audio

    if not HAVE_FFMPEG:
        import pytest
        pytest.skip("ffmpeg shim unavailable")
    p = str(tmp_path / "s.flac")
    encode_audio(p, _tone(1.0), SR)
    with open_audio(p) as d:
        full = d.read_all()
        d.seek(500.0)
        again = d.read_all()
    assert again.shape == full.shape
    np.testing.assert_array_equal(again, full)


def test_process_file_compressed_extension(tmp_path):
    """process_file writes real compressed bytes for compressed
    extensions via the encoder registry (round-2 review find: it used
    to write RIFF bytes into .m4a)."""
    from xmtpu.io import HAVE_FFMPEG
    from xmtpu.graph.pipeline import process_file
    from xmtpu.config.schema import PipelineConfig, TrackConfig

    if not HAVE_FFMPEG:
        import pytest
        pytest.skip("ffmpeg shim unavailable")
    cfg = PipelineConfig(sample_rate=SR, tracks=[
        TrackConfig(url="v", kind="voice")])
    out = str(tmp_path / "g.mp3")
    process_file({"v": (_tone(0.5), SR)}, cfg, out)
    head = open(out, "rb").read(4)
    assert head != b"RIFF"  # mp3 frames or ID3, never WAV bytes


@pytest.mark.parametrize("ext", ["mp3", "m4a"])
def test_encode_bitrate_controls_size(tmp_path, ext):
    """Reference parity: the encoder exposes a bitrate knob (SURVEY.md
    §2.1 encoder row). Two bitrates must produce measurably different
    file sizes, and both must round-trip."""
    import os

    pcm = _tone(2.0, freq=440.0)
    lo = str(tmp_path / f"lo.{ext}")
    hi = str(tmp_path / f"hi.{ext}")
    ff.encode(lo, pcm, SR, bitrate=48000)
    ff.encode(hi, pcm, SR, bitrate=256000)
    assert os.path.getsize(hi) > 1.5 * os.path.getsize(lo), (
        os.path.getsize(lo), os.path.getsize(hi))
    for p in (lo, hi):
        got, sr = ff.decode(p)
        assert sr == SR
        assert abs(_dominant(got, sr) - 440.0) < 2.0


def test_encode_bitrate_via_registry(tmp_path):
    """The io.encode_audio registry forwards bitrate kwargs."""
    import os

    from xmtpu.io import encode_audio

    pcm = _tone(2.0)
    lo = str(tmp_path / "lo.mp3")
    hi = str(tmp_path / "hi.mp3")
    encode_audio(lo, pcm, SR, bitrate=48000)
    encode_audio(hi, pcm, SR, bitrate=256000)
    assert os.path.getsize(hi) > 1.5 * os.path.getsize(lo)


def test_pipeline_config_bitrate_roundtrip(tmp_path):
    """PipelineConfig.bitrate survives the JSON round trip and reaches
    the encoder through process_file."""
    import os

    from xmtpu.config.schema import config_from_dict, config_to_dict
    from xmtpu.graph.pipeline import process_file

    d = {"tracks": [{"url": "v"}], "sampleRate": SR, "bitrate": 48000}
    cfg = config_from_dict(d)
    assert cfg.bitrate == 48000
    assert config_to_dict(cfg)["bitrate"] == 48000
    rng = np.random.default_rng(0)
    voice = (rng.standard_normal(SR) * 9000).astype(np.int16)
    lo = str(tmp_path / "lo.mp3")
    hi = str(tmp_path / "hi.mp3")
    process_file({"v": (voice, SR)}, cfg, lo)
    cfg_hi = config_from_dict({**d, "bitrate": 256000})
    process_file({"v": (voice, SR)}, cfg_hi, hi)
    assert os.path.getsize(hi) > 1.5 * os.path.getsize(lo)


def test_decode_corrupt_files_fail_typed_never_crash(tmp_path):
    """Fuzz regression: truncated/bit-flipped FLACs through both the
    whole-file decode and the chunked StreamDecoder (open/seek/read/
    close) must raise typed errors (ValueError/RuntimeError/OSError)
    or decode leniently — never crash the process or leak odd
    exception types (the shim is C++; an OOB here is a segfault)."""
    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal(16000) * 8000).astype(np.int16)
    src = str(tmp_path / "t.flac")
    ff.encode(src, pcm, SR)
    data = open(src, "rb").read()
    bad = str(tmp_path / "bad.flac")
    for trial in range(24):
        b = bytearray(data)
        if trial % 3 == 0:
            b = b[: int(rng.integers(10, len(b)))]
        else:
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        open(bad, "wb").write(bytes(b))
        try:
            ff.decode(bad)
        except (ValueError, RuntimeError, OSError):
            pass
        try:
            h = ff.StreamDecoder(bad)
            try:
                h.read(1024)
                h.seek(200.0)
                h.read(4096)
            finally:
                h.close()
        except (ValueError, RuntimeError, OSError):
            pass


def test_encode_without_shim_raises_not_riff(tmp_path, monkeypatch):
    """With the shim unavailable, encoding a compressed extension must
    raise a typed error — the old silent WAV fallback wrote RIFF bytes
    into a .m4a that this library's own decoder then refused to read
    back (review find)."""
    import pytest

    from xmtpu.native import ffmpeg as _ff
    from xmtpu.io import encode_audio
    from xmtpu.utils.errors import XmtpuError

    monkeypatch.setattr(_ff, "available", lambda: False)
    p = str(tmp_path / "x.m4a")
    with pytest.raises(XmtpuError, match="shim unavailable"):
        encode_audio(p, _tone(0.3), SR)
    import os
    assert not os.path.exists(p)
