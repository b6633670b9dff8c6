"""WAV codec + decoder-handle tests (reference parity surface:
audio_decoder_create/seek/get_pcm per SURVEY.md §2.1)."""

import numpy as np
import pytest

from xmtpu.io import read_wav, write_wav, open_audio
from xmtpu.io.wav import wav_info


def test_wav_roundtrip_mono(tmp_path, rng):
    pcm = (rng.standard_normal(8000) * 8000).astype(np.int16)
    p = tmp_path / "m.wav"
    write_wav(p, pcm, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_array_equal(back[:, 0], pcm)


def test_wav_roundtrip_stereo(tmp_path, rng):
    pcm = (rng.standard_normal((8000, 2)) * 8000).astype(np.int16)
    p = tmp_path / "s.wav"
    write_wav(p, pcm, 44100)
    back, sr = read_wav(p)
    assert sr == 44100
    assert back.shape == (8000, 2)
    np.testing.assert_array_equal(back, pcm)


def test_wav_info(tmp_path, rng):
    pcm = (rng.standard_normal((123, 2)) * 100).astype(np.int16)
    p = tmp_path / "i.wav"
    write_wav(p, pcm, 48000)
    info = wav_info(p)
    assert (info.sample_rate, info.num_channels, info.num_samples,
            info.sample_width) == (48000, 2, 123, 2)


def test_decoder_handle_seek_read(tmp_path):
    sr = 16000
    pcm = np.arange(sr, dtype=np.int16)  # 1s ramp: sample value == index
    p = tmp_path / "d.wav"
    write_wav(p, pcm, sr)
    with open_audio(p) as d:
        assert d.sample_rate == sr and d.num_samples == sr
        a = d.read(100)
        np.testing.assert_array_equal(a[:, 0], np.arange(100))
        d.seek(500.0)  # 500 ms -> sample 8000
        b = d.read(10)
        np.testing.assert_array_equal(b[:, 0], np.arange(8000, 8010))
        d.seek(999.9)
        tail = d.read(1 << 20)  # short read at EOF
        assert tail.shape[0] == sr - int(round(0.9999 * sr))
        assert d.read(10).shape[0] == 0


def test_open_audio_unknown_extension(tmp_path):
    with pytest.raises(ValueError, match="no decoder backend"):
        open_audio(tmp_path / "x.xyzcodec")


def test_write_wav_rejects_float(tmp_path):
    with pytest.raises(TypeError):
        write_wav(tmp_path / "f.wav", np.zeros(10, np.float32), 16000)


def test_raw_pcm_int32_and_uint8_scaling(tmp_path, rng):
    """Raw-PCM dtypes other than int16 are scaled per-format, not fed
    full-scale into the [-1,1) converter (round-2 review find: int32
    saturated every sample)."""
    from xmtpu.io.decoder import open_audio

    x = np.clip(rng.standard_normal(1000) * 0.25, -0.9, 0.9).astype(
        np.float32)
    (tmp_path / "a.pcm").write_bytes(
        (x * (1 << 31)).astype(np.int32).tobytes())
    with open_audio(str(tmp_path / "a.pcm"), sample_rate=16000,
                    dtype="int32") as d:
        got = d.read_all()[:, 0].astype(np.float64) / 32768.0
    assert np.abs(got - x).max() < 2e-4  # int16 quantization only
    (tmp_path / "b.pcm").write_bytes(
        np.clip((x + 1.0) * 128.0, 0, 255).astype(np.uint8).tobytes())
    with open_audio(str(tmp_path / "b.pcm"), sample_rate=16000,
                    dtype="uint8") as d:
        got8 = d.read_all()[:, 0].astype(np.float64) / 32768.0
    assert np.abs(got8 - x).max() < 1e-2  # 8-bit quantization


def test_wav_info_float32_fallback(tmp_path, rng):
    """wav_info probes formats the stdlib parser rejects but read_wav
    decodes (float32 format tag 3)."""
    import struct
    from xmtpu.io.wav import wav_info, read_wav

    x = (rng.standard_normal(500) * 0.3).astype(np.float32)
    data = x.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000,
                                   16000 * 4, 4, 32)
           + b"data" + struct.pack("<I", len(data)))
    p = tmp_path / "f32.wav"
    p.write_bytes(hdr + data)
    try:
        read_wav(str(p))
    except Exception:
        import pytest
        pytest.skip("no float32-WAV decode backend in this env")
    info = wav_info(str(p))
    assert info.sample_rate == 16000 and info.num_samples == 500
    # sample_width is the ON-DISK width: the fallback used to report
    # the decoded itemsize (2), wrong exactly for the formats that take
    # this path (review find)
    assert info.sample_width == 4


def test_decoder_freezes_1d_input_base(rng):
    """The handle-level read-only guard must freeze the CALLER's array:
    for 1-d input it was set on the fresh (n, 1) view only, leaving the
    base writable (review find)."""
    import pytest
    from xmtpu.io.decoder import Decoder

    x = (rng.standard_normal(100) * 0.1).astype(np.float32)
    d = Decoder(x, 16000)
    with pytest.raises(ValueError):
        x[0] = 7.0
    y2 = (rng.standard_normal((100, 2)) * 0.1).astype(np.float32)
    Decoder(y2, 16000)
    with pytest.raises(ValueError):
        y2[0, 0] = 7.0


def test_truncated_wav_typed_errors(tmp_path, rng):
    """Fuzz find: truncating a WAV at arbitrary byte offsets must never
    leak an untyped EOFError/wave.Error/np.frombuffer ValueError — every
    failure surfaces as DecodeError (the batch runner's per-clip
    isolation contract), and an odd-byte cut inside the data chunk
    drops the partial frame instead of crashing."""
    from xmtpu.utils.errors import DecodeError

    full = tmp_path / "full.wav"
    write_wav(full, (rng.standard_normal(500) * 9000).astype(np.int16),
              16000)
    data = full.read_bytes()
    cut = tmp_path / "cut.wav"
    for k in (0, 3, 7, 11, 12, 20, 36, 43, 44, 45, 101, len(data) - 1):
        cut.write_bytes(data[:k])
        try:
            pcm, sr = read_wav(cut)
        except DecodeError:
            continue  # typed failure: fine
        # lenient parses (FFmpeg-style truncated data chunk) must still
        # be sane: whole int16 frames at the original rate
        assert sr == 16000 and pcm.dtype == np.int16 and pcm.ndim == 2


def test_open_audio_unknown_extension_is_decode_error(tmp_path):
    from xmtpu.utils.errors import DecodeError

    with pytest.raises(DecodeError, match="no decoder backend"):
        open_audio(tmp_path / "x.xyzcodec")


def test_wav_info_empty_file_raises_typed(tmp_path):
    """wave.open raises EOFError (not wave.Error) on an empty file —
    it used to bypass wav_info's decode fallback and leak the raw
    EOFError past the DecodeError contract (review find)."""
    import pytest

    from xmtpu.io.wav import wav_info
    from xmtpu.utils.errors import DecodeError

    p = tmp_path / "empty.wav"
    p.write_bytes(b"")
    with pytest.raises(DecodeError):
        wav_info(str(p))
