"""Stdlib WAV codec: file -> int16 numpy PCM and back.

Reference analogue: the WAV/PCM branch of the FFmpeg decoder plus the
raw-PCM reader (``src/codec/audio_decoder.c``, ``src/tools/util.c``
[upstream, SURVEY.md §2.1 — snapshot is a stub]). PCM layout convention
throughout xmtpu: ``(num_samples, num_channels)`` int16, C-order
(i.e. interleaved on disk, deinterleaved in memory).

Supported: 16-bit PCM WAV read/write (the framework's native format),
plus 8-bit unsigned and 32-bit PCM read (converted to int16).
"""

from __future__ import annotations

import wave
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class WavInfo:
    sample_rate: int
    num_channels: int
    num_samples: int
    sample_width: int  # bytes per sample on disk


def _native():
    """Native C++ codec when built (xmtpu/native, ctypes); else None."""
    try:
        from xmtpu import native as _n

        return _n if _n.available() else None
    except Exception:
        return None


def read_wav(path) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (int16 array of shape (n, channels), sample_rate).

    Uses the native C++ parser when available (bit-identical to the
    stdlib path for 16-bit PCM — asserted in tests), falling back to
    stdlib ``wave`` for exotic widths or when no toolchain exists.
    """
    n = _native()
    if n is not None:
        try:
            return n.read_wav_native(str(path))
        except ValueError:
            pass  # exotic width / malformed per native parser: stdlib decides
    try:
        return _read_wav_stdlib(path)
    except Exception as e:
        # exotic encodings (24-bit, a-law, ...): the FFmpeg shim decodes
        # them when present; surface a typed DecodeError otherwise (the
        # batch runner's per-clip isolation contract, utils/errors.py —
        # raw EOFError/wave.Error/frombuffer ValueErrors used to leak)
        try:
            from xmtpu.native import ffmpeg as _ff

            if _ff.available():
                return _ff.decode(str(path))
        except Exception:
            pass
        from xmtpu.utils.errors import DecodeError

        raise DecodeError(
            f"cannot decode WAV {path}: {type(e).__name__}: {e}") from e


def _read_wav_stdlib(path) -> tuple[np.ndarray, int]:
    with wave.open(str(path), "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    frame = width * nch
    if frame > 0 and len(raw) % frame:
        # truncated final frame (cut-off file): drop the partial frame,
        # matching FFmpeg's lenient handling, instead of crashing in
        # np.frombuffer ("buffer size must be a multiple of element
        # size" — fuzz find)
        raw = raw[: len(raw) - (len(raw) % frame)]
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        # 8-bit WAV is unsigned; recenter and scale to int16
        pcm = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif width == 3:
        # 24-bit PCM: little-endian 3-byte signed -> top 16 bits
        # (truncation, identical to the native C++ parser — tested)
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = (v ^ 0x800000) - 0x800000  # sign-extend bit 23
        pcm = (v >> 8).astype(np.int16)
    elif width == 4:
        pcm = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
    else:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    pcm = pcm.astype(np.int16, copy=False).reshape(-1, nch)
    return pcm, sr


def write_wav(path, pcm: np.ndarray, sample_rate: int) -> None:
    """Write an int16 array of shape (n,) or (n, channels) as 16-bit PCM WAV."""
    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16:
        raise TypeError(f"write_wav expects int16 PCM, got {pcm.dtype}")
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n = _native()
    if n is not None:
        n.write_wav_native(str(path), pcm, int(sample_rate))
        return
    with wave.open(str(path), "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.ascontiguousarray(pcm).astype("<i2").tobytes())


def wav_info(path) -> WavInfo:
    try:
        with wave.open(str(path), "rb") as w:
            return WavInfo(
                sample_rate=w.getframerate(),
                num_channels=w.getnchannels(),
                num_samples=w.getnframes(),
                sample_width=w.getsampwidth(),
            )
    except (wave.Error, EOFError):
        # formats the stdlib parser rejects but read_wav decodes
        # (float32 format-tag 3, a-law, ... via the native/FFmpeg
        # fallbacks) — probe by decoding (round-2 review find: callers
        # probing with wav_info wrongly concluded the file unreadable).
        # EOFError: wave.open raises it (not wave.Error) on empty/
        # truncated headers — it bypassed this fallback, leaking an
        # untyped error past the DecodeError contract (review find)
        pcm, sr = read_wav(path)
        pcm = np.asarray(pcm)
        ch = 1 if pcm.ndim == 1 else pcm.shape[1]
        # sample_width is the ON-DISK bytes per sample: the decoded
        # itemsize is always 2 (int16), which misreported exactly the
        # formats that take this fallback (float32 -> 4; review find)
        bits = _fmt_chunk_bits(path)
        return WavInfo(sample_rate=sr, num_channels=ch,
                       num_samples=pcm.shape[0],
                       sample_width=(bits // 8) if bits
                       else pcm.dtype.itemsize)


def _fmt_chunk_bits(path) -> int | None:
    """bits-per-sample straight from the RIFF fmt chunk; None when the
    header is not parseable (non-RIFF input decoded by a backend)."""
    try:
        with open(path, "rb") as f:
            hdr = f.read(12)
            if len(hdr) < 12 or hdr[:4] != b"RIFF" or hdr[8:12] != b"WAVE":
                return None
            while True:
                ck = f.read(8)
                if len(ck) < 8:
                    return None
                sz = int.from_bytes(ck[4:8], "little")
                if ck[:4] == b"fmt ":
                    body = f.read(min(sz, 40))
                    if len(body) >= 16:
                        bits = int.from_bytes(body[14:16], "little")
                        return bits or None
                    return None
                f.seek(sz + (sz & 1), 1)
    except OSError:
        return None
