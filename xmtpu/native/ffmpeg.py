"""FFmpeg shim loader: compressed-audio decode/encode via ctypes.

Reference analogue: the FFmpeg decoder/encoder front end
(``src/codec/`` [upstream, SURVEY.md §2.1]). Built lazily against the
system libav* (present in this image as shared libs + headers); when
the toolchain or libraries are missing everything degrades to the
WAV-only registries with the same interfaces (SURVEY.md §2.3).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("xmtpu.native.ffmpeg")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "xm_ffmpeg.cpp")
_SO = os.path.join(_HERE, "_libxmff.so")
_lock = threading.Lock()
_lib = None
_tried = False

DECODE_EXTS = ("mp3", "aac", "m4a", "mp4", "ogg", "opus", "flac", "wma", "ac3")
ENCODE_EXTS = ("mp3", "aac", "m4a", "ogg", "flac")


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-I/usr/include/x86_64-linux-gnu", "-o", _SO, _SRC,
        "-lavformat", "-lavcodec", "-lavutil", "-lswresample",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:
        log.info("ffmpeg shim build unavailable (%s)", e)
        return False


def load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_m = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0.0
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_m:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # stale/foreign-ABI .so (e.g. built against another image's
            # libav): rebuild in place and retry once
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_SO)
            except OSError as e:
                log.info("ffmpeg shim load failed after rebuild (%s)", e)
                return None
        lib.xm_ff_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.xm_ff_decode.restype = ctypes.c_int
        lib.xm_ff_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.xm_ff_encode.restype = ctypes.c_int
        lib.xm_ff_free.argtypes = [ctypes.c_void_p]
        lib.xm_ff_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.xm_ff_open.restype = ctypes.c_void_p
        lib.xm_ff_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64
        ]
        lib.xm_ff_read.restype = ctypes.c_int64
        lib.xm_ff_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.xm_ff_seek.restype = ctypes.c_int
        lib.xm_ff_buffered.argtypes = [ctypes.c_void_p]
        lib.xm_ff_buffered.restype = ctypes.c_int64
        lib.xm_ff_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def decode(path: str):
    """-> (int16 (n, ch), native_sample_rate). Raises on failure."""
    lib = load()
    if lib is None:
        raise RuntimeError("ffmpeg shim unavailable")
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.xm_ff_decode(str(path).encode(), ctypes.byref(out),
                          ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"xm_ff_decode({path!r}) failed with code {rc}")
    try:
        pcm = np.ctypeslib.as_array(out, shape=(n.value * ch.value,)).copy()
    finally:
        lib.xm_ff_free(out)
    return pcm.reshape(n.value, ch.value), int(sr.value)


def encode(path: str, pcm: np.ndarray, sample_rate: int,
           bitrate: int | None = None) -> None:
    """Encode PCM to ``path`` (codec from the extension). ``bitrate``
    in bits/s (e.g. 64000, 192000); None = the codec default
    (128 kb/s). Lossless codecs (FLAC) ignore it. Reference parity:
    the upstream encoder's bitrate knob (SURVEY.md §2.1 encoder row)."""
    lib = load()
    if lib is None:
        raise RuntimeError("ffmpeg shim unavailable")
    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16:
        if pcm.dtype.kind == "f":
            # normalized floats convert via the pinned rounding rule —
            # a raw int16 cast truncates [-1,1] floats to 0 and writes
            # a silent file (round-2 review find)
            from xmtpu.ops.convert import f32_to_pcm16_np

            pcm = f32_to_pcm16_np(pcm.astype(np.float32))
        else:
            raise TypeError(
                f"encode() needs int16 or normalized float PCM, got "
                f"{pcm.dtype}")
    pcm = np.ascontiguousarray(pcm, np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    rc = lib.xm_ff_encode(str(path).encode(), pcm.ctypes.data, pcm.shape[0],
                          pcm.shape[1], int(sample_rate),
                          int(bitrate) if bitrate else 0)
    if rc != 0:
        raise ValueError(f"xm_ff_encode({path!r}) failed with code {rc}")


class StreamDecoder:
    """Handle-style chunked decoder over ``xm_ff_open/seek/read/close``
    (reference parity: ``audio_decoder_create/seekTo/get_decoded_frame/
    freep`` [upstream, SURVEY.md §2.1]). Constant memory: an hour-long
    m4a costs one packet + one frame + a small PCM buffer — contrast
    :func:`decode`, which materializes the whole file.

    Implements the :class:`xmtpu.io.decoder.Decoder` surface (seek in
    ms, read(n), read_all, position_ms) plus sample-level ``seek_sample``
    and a ``max_buffered`` high-water mark for constant-memory asserts.
    """

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("ffmpeg shim unavailable")
        self._lib = lib
        ch = ctypes.c_int32()
        sr = ctypes.c_int32()
        dur = ctypes.c_int64()
        self._h = lib.xm_ff_open(str(path).encode(), ctypes.byref(ch),
                                 ctypes.byref(sr), ctypes.byref(dur))
        if not self._h:
            raise ValueError(f"xm_ff_open({path!r}) failed")
        self.num_channels = int(ch.value)
        self.sample_rate = int(sr.value)
        self.num_samples = int(dur.value)  # best-effort; -1 unknown
        self.max_buffered = 0
        self._pos = 0

    def seek_sample(self, sample: int) -> None:
        if self._lib.xm_ff_seek(self._h, int(sample)) != 0:
            raise ValueError(f"seek to sample {sample} failed")
        self._pos = int(sample)

    def seek(self, ms: float) -> None:
        self.seek_sample(int(round(ms * self.sample_rate / 1000.0)))

    def read(self, num_samples: int) -> np.ndarray:
        """Up to num_samples frames as int16 (n, ch); empty at EOF."""
        out = np.empty((int(num_samples), self.num_channels), np.int16)
        got = int(self._lib.xm_ff_read(self._h, out.ctypes.data,
                                       int(num_samples)))
        if got < 0:
            raise ValueError("xm_ff_read failed")
        self._pos += got
        self.max_buffered = max(
            self.max_buffered, int(self._lib.xm_ff_buffered(self._h)))
        return out[:got]

    def read_all(self) -> np.ndarray:
        """The WHOLE clip, independent of the read position — matching
        io.decoder.Decoder.read_all (round-2 review find: this used to
        drain from the current position, so behavior silently differed
        by container type). The position is restored afterwards."""
        pos = self._pos
        self.seek(0.0)
        chunks = []
        while True:
            c = self.read(1 << 18)
            if not len(c):
                break
            chunks.append(c)
        self.seek_sample(pos)  # exact, no ms round-trip
        return np.concatenate(chunks) if chunks else \
            np.empty((0, self.num_channels), np.int16)

    @property
    def position_ms(self) -> float:
        return self._pos * 1000.0 / self.sample_rate

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.xm_ff_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def register() -> bool:
    """Register LAZY decode/encode backends for compressed formats.

    The g++ shim build (up to 180 s) happens on FIRST compressed-format
    open/encode, not at `import xmtpu` (round-2 review find: the eager
    available() probe compiled the shim at import time even for
    WAV-only workloads, and re-ran a failing build in every process on
    toolchain-broken machines). Returns a CHEAP availability estimate
    (prebuilt shim .so present, or libav libraries findable — no
    build): an unconditional True made io.HAVE_FFMPEG useless as a
    gate, so libav-less machines took the compressed path and failed
    instead of skipping (review find). A True can still turn out
    unusable if the shim build itself fails; use raises then.
    """
    from xmtpu.io.decoder import register_backend
    from xmtpu.io.encoder import register_encoder

    def _dec(path: str, **kw) -> StreamDecoder:
        if not available():
            raise RuntimeError(
                f"ffmpeg shim unavailable (cannot decode {path!r})")
        return StreamDecoder(path)

    def _enc(path: str, pcm, sample_rate: int, **kw) -> None:
        if not available():
            # no silent WAV fallback: writing RIFF bytes under a
            # compressed extension produced a file this library's own
            # decoder then REFUSED to read back, and downstream AAC/MP3
            # consumers reject (review find — the same asymmetry the
            # round-2 process_file RIFF fix targeted; decode raises,
            # encode must too). Users who want WAV can name the file
            # .wav and hit the WAV encoder directly.
            from xmtpu.utils.errors import XmtpuError

            raise XmtpuError(
                f"ffmpeg shim unavailable: cannot encode {path!r}; "
                "use a .wav output path on this machine")
        encode(path, pcm, sample_rate, bitrate=kw.get("bitrate"))

    for ext in DECODE_EXTS:
        register_backend(ext, _dec)
    for ext in ENCODE_EXTS:
        register_encoder(ext, _enc)
    if os.path.exists(_SO):
        return True
    import ctypes.util

    return ctypes.util.find_library("avcodec") is not None
