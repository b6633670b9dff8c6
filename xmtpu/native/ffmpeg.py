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
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
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
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.xm_ff_encode.restype = ctypes.c_int
        lib.xm_ff_free.argtypes = [ctypes.c_void_p]
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


def encode(path: str, pcm: np.ndarray, sample_rate: int) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("ffmpeg shim unavailable")
    pcm = np.ascontiguousarray(pcm, np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    rc = lib.xm_ff_encode(str(path).encode(), pcm.ctypes.data, pcm.shape[0],
                          pcm.shape[1], int(sample_rate))
    if rc != 0:
        raise ValueError(f"xm_ff_encode({path!r}) failed with code {rc}")


def register() -> bool:
    """Register decode/encode backends for compressed formats; returns
    whether the shim is active. Safe to call when unavailable."""
    if not available():
        return False
    from xmtpu.io.decoder import Decoder, register_backend
    from xmtpu.io.encoder import register_encoder

    def _dec(path: str, **kw) -> Decoder:
        pcm, sr = decode(path)
        return Decoder(pcm, sr)

    def _enc(path: str, pcm, sample_rate: int, **kw) -> None:
        encode(path, pcm, sample_rate)

    for ext in DECODE_EXTS:
        register_backend(ext, _dec)
    for ext in ENCODE_EXTS:
        register_encoder(ext, _enc)
    return True
