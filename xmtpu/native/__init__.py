"""Native host runtime (C++, ctypes-loaded) with pure-Python fallback.

Reference analogue: the upstream's C host layer — codec front end,
short<->float conversion, FIFO (``src/codec/``, ``src/tools/conversion``,
``src/tools/fifo.c`` [upstream, SURVEY.md §2.1]). Compiled lazily with
g++ on first use (no pybind11 in this environment — plain C ABI via
ctypes); every entry point has a Python twin so the package works
without a toolchain (SURVEY.md §2 "C++ optional, pure-Python fallback").
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("xmtpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "xm_native.cpp")
_SO = os.path.join(_HERE, "_libxmtpu.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.info("native build unavailable (%s); using Python fallback", e)
        return False


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # a prebuilt .so with no source alongside (trimmed deploy) must
        # not crash the availability probe (review find)
        src_m = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0.0
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_m:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.info("native load failed (%s); using Python fallback", e)
            return None
        lib.xm_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.xm_wav_read.restype = ctypes.c_int
        lib.xm_wav_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.xm_wav_write.restype = ctypes.c_int
        lib.xm_free.argtypes = [ctypes.c_void_p]
        for name in ("xm_i16_to_f32", "xm_f32_to_i16"):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64
            ]
        lib.xm_fifo_create.argtypes = [ctypes.c_int64]
        lib.xm_fifo_create.restype = ctypes.c_void_p
        lib.xm_fifo_free.argtypes = [ctypes.c_void_p]
        for name in ("xm_fifo_size", "xm_fifo_space"):
            getattr(lib, name).argtypes = [ctypes.c_void_p]
            getattr(lib, name).restype = ctypes.c_int64
        for name in ("xm_fifo_write", "xm_fifo_read"):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64
            ]
            getattr(lib, name).restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# WAV codec
# ---------------------------------------------------------------------------


def read_wav_native(path: str):
    """-> (int16 (n, ch), sample_rate). Raises on failure."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_int16)()
    n = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.xm_wav_read(path.encode(), ctypes.byref(out), ctypes.byref(n),
                         ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"xm_wav_read({path!r}) failed with code {rc}")
    try:
        total = n.value * ch.value
        pcm = np.ctypeslib.as_array(out, shape=(total,)).copy()
    finally:
        lib.xm_free(out)
    return pcm.reshape(n.value, ch.value), int(sr.value)


def write_wav_native(path: str, pcm: np.ndarray, sample_rate: int) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pcm = np.ascontiguousarray(pcm, np.int16)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    rc = lib.xm_wav_write(path.encode(), pcm.ctypes.data, pcm.shape[0],
                          pcm.shape[1], int(sample_rate))
    if rc != 0:
        raise ValueError(f"xm_wav_write({path!r}) failed with code {rc}")


# ---------------------------------------------------------------------------
# Conversion twins (host-side; the device twins live in ops.convert)
# ---------------------------------------------------------------------------


def i16_to_f32_native(x: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.int16)
    out = np.empty(x.shape, np.float32)
    lib.xm_i16_to_f32(x.ctypes.data, out.ctypes.data, x.size)
    return out


def f32_to_i16_native(x: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.int16)
    lib.xm_f32_to_i16(x.ctypes.data, out.ctypes.data, x.size)
    return out


# ---------------------------------------------------------------------------
# FIFO (SPSC ring buffer; streaming feeder's host buffer)
# ---------------------------------------------------------------------------


class Fifo:
    """Byte ring buffer backed by the native SPSC implementation."""

    def __init__(self, capacity: int):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.xm_fifo_create(int(capacity))
        if not self._h:
            # the C side returns nullptr for capacity < 1 or OOM; the
            # first write/read would dereference it and segfault the
            # process (review find — the check xm_native.cpp's comment
            # promises lives here)
            raise ValueError(
                f"xm_fifo_create failed (capacity {capacity})")
        self.capacity = int(capacity)

    def write(self, data: bytes | np.ndarray) -> int:
        buf = np.frombuffer(data, np.uint8) if isinstance(data, bytes) else \
            np.ascontiguousarray(data).view(np.uint8).reshape(-1)
        return int(self._lib.xm_fifo_write(self._h, buf.ctypes.data, buf.size))

    def read(self, n: int) -> bytes:
        out = np.empty(n, np.uint8)
        got = int(self._lib.xm_fifo_read(self._h, out.ctypes.data, n))
        return out[:got].tobytes()

    def __len__(self) -> int:
        return int(self._lib.xm_fifo_size(self._h))

    @property
    def space(self) -> int:
        return int(self._lib.xm_fifo_space(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.xm_fifo_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PcmChannel:
    """Blocking, framed SPSC channel: ONE producer thread streams numpy
    arrays to ONE consumer thread through the native lock-free
    :class:`Fifo` (the reference's inter-stage ring buffer,
    ``src/tools/fifo.c`` [upstream, SURVEY.md §2.1]); a condition
    variable adds the blocking discipline on top of the lock-free ring
    (SURVEY.md §5 "host ring buffer ... guard with a lock").

    Used by the batch runner's decode->device pipeline stage (SURVEY.md
    §2.2 PP row). Frames may exceed the ring capacity: the producer
    streams a frame in pieces while the consumer drains it (meta is
    published first, so both sides loop concurrently — no deadlock).
    Falls back to a plain deque when the native library is unavailable.
    """

    def __init__(self, capacity: int = 64 << 20):
        import queue

        self._meta = queue.Queue()
        self._cv = threading.Condition()
        self._closed = False
        self._capacity = int(capacity)
        self._qbytes = 0  # fallback-path backpressure accounting
        try:
            self._fifo = Fifo(int(capacity))
        except Exception:
            self._fifo = None  # pure-Python fallback
            self._deque = []

    def put(self, arrays, meta) -> None:
        """Producer side: enqueue a frame (list of ndarrays / None)."""
        descs, conts = [], []
        for a in arrays:
            if a is None:
                descs.append(None)
                conts.append(None)
            else:
                a = np.ascontiguousarray(a)  # once; reused by the
                # write pass below (a second pass used to re-copy
                # every non-contiguous frame — review find)
                descs.append((a.dtype.str, a.shape))
                conts.append(a)
        self._meta.put((descs, meta))
        if self._fifo is None:
            frame = [None if a is None else a.copy() for a in conts]
            nbytes = sum(a.nbytes for a in frame if a is not None)
            with self._cv:
                # bounded like the native ring: the fallback deque used
                # to grow without limit, so a large manifest decoded
                # entirely into RAM ahead of the consumer (review
                # find). A single frame larger than the capacity is
                # admitted alone (queue-empty) rather than deadlocking.
                while (self._qbytes > 0
                       and self._qbytes + nbytes > self._capacity
                       and not self._closed):
                    self._cv.wait(timeout=0.1)
                self._deque.append(frame)
                self._qbytes += nbytes
                self._cv.notify_all()
            return
        for a in conts:
            if a is None:
                continue
            buf = a.view(np.uint8).reshape(-1)
            off = 0
            while off < buf.size:
                wrote = int(self._fifo._lib.xm_fifo_write(
                    self._fifo._h, buf.ctypes.data + off, buf.size - off
                ))
                if wrote > 0:
                    off += wrote
                    with self._cv:
                        self._cv.notify_all()
                else:  # ring full: wait for the consumer to drain
                    with self._cv:
                        if self._closed:
                            # a closed channel's consumer will never
                            # drain — spinning here hung the producer
                            # forever (review find)
                            raise RuntimeError(
                                "PcmChannel closed while writing")
                        self._cv.wait(timeout=0.1)

    def get(self):
        """Consumer side: -> (arrays, meta), or None when closed+empty.
        Blocks until a whole frame is available."""
        import queue

        while True:
            try:
                descs, meta = self._meta.get(timeout=0.1)
                break
            except queue.Empty:
                if self._closed and self._meta.empty():
                    return None
        if self._fifo is None:
            with self._cv:
                while not self._deque:
                    if self._closed:
                        raise RuntimeError(
                            "PcmChannel closed mid-frame (producer "
                            "died between meta and payload)")
                    self._cv.wait(timeout=0.1)
                frame = self._deque.pop(0)
                self._qbytes -= sum(a.nbytes for a in frame
                                    if a is not None)
                self._cv.notify_all()  # wake a backpressured producer
                return frame, meta
        arrays = []
        for d in descs:
            if d is None:
                arrays.append(None)
                continue
            dtype, shape = d
            out = np.empty(int(np.prod(shape)) * np.dtype(dtype).itemsize,
                           np.uint8)
            off = 0
            while off < out.size:
                got = int(self._fifo._lib.xm_fifo_read(
                    self._fifo._h, out.ctypes.data + off, out.size - off
                ))
                if got > 0:
                    off += got
                    with self._cv:
                        self._cv.notify_all()
                    continue
                with self._cv:
                    if not self._closed:
                        self._cv.wait(timeout=0.1)
                        continue
                # closed — but close() happens-AFTER the producer's
                # final write, so the frame's bytes may have landed
                # between our empty read and the flag check (TOCTOU: a
                # complete frame used to raise 'closed mid-frame' and
                # kill the batch intermittently; review find). Drain
                # once more; only a STILL-empty ring is a dead frame.
                got = int(self._fifo._lib.xm_fifo_read(
                    self._fifo._h, out.ctypes.data + off, out.size - off
                ))
                if got > 0:
                    off += got
                    continue
                # closed + empty = no more writes can ever arrive; an
                # incomplete frame must surface, not hang the consumer
                raise RuntimeError(
                    "PcmChannel closed mid-frame "
                    f"({off}/{out.size} bytes)")
            arrays.append(out.view(dtype).reshape(shape))
        return arrays, meta

    def close(self) -> None:
        self._closed = True
        with self._cv:
            self._cv.notify_all()
