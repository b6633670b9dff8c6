"""Native C++ host-runtime tests: WAV codec, conversion, FIFO.

All native entry points must be bit-identical to their Python twins
(SURVEY.md §4.2 — int16<->f32 is the one place bit-equality is demanded;
WAV parse likewise since it defines the PCM byte contract).
"""

from __future__ import annotations

import wave

import numpy as np
import pytest

from xmtpu import native
from xmtpu.io import wav as wavio
from xmtpu.ops import convert

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def _stdlib_write(path, pcm, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(pcm.shape[1] if pcm.ndim > 1 else 1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.ascontiguousarray(pcm).astype("<i2").tobytes())


def test_wav_read_matches_stdlib(tmp_path, rng):
    pcm = (rng.standard_normal((4321, 2)) * 12000).astype(np.int16)
    p = tmp_path / "a.wav"
    _stdlib_write(p, pcm, 22050)
    got, sr = native.read_wav_native(str(p))
    assert sr == 22050
    np.testing.assert_array_equal(got, pcm)


def test_wav_write_matches_stdlib_read(tmp_path, rng):
    pcm = (rng.standard_normal((1000, 1)) * 9000).astype(np.int16)
    p = tmp_path / "b.wav"
    native.write_wav_native(str(p), pcm, 16000)
    with wave.open(str(p), "rb") as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        got = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_array_equal(got, pcm[:, 0])


def test_wav_float32_file(tmp_path, rng):
    """IEEE-float WAV decodes with the pinned rounding rule."""
    import struct

    x = (0.4 * rng.standard_normal(500)).astype(np.float32)
    data = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 48000, 48000 * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(data))
    p = tmp_path / "f.wav"
    p.write_bytes(hdr + data)
    got, sr = native.read_wav_native(str(p))
    assert sr == 48000
    np.testing.assert_array_equal(got[:, 0], convert.f32_to_pcm16_np(x))


def test_wav_reject_garbage(tmp_path):
    p = tmp_path / "g.wav"
    p.write_bytes(b"definitely not RIFF data")
    with pytest.raises(ValueError):
        native.read_wav_native(str(p))


def test_io_roundtrip_through_public_api(tmp_path, rng):
    """io.wav read/write (now native-backed) round-trips bit-exact."""
    pcm = (rng.standard_normal((2048, 2)) * 15000).astype(np.int16)
    p = tmp_path / "rt.wav"
    wavio.write_wav(str(p), pcm, 44100)
    got, sr = wavio.read_wav(str(p))
    assert sr == 44100
    np.testing.assert_array_equal(got, pcm)


def test_conversion_bit_exact(rng):
    i16 = rng.integers(-32768, 32768, size=10000).astype(np.int16)
    np.testing.assert_array_equal(
        native.i16_to_f32_native(i16), convert.pcm16_to_f32_np(i16)
    )
    f32 = (rng.standard_normal(10000) * 1.2).astype(np.float32)  # incl. clip
    np.testing.assert_array_equal(
        native.f32_to_i16_native(f32), convert.f32_to_pcm16_np(f32)
    )


def test_fifo_basic():
    f = native.Fifo(64)
    assert f.write(b"hello") == 5
    assert len(f) == 5
    assert f.read(3) == b"hel"
    assert f.read(10) == b"lo"
    assert len(f) == 0
    f.close()


def test_fifo_wraparound_and_capacity():
    f = native.Fifo(8)
    assert f.write(b"abcdef") == 6
    assert f.read(4) == b"abcd"
    assert f.write(b"ghijkl") == 6  # wraps
    assert f.read(8) == b"efghijkl"
    assert f.write(b"x" * 20) == 8  # capped at capacity
    assert f.space == 0
    f.close()


def test_fifo_threaded_stress():
    """SPSC stress: producer/consumer on threads, byte stream intact
    (SURVEY.md §5 race detection: the host ring buffer is the only
    concurrent structure)."""
    import threading

    f = native.Fifo(4096)
    total = 1_000_000
    src = np.random.default_rng(0).integers(0, 256, total).astype(np.uint8)
    out = bytearray()

    def producer():
        sent = 0
        while sent < total:
            sent += f.write(src[sent : sent + 1024].tobytes())

    def consumer():
        while len(out) < total:
            out.extend(f.read(1500))

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(); tc.join()
    assert bytes(out) == src.tobytes()
    f.close()


def test_pcm_channel_framed_stress():
    """PcmChannel (the batch runner's decode->dispatch stage link,
    SURVEY.md §2.2 PP) under load: random-size frames — including ones
    LARGER than the ring — arrive intact and in order."""
    import threading

    chan = native.PcmChannel(capacity=1 << 16)  # 64 KiB ring
    rng_ = np.random.default_rng(1)
    frames = []
    for i in range(60):
        n = int(rng_.integers(1, 60000))  # up to ~120 KiB > ring size
        frames.append([
            (rng_.standard_normal(n) * 1000).astype(np.int16),
            None if i % 3 == 0 else
            (rng_.standard_normal(n // 2 + 1) * 1000).astype(np.int16),
        ])

    def producer():
        try:
            for i, arrs in enumerate(frames):
                chan.put(arrs, i)
        finally:
            chan.close()

    got = []
    t = threading.Thread(target=producer)
    t.start()
    while (item := chan.get()) is not None:
        got.append(item)
    t.join()
    assert len(got) == len(frames)
    for (arrs, meta), i in zip(got, range(len(frames))):
        assert meta == i  # in order
        np.testing.assert_array_equal(arrs[0], frames[i][0])
        if frames[i][1] is None:
            assert arrs[1] is None
        else:
            np.testing.assert_array_equal(arrs[1], frames[i][1])


def _wav24_bytes(x: np.ndarray, sr: int) -> bytes:
    """Hand-rolled 24-bit PCM WAV from int32 sample values."""
    import struct

    b = bytearray()
    for v in x:
        b += int(v).to_bytes(3, "little", signed=True)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(b)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(b))
    return hdr + bytes(b)


def test_24bit_wav_native_and_stdlib_bit_exact(tmp_path, rng):
    """24-bit PCM WAV decodes in BOTH parsers with the identical
    top-16-bits truncation convention (bit-exact cross-check); the
    edge values exercise sign extension of bit 23."""
    n = 2000
    x = np.clip(rng.standard_normal(n) * 2e6, -8e6, 8e6).astype(np.int32)
    x[:4] = [-(1 << 23), (1 << 23) - 1, -1, 1]  # sign-extension edges
    p = tmp_path / "x24.wav"
    p.write_bytes(_wav24_bytes(x, 16000))
    ref = (x >> 8).astype(np.int16)

    # public path (native parser when built)
    pcm, sr = wavio.read_wav(str(p))
    assert sr == 16000 and pcm.shape == (n, 1) and pcm.dtype == np.int16
    np.testing.assert_array_equal(pcm[:, 0], ref)

    # stdlib path, explicitly
    pcm_std, sr_std = wavio._read_wav_stdlib(str(p))
    np.testing.assert_array_equal(pcm_std[:, 0], ref)

    # native path, explicitly (skip if no toolchain)
    if native.available():
        pcm_nat, sr_nat = native.read_wav_native(str(p))
        np.testing.assert_array_equal(pcm_nat, pcm_std)


def test_fifo_zero_capacity_raises():
    """xm_fifo_create returns nullptr for capacity < 1; the wrapper
    must raise instead of letting the first write segfault (review
    find — the check xm_native.cpp's comment promises)."""
    from xmtpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError, match="xm_fifo_create"):
        native.Fifo(0)


def test_pcm_channel_closed_mid_frame_raises_not_hangs():
    """A producer that dies between publishing a frame's meta and its
    payload (then close()) must surface a RuntimeError at get(), not
    hang the consumer forever (review find)."""
    from xmtpu.native import PcmChannel

    ch = PcmChannel(capacity=1 << 10)
    # publish meta for a frame whose payload never arrives
    ch._meta.put(([("<i2", (4,))], "meta"))
    ch.close()
    with pytest.raises(RuntimeError, match="mid-frame"):
        ch.get()


def test_pcm_channel_close_after_final_write_not_midframe():
    """close() happens-after the producer's final write: a consumer
    whose EMPTY read races the close must re-drain and find the
    completed frame, not raise 'closed mid-frame' (TOCTOU review
    find). The race is forced deterministically: the first ring read
    is made to return 0 while _closed is already set — pre-fix code
    raises on that exact interleaving."""
    import types

    from xmtpu import native
    from xmtpu.native import PcmChannel

    if native.load() is None:
        pytest.skip("native library unavailable")
    ch = PcmChannel(capacity=1 << 12)
    x = (np.arange(512) % 251).astype(np.int16)
    ch.put([x], "m")
    ch.close()

    real = ch._fifo

    class _FlakyLib:
        def __init__(self, lib):
            self._lib = lib
            self.zero_reads = 1  # first read sees an 'empty' ring

        def xm_fifo_read(self, h, ptr, n):
            if self.zero_reads:
                self.zero_reads -= 1
                return 0
            return self._lib.xm_fifo_read(h, ptr, n)

        def __getattr__(self, k):
            return getattr(self._lib, k)

    ch._fifo = types.SimpleNamespace(_lib=_FlakyLib(real._lib), _h=real._h)
    arrays, meta = ch.get()
    np.testing.assert_array_equal(arrays[0], x)
    ch._fifo = real
    assert ch.get() is None  # closed + empty -> clean end-of-stream


def test_pcm_channel_fallback_deque_backpressure():
    """The pure-Python fallback must bound queued bytes like the native
    ring: it used to grow without limit, so a big manifest decoded
    entirely into RAM ahead of the consumer (review find)."""
    import threading

    from xmtpu.native import PcmChannel

    ch = PcmChannel(capacity=4096)
    ch._fifo = None  # force the fallback path
    ch._deque = []
    frame = np.zeros(1024, np.int16)  # 2 KiB each
    ch.put([frame], 0)
    ch.put([frame], 1)  # 4 KiB queued = at capacity
    blocked = threading.Event()

    def put_third():
        ch.put([frame], 2)  # must wait for the consumer
        blocked.set()

    t = threading.Thread(target=put_third, daemon=True)
    t.start()
    assert not blocked.wait(0.5)  # producer is backpressured
    assert ch.get() is not None  # consumer drains one frame
    assert blocked.wait(5)  # producer proceeds
    t.join(5)
    assert len(ch._deque) <= 2


def test_pcm_channel_put_after_close_raises_when_full():
    """put() on a full ring used to spin forever even after close()
    (review find)."""
    from xmtpu import native
    from xmtpu.native import PcmChannel

    if native.load() is None:
        pytest.skip("native library unavailable")
    ch = PcmChannel(capacity=1 << 10)  # 1 KiB ring, no consumer
    big = np.zeros(4096, np.int16)  # 8 KiB frame: exceeds the ring
    ch.close()
    with pytest.raises(RuntimeError, match="closed while writing"):
        ch.put([big], "m")
