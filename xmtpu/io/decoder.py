"""Decoder interface: uniform handle-style access to audio files.

Reference analogue: ``audio_decoder_create / audio_decoder_seekTo /
audio_decoder_get_decoded_frame / audio_decoder_freep`` in
``src/codec/audio_decoder.c`` [upstream, SURVEY.md §2.1] — an opaque
handle that opens any supported file and yields PCM at a requested
rate/channel count, with seek.

Here the handle is a small Python class over pluggable backends:

* :class:`Decoder` over the WAV backend — always available (stdlib),
  the default test surface (this environment ships no ffmpeg binary).
* an optional FFmpeg-backed decoder can be registered via
  :func:`register_backend` when a native shim is present (built by
  ``xmtpu/native``); mp3/aac decode parity is untestable in this
  environment and explicitly out of the golden-test surface
  (SURVEY.md §7.3 "No ffmpeg in env").

Rate conversion is NOT done here — decode returns the file's native
rate; resampling is a device-side op (``xmtpu.ops.resample``). This is
the one deliberate API difference from the reference (which resampled
inside the decoder on the host): keeping decode "thin" is what lets the
whole DSP chain run fused on-chip (``BASELINE.json:5``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from xmtpu.io.wav import read_wav


class Decoder:
    """Handle-style PCM reader over a fully-decoded in-memory clip."""

    def __init__(self, pcm: np.ndarray, sample_rate: int):
        if pcm.ndim == 1:
            # freeze the BASE before taking the (n, 1) view: setflags on
            # the view alone left the caller's 1-d array writable, so
            # the guard below protected 2-d inputs but not 1-d ones
            # (review find)
            pcm.setflags(write=False)
            pcm = pcm[:, None]
        # read-only at the handle level (not per-backend): read()
        # returns VIEWS into this buffer, and a caller scratch-mutating
        # one silently corrupted all later reads when the native WAV
        # parser supplied a writable array (review find, verified
        # live) — and a mutated buffer already handed to a jax
        # dispatch hits the async host->device transfer race
        pcm.setflags(write=False)
        self._pcm = pcm
        self.sample_rate = int(sample_rate)
        self.num_channels = pcm.shape[1]
        self.num_samples = pcm.shape[0]
        self._pos = 0

    # -- reference-parity surface (create/seek/read/free style) --
    def seek(self, ms: float) -> None:
        self._pos = min(self.num_samples, max(0, int(round(ms * self.sample_rate / 1000.0))))

    def read(self, num_samples: int) -> np.ndarray:
        """Read up to num_samples frames; short read at EOF (empty at end)."""
        out = self._pcm[self._pos : self._pos + num_samples]
        self._pos += out.shape[0]
        return out

    def read_all(self) -> np.ndarray:
        return self._pcm

    @property
    def position_ms(self) -> float:
        return self._pos * 1000.0 / self.sample_rate

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _wav_backend(path: str, **kw) -> Decoder:
    pcm, sr = read_wav(path)
    return Decoder(pcm, sr)


def _raw_pcm_backend(path: str, sample_rate: int | None = None,
                     channels: int = 1, dtype="int16", **kw) -> Decoder:
    """Headerless PCM (reference: the raw-PCM reader in ``src/tools/``
    [upstream, SURVEY.md §2.1]); the caller supplies the format."""
    if sample_rate is None:
        raise ValueError("raw PCM needs sample_rate= (headerless format)")
    if int(sample_rate) < 1 or int(channels) < 1:
        # used to surface later as a bare ZeroDivisionError (review
        # find — elsewhere these inputs get parse-time typed errors)
        raise ValueError(
            f"raw PCM needs sample_rate >= 1 and channels >= 1, got "
            f"{sample_rate}/{channels}")
    data = np.fromfile(path, dtype=np.dtype(dtype))
    n = data.size // channels
    pcm = data[: n * channels].reshape(n, channels)
    if pcm.dtype != np.int16:
        from xmtpu.ops.convert import f32_to_pcm16_np

        # scale each source format to [-1, 1) floats FIRST —
        # f32_to_pcm16_np expects normalized floats, and full-scale
        # int32/uint8 values fed to it saturate every sample to
        # +/-32767 (round-2 review find)
        kind = pcm.dtype.kind
        if kind == "f":
            f = pcm.astype(np.float32)
        elif kind == "u":  # unsigned: remove midpoint offset
            span = float(np.iinfo(pcm.dtype).max) + 1.0
            f = (pcm.astype(np.float32) - span / 2.0) / (span / 2.0)
        elif kind == "i":
            f = pcm.astype(np.float32) / (float(np.iinfo(pcm.dtype).max) + 1.0)
        else:
            raise ValueError(f"unsupported raw PCM dtype: {dtype}")
        pcm = f32_to_pcm16_np(f)
    return Decoder(pcm, int(sample_rate))  # Decoder marks it read-only


_BACKENDS: dict[str, Callable[..., Decoder]] = {
    "wav": _wav_backend,
    "pcm": _raw_pcm_backend,
    "raw": _raw_pcm_backend,
}


def register_backend(extension: str, factory: Callable[..., Decoder]) -> None:
    """Register a decoder backend for a file extension (e.g. an FFmpeg shim)."""
    _BACKENDS[extension.lower().lstrip(".")] = factory


def open_audio(path, **kw) -> Decoder:
    """Open an audio file with the backend registered for its extension.

    Extra kwargs go to the backend (raw PCM needs ``sample_rate=``,
    optional ``channels=``, ``dtype=``)."""
    import os

    from xmtpu.utils.errors import DecodeError

    ext = os.path.splitext(os.path.basename(str(path)))[1].lstrip(".").lower()
    backend = _BACKENDS.get(ext)
    if backend is None:
        raise DecodeError(  # also a ValueError (utils/errors.py)
            f"no decoder backend for '.{ext}' (available: {sorted(_BACKENDS)}); "
            "WAV is always supported; register an FFmpeg shim for compressed formats"
        )
    return backend(str(path), **kw)
