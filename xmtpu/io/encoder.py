"""Encoder interface: PCM -> audio file, pluggable backends.

Reference analogue: ``audio_encoder_*`` + muxer (``src/codec/
audio_encoder.c``, ``src/codec/ffmpeg_utils.c`` [upstream, SURVEY.md
§2.1]) — encode processed PCM to AAC/M4A. This environment has no
FFmpeg and no HW codec, so WAV is the always-on backend and compressed
formats are a registration point (SURVEY.md §2.3: "optional FFmpeg
shim behind an interface") — the documented exclusion of §7.5.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from xmtpu.io.wav import write_wav


def _wav_encode(path: str, pcm: np.ndarray, sample_rate: int, **kw) -> None:
    write_wav(path, pcm, sample_rate)


_BACKENDS: dict[str, Callable] = {"wav": _wav_encode}


def register_encoder(extension: str, factory: Callable) -> None:
    """Register an encoder backend (e.g. an FFmpeg AAC shim)."""
    _BACKENDS[extension.lower().lstrip(".")] = factory


def encode_audio(path, pcm: np.ndarray, sample_rate: int, **kw) -> str:
    """Encode int16 PCM to ``path``; format chosen by extension."""
    import os

    ext = os.path.splitext(os.path.basename(str(path)))[1].lstrip(".").lower()
    backend = _BACKENDS.get(ext)
    if backend is None:
        from xmtpu.utils.errors import ConfigError

        # typed like the decode-side mirror failure (DecodeError):
        # services catching XmtpuError used to miss this one (review
        # find). ConfigError is also a plain Exception subclass via
        # XmtpuError, so broad callers keep working.
        raise ConfigError(
            f"no encoder backend for '.{ext}' (available: {sorted(_BACKENDS)}); "
            "WAV is always supported; register an FFmpeg shim for AAC/M4A"
        )
    backend(str(path), pcm, int(sample_rate), **kw)
    return str(path)
