"""Host-side I/O front end (layer N0 in SURVEY.md §1.2).

Decode audio files to raw numpy PCM and encode back. The reference does
this with an FFmpeg-based decoder/encoder (``src/codec/audio_decoder.c``
etc. [upstream, SURVEY.md §2.1]); here the always-available path is a
stdlib WAV/PCM codec (this environment has no ffmpeg binary), with an
optional native shim behind the same interface.
"""

from xmtpu.io.wav import read_wav, write_wav
from xmtpu.io.decoder import open_audio, Decoder, register_backend
from xmtpu.io.encoder import encode_audio, register_encoder

# Compressed formats via the native FFmpeg shim (mp3/aac/m4a/ogg/...
# decode, aac/mp3/... encode). Registration is LAZY: the g++ shim build
# happens on first compressed-format use, not at import. HAVE_FFMPEG
# means "backends registered"; probe xmtpu.native.ffmpeg.available()
# for a hard availability check (encode falls back to WAV bytes when
# the shim cannot build; decode raises).
try:  # pragma: no cover - environment-dependent
    from xmtpu.native import ffmpeg as _ff

    HAVE_FFMPEG = _ff.register()
except Exception:  # noqa: BLE001
    HAVE_FFMPEG = False

__all__ = [
    "read_wav", "write_wav", "open_audio", "Decoder", "register_backend",
    "encode_audio", "register_encoder",
]
