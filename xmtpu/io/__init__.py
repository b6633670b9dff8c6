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

__all__ = [
    "read_wav", "write_wav", "open_audio", "Decoder", "register_backend",
    "encode_audio", "register_encoder",
]
