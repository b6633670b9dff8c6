"""xmtpu — TPU-native audio preprocessing framework.

A ground-up rebuild of the capabilities of ``sunyuchuan/xm-audio-utils``
(an Android/iOS C audio-processing library: FFmpeg decode -> polyphase
resample -> multi-track mix with gain/fades -> EQ/reverb/limiter effects
-> encode; see /root/reference/README.md:1 for the mounted stub and
SURVEY.md for the full capability map) as an idiomatic JAX/XLA/Pallas
framework:

* host-side I/O front end (WAV/PCM always; FFmpeg optional) -> numpy PCM
* all DSP on-device: polyphase-FIR resampling, fused mix+fade+gain,
  biquad EQ as associative scans, FIR reverb via FFT overlap-save,
  soft-knee limiting — batched over clips, blocked over time
* offline (whole-clip / 256-clip batch) and streaming (20 ms frames)
  execution modes with identical math
* scaling via ``jax.sharding`` over a device mesh (batch-parallel clips,
  sequence-parallel blocks), not translated C loops.

Reference analogue of this module: the public header ``xm_audio_utils.h``
[upstream, not in snapshot] — the single import a user needs.
"""

import os as _os

from xmtpu._cachedir import host_cache_dir as _host_cache_dir

# Persistent XLA compilation cache, keyed by a host fingerprint — a
# cache written by a different host loads with only a warning and then
# computes WRONG numerics (see _cachedir.py). setdefault: an explicit
# JAX_COMPILATION_CACHE_DIR in the environment wins. Must run before
# the first jax import.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _host_cache_dir())

import jax as _jax  # noqa: E402

if _jax.config.jax_compilation_cache_dir is None:
    # jax was imported before xmtpu, so the env default above was too
    # late — apply it through the live config instead (None = the user
    # set nothing themselves; an explicit user setting wins).
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])

# IIR filter-state scans use float64 state for accuracy (SURVEY.md §7.4②:
# f32 scan floors at -77 dB vs oracle; f64 reaches -152 dB at negligible
# cost). All xmtpu ops pass explicit dtypes, so enabling x64 here does not
# change the dtype of any f32 compute path.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from xmtpu.api import (  # noqa: E402
    resample,
    mix,
    effects,
    process_file,
    Session,
    SessionPool,
)
from xmtpu.graph.serve import PoolServer  # noqa: E402
from xmtpu import io  # noqa: E402  (xmtpu.io.read_wav / write_wav / open_audio)
from xmtpu import compat  # noqa: E402  (handle-style reference-parity API)
from xmtpu.config.schema import (  # noqa: E402
    PipelineConfig,
    TrackConfig,
    EffectConfig,
)

__all__ = [
    "resample",
    "mix",
    "effects",
    "process_file",
    "Session",
    "SessionPool",
    "PoolServer",
    "PipelineConfig",
    "TrackConfig",
    "EffectConfig",
    "__version__",
]
