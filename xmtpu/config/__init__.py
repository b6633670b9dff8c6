"""JSON config layer (layer N5 in SURVEY.md §1.2).

Reference analogue: the cJSON-based mixer/effects config parser
(``src/json/cJSON.c`` + ``src/tools/mixer_config.c`` [upstream,
SURVEY.md §2.1]) — the de-facto user interface of the mixer. Here it is
stdlib ``json`` + frozen dataclasses preserving the reference's
conceptual fields (tracks: url/start/end/volume/fadeIn/fadeOut; effects:
name + params).
"""

from xmtpu.config.schema import (
    PipelineConfig,
    TrackConfig,
    EffectConfig,
    load_config,
    dump_config,
)

__all__ = [
    "PipelineConfig",
    "TrackConfig",
    "EffectConfig",
    "load_config",
    "dump_config",
]
