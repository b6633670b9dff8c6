"""DSP graph / pipeline layer (N3 in SURVEY.md §1.2).

Reference analogue: the graph-stage layer — ``src/mixer`` /
``mixer_effects`` and the voice-effects chain ``xm_audio_effects.c``
[upstream, SURVEY.md §2.1] — plus the per-frame pull loop owned by
``xm_audio_utils.c``. Here the graph is built once from a
:class:`~xmtpu.config.schema.PipelineConfig`, traced by XLA, and run as
fused device computations over whole clips or blocks; there is no
per-frame host loop in the offline path.
"""
