"""Pure-JAX DSP ops (layer N2 in SURVEY.md §1.2).

Every hot op here has (or will get) a Pallas twin in ``xmtpu.kernels``;
these serve as the correctness oracle, the interpret-mode fallback, and
the filter-design layer (host-side, cached).

Reference analogue: the C inner loops under ``lib-audio-utils/src/effects/``
and ``src/tools/conversion.*`` [upstream paths per SURVEY.md §2.1; the
mounted snapshot is a stub].
"""
