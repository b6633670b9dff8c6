"""Pallas TPU kernels (layer N1 in SURVEY.md §1.2).

The TPU-native analogue of the reference's hand-written C DSP inner
loops (``lib-audio-utils/src/effects/`` hot loops [upstream, SURVEY.md
§2.1]): each kernel has a pure-JAX twin in ``xmtpu.ops`` that serves as
the correctness oracle and interpret-mode fallback (SURVEY.md §4.2).
"""

from xmtpu.kernels.iir import sosfilt_pallas  # noqa: F401
