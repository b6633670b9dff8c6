"""Parallelism layer (SURVEY.md §2.2).

Strategies:
* **DP** — clip batch over a ``("dp",)`` mesh: ``xmtpu.batch.
  flagship_step_sharded`` (shard_map, no collectives needed).
* **SP** — ONE long clip sharded along time over a ``("sp",)`` mesh:
  this package. FIR ops exchange a taps-1 halo with the left neighbor
  via ``ppermute`` (the ring/blockwise-attention analogue for
  convolution); IIR/envelope state crosses shards EXACTLY by composing
  each shard's affine (or max-plus) state-transition summary — a tiny
  all_gather of per-shard (matrix, offset) pairs, no approximation
  (SURVEY.md §5 "long-context").
* TP/PP/EP — intentionally absent: the widest op is a small FIR matmul
  (documented, SURVEY.md §2.2).
"""

from xmtpu.parallel.sp import (  # noqa: F401
    sp_fir,
    sp_biquad,
    sp_envelope,
    sp_effects_chain,
)
