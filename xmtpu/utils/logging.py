"""Logging + run metrics.

Reference analogue: ``src/tools/log.c`` (leveled logger -> logcat/stderr)
[upstream, SURVEY.md §2.1/§5]. Here: stdlib logging under the
``xmtpu.*`` namespace plus a JSON-dumpable per-run metrics struct.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, asdict, field


def get_logger(name: str = "xmtpu") -> logging.Logger:
    logger = logging.getLogger(name)
    # hasHandlers() walks the ancestor chain: a handler on 'xmtpu'
    # must stop 'xmtpu.io' from attaching its own (double emission
    # via propagation — round-2 review find)
    if not logger.hasHandlers():
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


@dataclass
class RunMetrics:
    """Per-run throughput/accounting record (SURVEY.md §5 metrics)."""

    clips: int = 0
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    failed_clips: int = 0
    notes: dict = field(default_factory=dict)

    @property
    def realtime_factor(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def to_json(self) -> str:
        d = asdict(self)
        d["realtime_factor"] = self.realtime_factor
        return json.dumps(d)
