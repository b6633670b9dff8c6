"""Cross-cutting utilities: logging, metrics, typed errors.

Reference analogue: ``src/tools/`` (log.c, util.c) [upstream,
SURVEY.md §2.1].
"""

from xmtpu.utils.logging import get_logger
from xmtpu.utils.errors import XmtpuError, ConfigError, DecodeError

__all__ = ["get_logger", "XmtpuError", "ConfigError", "DecodeError"]
