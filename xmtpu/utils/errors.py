"""Typed exceptions at the API layer.

Reference analogue: the negative error codes returned by ``*_init`` /
decoder failures and the generator's pollable error status [upstream,
SURVEY.md §5 "Failure detection"]. xmtpu raises typed exceptions
instead; the batch runner catches :class:`DecodeError` per clip so one
bad file doesn't kill a 256-clip batch.
"""


class XmtpuError(Exception):
    """Base class for all xmtpu errors."""


class ConfigError(XmtpuError, ValueError):
    """Invalid or inconsistent pipeline configuration.

    Also a ValueError, for the same reason :class:`DecodeError` is: a
    bad config is bad input data, and the round-3 chain-fuzz sweep
    widened build_chain's typed boundary to wrap what used to escape
    as bare ValueErrors — callers (and pre-existing tests) that catch
    ValueError keep working while typed callers catch the narrower
    class."""


class DecodeError(XmtpuError, ValueError):
    """An input file could not be decoded.

    Also a ValueError: decode failures are bad input data, and callers
    (and pre-existing tests) that catch ValueError keep working while
    typed callers can catch the narrower class."""
