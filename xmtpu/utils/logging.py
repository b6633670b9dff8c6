"""Logging.

Reference analogue: ``src/tools/log.c`` (leveled logger -> logcat/stderr)
[upstream, SURVEY.md §2.1/§5]. Here: stdlib logging under the
``xmtpu.*`` namespace. Per-run metrics live on the batch runner's
``BatchReport`` (the one metrics struct — a parallel ``RunMetrics``
here was dead code duplicating it; review find).
"""

from __future__ import annotations

import logging


def get_logger(name: str = "xmtpu") -> logging.Logger:
    # always configure the package ROOT logger, never the child: a
    # child-first call used to attach a handler to the child, and a
    # later parent configuration then double-emitted every child
    # record via propagation (review find, verified live — the old
    # hasHandlers() check only worked in parent-first order)
    root = logging.getLogger("xmtpu")
    if not root.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        root.addHandler(h)
        root.setLevel(logging.INFO)
        # we attached our own handler, so stop propagating to the
        # GLOBAL root: an application's basicConfig() used to emit
        # every xmtpu record twice (review find — the child-vs-parent
        # fix above covered intra-package propagation only). An app
        # that wants full control can clear xmtpu's handlers and
        # re-enable propagation.
        root.propagate = False
    return logging.getLogger(name)
