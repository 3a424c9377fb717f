"""Stopwatch + env-gated verbose logging.

Parity with bellman's log layer (/root/reference/bellman/src/log.rs:24-68 and
the BELLMAN_VERBOSE-gated elog_verbose! macros, bellman/src/lib.rs:52-54).
Verbose output is enabled with PHASE2_TPU_VERBOSE=1 (or BELLMAN_VERBOSE=1 for
muscle-memory compatibility).
"""

from __future__ import annotations

import os
import sys
import time


def verbose_enabled() -> bool:
    return os.environ.get("PHASE2_TPU_VERBOSE", os.environ.get("BELLMAN_VERBOSE", "0")) == "1"


def elog_verbose(msg: str, *args) -> None:
    if verbose_enabled():
        print(msg % args if args else msg, file=sys.stderr)


class Stopwatch:
    """Wall-clock stopwatch (log.rs:24-68)."""

    def __init__(self):
        self.start = time.monotonic()

    def reset(self) -> None:
        self.start = time.monotonic()

    def elapsed(self) -> float:
        """Seconds since construction/reset."""
        return time.monotonic() - self.start
