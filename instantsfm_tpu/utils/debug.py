"""Env-gated wall-clock spans for pipeline-internal profiling.

Set ``ISFM_DEBUG_TIMING=1`` to print per-span seconds (the stage-level analog
of the reference's per-stage prints, one level deeper).  Zero overhead when
disabled beyond a time.time() pair.
"""

from __future__ import annotations

import os
import time

ENABLED = bool(os.environ.get("ISFM_DEBUG_TIMING"))


class span:
    """``with span("name"):`` — prints elapsed seconds when enabled."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if ENABLED:
            print(f"    [t] {self.name}: {time.time() - self.t0:.2f}s",
                  flush=True)
        return False
