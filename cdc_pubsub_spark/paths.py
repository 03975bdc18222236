"""Per-process scratch paths for fixture sinks and streaming landing dirs.

Operators that materialize to local disk (partitioned sinks, bucketed
warehouses, NDJSON landing dirs) previously shared fixed /tmp paths; two
engine processes running concurrently (the round driver + a test run, or
two test sessions) would race one another's rmtree/write/read cycles and
fail nondeterministically. Keying every scratch root by pid isolates
processes completely while staying deterministic within one process —
re-running an operator in the same session still reuses (and
deliberately clears) its own directory.
"""

from __future__ import annotations

import os
import tempfile


def work_dir(name: str) -> str:
    """Scratch path for one named fixture, isolated per process."""
    return os.path.join(
        tempfile.gettempdir(), f"cdc_pubsub_spark_{os.getpid()}", name
    )
