#!/usr/bin/env python
"""Run EVERY registered op against the 10x scale-probe tree.

The bench's scale-probe tier times the risky subset (slowest +
plan-flagged); this sweep answers the cruder but broader question —
does every one of the 378 ops RUN at 10x data at all? It exists
because the answer has repeatedly been no for ops that pass every
sf0.01/sf0.1 gate: ANSI int64 overflows only reachable at the probe
tree's replica-shifted keys (~2^40) crashed ml_conformal_interval
(r09), then 12 more ops and corpus_curriculum_order (r10). Run it
after any batch that plants new key arithmetic; triage every THROW
line (a crash at 10x is a 100 TB incident, whatever sf0.01 says).

Usage: python scripts/sweep_scale_tree.py [--resume]
Writes one line per op to stdout; --resume skips ops already listed
in $SWEEP_LOG (default /tmp/scale_sweep.log), so a killed sweep
continues where it stopped.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import cdc_pubsub_spark.all_queries  # noqa: E402,F401
from cdc_pubsub_spark.registry import REGISTRY  # noqa: E402
from cdc_pubsub_spark.session import get_spark  # noqa: E402


def main() -> None:
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", os.path.join(HERE, ".scale_probe", "sf1")
    )
    if not os.path.isdir(scale_dir):
        sys.exit(f"no scale tree at {scale_dir} (run scripts/gen_scale_probe.py)")
    log_path = os.environ.get("SWEEP_LOG", "/tmp/scale_sweep.log")
    done: set[str] = set()
    throws = 0
    if "--resume" in sys.argv and os.path.exists(log_path):
        # Only `ok` lines are settled; a logged THROW re-runs (it may
        # have been fixed since) and, if the op is gone from the
        # registry, still counts toward the exit code — a resumed
        # sweep must never report clean over a log that recorded
        # crashes it did not re-examine.
        for ln in open(log_path):
            parts = ln.split()
            if len(parts) >= 2 and parts[1] == "ok":
                done.add(parts[0])
            elif len(parts) >= 2 and parts[1] == "THROW" and parts[0] not in REGISTRY:
                throws += 1
    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    with open(log_path, "a") as log:
        for name in sorted(REGISTRY):
            if name in done:
                continue
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                n = len(REGISTRY[name].fn(spark, scale_dir).collect())
                line = f"{name} ok {round(time.perf_counter() - t0, 2)}s rows={n}"
            except Exception as exc:
                throws += 1
                msg = str(exc).splitlines()[0][:160]
                line = f"{name} THROW {type(exc).__name__} {msg}"
            print(line, flush=True)
            print(line, file=log, flush=True)
    print(f"sweep done: {throws} THROW")
    sys.exit(1 if throws else 0)


if __name__ == "__main__":
    main()
