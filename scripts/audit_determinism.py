#!/usr/bin/env python
"""Rerun-determinism audit: execute EVERY registered query twice on the
same session and diff the canonicalized results.

This is the whole-registry sweep behind the per-op
tests/test_determinism.py sample: any operator whose output depends on
shuffle merge order, unpinned ties, wall clock, or cache state shows up
here as RERUN-NONDETERMINISTIC. Round-5 full run: 210/210 stable
(every op except the declared wall-clock push source — AvailableNow
streaming reruns replay the same landing files through fresh
checkpoints and ARE stable).

Run: `python scripts/audit_determinism.py [sf_dir]` — prints one line
per op and a final UNSTABLE list; exits non-zero if any op is unstable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.session import get_spark
from tests.parity import canonical_rows

# No exclusions since r10: the push-ingest twin graduated to a
# deterministic batch-twin return (the wall-clock-dependent live
# aggregate is verified in-op), emptying the old WALL_CLOCK set —
# every registered op must be rerun-identical.


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit-determinism")
    spark.sparkContext.setLogLevel("ERROR")
    unstable, errors, skipped = [], [], []
    for name, spec in REGISTRY.items():
        try:
            r1 = canonical_rows(spec.fn(spark, sf).toPandas())
            r2 = canonical_rows(spec.fn(spark, sf).toPandas())
            status = "stable" if r1 == r2 else "RERUN-NONDETERMINISTIC"
            if r1 != r2:
                unstable.append(name)
        except Exception as exc:  # noqa: BLE001 — audit must survey all ops
            status = f"ERROR {str(exc)[:100]}"
            errors.append(name)
        print(f"{name}: {status}", flush=True)
    n_stable = len(REGISTRY) - len(unstable) - len(errors) - len(skipped)
    print(f"\n{n_stable} stable, {len(skipped)} skipped (wall-clock), "
          f"UNSTABLE: {unstable}, ERRORS: {errors}")
    return 1 if (unstable or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
