#!/usr/bin/env python
"""Rerun-determinism audit: execute EVERY registered query twice on the
same session and diff the canonicalized results.

This is the whole-registry sweep behind the per-op
tests/test_determinism.py sample: any operator whose output depends on
shuffle merge order, unpinned ties, wall clock, or cache state shows up
here as RERUN-NONDETERMINISTIC. Round-5 full run: 211/211 stable
(including every streaming op — AvailableNow reruns replay the same
landing files through fresh checkpoints).

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


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("audit-determinism")
    spark.sparkContext.setLogLevel("ERROR")
    unstable, errors = [], []
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
    print(f"\n{len(REGISTRY) - len(unstable) - len(errors)} stable, "
          f"UNSTABLE: {unstable}, ERRORS: {errors}")
    return 1 if (unstable or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
