#!/usr/bin/env python
"""Profile driver-side plan CONSTRUCTION time per registered query.

Calls each registry fn(spark, sf_dir) WITHOUT collect() and times it.
Covers the BENCH set only (bench=True): streaming ops are registered
bench=False (their fn() runs a real stream, so "plan build" would time
execution) and are deliberately excluded.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("planbuild-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    REGISTRY["agg_hash_groupby"].fn(spark, sf_dir)

    rows = []
    t_all = time.perf_counter()
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if not spec.bench:
            continue
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir)
        rows.append((round(time.perf_counter() - t0, 3), name, spec.category))
    total = time.perf_counter() - t_all
    rows.sort(reverse=True)
    print(f"TOTAL plan-build (bench set, serial): {total:.1f}s over {len(rows)} ops")
    for sec, name, cat in rows[:40]:
        print(f"{sec:8.3f}  {name:40s} {cat}")


if __name__ == "__main__":
    main()
