#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every benched query in the registry at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is wall-clock per query with a warm JVM (one untimed warm-up run of
the flagship query first, so session/codegen startup isn't charged to q1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("cdc-pubsub-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT, codegen cache, parquet footer reads.
    REGISTRY["agg_hash_groupby"].fn(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if not spec.bench:
            continue
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
