"""CLI: run any registered query by name.

    python -m cdc_pubsub_spark <query> [--sf-dir DIR] [--explain] [--rows N]
    python -m cdc_pubsub_spark --list

The operational entry point a reference user gets in exchange for the
bridge's flag-driven daemon (reference main.go:30-68) — one process, one
query, results or the physical plan on stdout.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser(prog="cdc_pubsub_spark")
    parser.add_argument("query", nargs="?", help="registered query name")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--explain", action="store_true", help="print the formatted plan instead of rows")
    parser.add_argument("--rows", type=int, default=20)
    parser.add_argument("--list", action="store_true", help="list registered queries")
    args = parser.parse_args()

    import cdc_pubsub_spark.all_queries  # noqa: F401
    from cdc_pubsub_spark.registry import REGISTRY

    if args.list or not args.query:
        for name, spec in sorted(REGISTRY.items()):
            mark = "SQL " if spec.oracle else "rows"
            print(f"{mark}  {name:32s} [{spec.category}]")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query {args.query!r}; --list to enumerate", file=sys.stderr)
        return 2

    from cdc_pubsub_spark.session import get_spark

    spark = get_spark(f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.query].fn(spark, args.sf_dir)
    if args.explain:
        from cdc_pubsub_spark.plans.inspect import formatted_plan

        print(formatted_plan(df))
    else:
        df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
