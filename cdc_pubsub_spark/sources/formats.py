"""Columnar/row source-format round-trips (ORC, CSV).

The reference ingests exactly one wire format (NDJSON over HTTP); an
engine replacing it must speak the formats a lakehouse actually stores.
Each operator round-trips driver data through the format and aggregates
the read-back — the oracle runs on the original table, so the round-trip
itself is what's being verified (schema + value fidelity through the
format's writer/reader pair).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.paths import work_dir
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "scan_orc_roundtrip",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → read back → aggregate (must equal the parquet truth).

    ORC is the other vectorized columnar format with predicate pushdown;
    identical aggregate results through the round-trip prove writer/
    reader fidelity (timestamps, doubles, strings).
    """
    out = work_dir("orc_orders")
    load(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "sink_dynamic_partition_overwrite",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderstatus, count(*) AS n_rows
    FROM orders
    WHERE o_orderstatus <> 'F' OR o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: rewrite ONLY the partitions present
    in the incoming batch, leaving siblings untouched.

    The CDC reprocessing primitive: re-deliver one day/topic (reference
    changefeeds re-emit whole daily files on retry) and overwrite just
    that partition — static overwrite mode would wipe the entire table.
    Demonstrated by rewriting the 'F' partition with flagged rows and
    proving 'O'/'P' partitions survive byte-identical row counts.
    """
    out = work_dir("dyn_overwrite")
    import shutil as _shutil

    _shutil.rmtree(out, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").parquet(out)

    # Re-deliver ONLY the 'F' partition, halving its rows (simulating a
    # corrected reprocess), in dynamic overwrite mode.
    redo = (
        orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
    )
    (
        redo.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_rows"))
@register(
    "sink_compaction",
    category="scans",
    bench=False,
    oracle="""
    SELECT 64 AS files_before, 2 AS files_after,
           count(*) AS rows_in, count(*) AS rows_out, true AS conserved
    FROM orders
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a fragmented landing zone (64 files) is
    rewritten into a handful of right-sized files.

    The operational follow-up to every streaming sink: per-micro-batch
    writes fragment the lake (the reference's per-request publishes have
    the same effect on topic backlogs), and scan cost at 100 TB is
    dominated by file-open overhead once files are small. Compaction =
    read → repartition to target size → atomic-dir rewrite. Returns
    before/after file counts + row conservation proof.
    """
    import shutil as _shutil

    frag = work_dir("fragmented")
    compact = work_dir("compacted")
    _shutil.rmtree(frag, ignore_errors=True)
    _shutil.rmtree(compact, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(frag)  # simulate fragmented sink
    spark.read.parquet(frag).repartition(2).write.parquet(compact)

    def n_files(d: str) -> int:
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    n_before, n_after = n_files(frag), n_files(compact)
    n_rows_src = orders.count()
    n_rows_out = spark.read.parquet(compact).count()
    return spark.createDataFrame(
        [(n_before, n_after, n_rows_src, n_rows_out, n_rows_src == n_rows_out)],
        "files_before int, files_after int, rows_in bigint, rows_out bigint, conserved boolean",
    )


@register(
    "scan_csv_roundtrip",
    category="scans",
    bench=False,
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (header, explicit schema on read) → aggregate.

    CSV is schema-less text: the read declares the schema explicitly
    (never inferSchema in production — a second full scan and
    type-guessing nondeterminism). Doubles survive via Spark's
    round-trippable default formatting.
    """
    out = work_dir("csv_customer")
    load(spark, sf_dir, "customer").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    back = spark.read.schema(
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string"
    ).option("header", True).csv(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register("scan_schema_evolution", category="scans", bench=False, oracle="""
    SELECT
      CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS epoch,
      count(*)                                        AS n,
      count(CASE WHEN o_orderkey % 2 = 1
                 THEN o_orderpriority END)            AS n_with_priority,
      round(sum(o_totalprice), 2)                     AS total
    FROM orders
    GROUP BY 1
    """)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution at rest: files written before a column
    add (epoch=1) and after it (epoch=2) read back as ONE table via
    mergeSchema, old files null-filling the new column.

    The storage-side twin of cdc_schema_epoch_routing: a 100 TB lake is
    never rewritten when a column lands, so the reader must reconcile
    heterogeneous file schemas. `mergeSchema=true` unions the footer
    schemas at planning time (per-file footer reads — pay it only on
    schema-change boundaries, not per query; production pins the merged
    schema in a catalog). The epoch partition column comes free from
    directory layout. Oracle recomputes the expected union straight
    from the source table — any mis-merge shows as count/sum drift.
    """
    orders = load(spark, sf_dir, "orders")
    out = work_dir("schema_evolution")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "epoch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "epoch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return merged.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
