"""Scan / source operators (SURVEY.md §2.B "Scans / sources / sinks").

The ingest surface of the reference is an HTTP stream of opaque NDJSON
lines (reference server.go:82-92, publisher.go:182-202); batch-side the
engine's equivalents are the parquet scan (columnar, pushdown-capable) and
JSON-line parsing with `get_json_object` (lazy, schema-on-read — mirrors
the reference's "never parse the payload" stance of publisher.go:193-196,
parsing only where typed access is required).
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
    "scan_parquet",
    category="scans",
    oracle="""
    SELECT
      count(*)                       AS n_rows,
      min(l_orderkey)                AS min_orderkey,
      max(l_orderkey)                AS max_orderkey,
      min(l_shipdate)                AS min_shipdate,
      max(l_shipdate)                AS max_shipdate
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan with min/max/count — the pure ingest path.

    count/min/max over a parquet scan is answered largely from row-group
    statistics + a cheap aggregate; at 100 TB this plan reads footers and
    the two projected columns only (check ReadSchema in explain).
    """
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


@register(
    "scan_json_lines",
    category="scans",
    oracle="""
    SELECT
      event_type,
      count(*)                                                    AS n_events,
      round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS avg_k,
      max(CAST(json_extract_string(props, '$.k') AS BIGINT))      AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON field extraction from the events.props column.

    `get_json_object` stays JVM-side (no Python UDF) and parses lazily per
    row — the Spark analogue of the reference treating payloads as opaque
    bytes until a field is actually needed.
    """
    events = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k.cast("double")), 2).alias("avg_k"),
        F.max(k.cast("bigint")).alias("max_k"),
    )


@register(
    "sink_partitioned",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderstatus, count(*) AS n_rows
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + read-back (the topic fan-out sink, batch twin).

    Mirrors the reference's per-topic fan-out (publisher.go:155-160): one
    output directory per partition value. `partitionBy` gives partition
    pruning on read — the scale property that makes per-topic consumers
    read only their topic's files.
    """
    orders = load(spark, sf_dir, "orders")
    out = work_dir("sink_partitioned")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "scan_file_metadata",
    category="scans",
    bench=False,
    oracle="""
    SELECT 'lineitem' AS tbl, 1 AS n_files, count(*) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'orders', 1, count(*) FROM orders
    UNION ALL
    SELECT 'events', 1, count(*) FROM events
    """,
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level scan observability via the `_metadata` hidden column:
    per table, how many physical files back the scan and how many rows
    they carry — the "what will this query actually read" surface that
    compaction decisions (sink_compaction) and small-files monitoring
    build on.

    `_metadata` is Spark's per-file struct (path, size, mtime) exposed
    on every file-source scan at zero extra IO — the file count is a
    distinct over the constant-per-file path column inside the SAME
    scan that counts rows, never a second filesystem listing. The
    driver's fixtures are one parquet file per table, which the oracle
    states as the expected constant — a multi-file table would surface
    as a hash mismatch, which is exactly the audit's job. At 100 TB
    the same two columns feed the small-files alert (files ≫ optimal
    for the row count ⇒ run sink_compaction).
    """
    parts = []
    for tbl in ("lineitem", "orders", "events"):
        df = load(spark, sf_dir, tbl)
        parts.append(
            df.select(F.col("_metadata.file_path").alias("fp")).groupBy().agg(
                F.lit(tbl).alias("tbl"),
                F.countDistinct("fp").cast("int").alias("n_files"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
