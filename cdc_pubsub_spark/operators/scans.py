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
