"""Projection / filter / predicate operators (SURVEY.md §2.B).

These generalize the reference's request-admission logic: the sharedKey
set-membership auth check (reference publisher.go:143-150), the 3-way
routing branch (publisher.go:152-165), and the per-record projections
(publisher.go:177-180). All are single-pass, shuffle-free, and fully
pushdown-eligible — Catalyst pushes the predicates into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.functions.rounding import r2
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "proj_arith",
    category="filters",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100               AS disc_price,
      floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
      floor(l_extendedprice / l_quantity * 100 + 0.5) / 100                     AS unit_price
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def proj_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projections (the TPC-H revenue expressions).

    Whole-stage-codegen territory: the three expressions compile into one
    generated function over the columnar batch — zero interpretation
    overhead per row.
    """
    li = load(spark, sf_dir, "lineitem")
    # r2 (floor-formula) instead of F.round: these per-row values are
    # created by division/multiplication and can land on exact decimal
    # midpoints where Spark and DuckDB round() disagree (rounding.py).
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        r2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        r2(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        r2(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


@register(
    "filter_compound",
    category="filters",
    oracle="""
    SELECT
      o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice_r,
      o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderstatus = 'O')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority LIKE '%-%'
      AND NOT (o_orderkey % 10 = 0)
      AND o_custkey IS NOT NULL
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: AND/OR/NOT, BETWEEN, IN, LIKE, IS NULL.

    The whole conjunction is pushed to the parquet reader as
    PushedFilters; only BETWEEN's bounds and the IN-set survive as
    row-group pruning predicates. Generalizes the auth filter
    (reference publisher.go:143-150).
    """
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_orderstatus") == "O"))
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("%-%")
        & ~(F.col("o_orderkey") % 10 == 0)
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice_r"),
        "o_orderpriority",
    )


@register(
    "filter_set_membership",
    category="filters",
    oracle="""
    SELECT
      CASE WHEN event_type IN ('purchase', 'signup') THEN 'admitted'
           ELSE 'rejected' END          AS gate,
      count(*)                          AS n,
      round(sum(value), 2)              AS total_value
    FROM events
    GROUP BY 1
    """,
)
def filter_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership admit/reject split with per-side counts.

    Faithful generalization of the sharedKey check (reference
    publisher.go:143-150, options.go:50-56): rows whose key is in the
    configured set are admitted, the rest go to the reject branch —
    here both branches are counted instead of the reject being a 401.
    """
    events = load(spark, sf_dir, "events")
    admitted = F.col("event_type").isin("purchase", "signup")
    return (
        events.withColumn(
            "gate", F.when(admitted, F.lit("admitted")).otherwise(F.lit("rejected"))
        )
        .groupBy("gate")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "case_when_route",
    category="filters",
    oracle="""
    SELECT
      CASE
        WHEN event_type = 'error' THEN 'dead_letter'
        WHEN event_type IN ('purchase', 'signup') THEN 'priority'
        ELSE 'general'
      END                        AS route,
      count(*)                   AS n_events,
      count(DISTINCT user_id)    AS n_users
    FROM events
    GROUP BY 1
    """,
)
def case_when_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way CASE routing with per-branch counts.

    Mirrors the reference's dispatch branch (publisher.go:155-165):
    RESOLVED file → watermark route, general file → table route, else →
    404. Expressed as when/otherwise so Catalyst evaluates one branch per
    row in a single pass — no multi-scan union.
    """
    events = load(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "dead_letter")
        .when(F.col("event_type").isin("purchase", "signup"), "priority")
        .otherwise("general")
    )
    return (
        events.withColumn("route", route)
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
