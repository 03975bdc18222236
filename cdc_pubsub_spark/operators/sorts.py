"""Sort / limit / global top-k operators (SURVEY.md §2.B).

`orderBy().limit(k)` compiles to TakeOrderedAndProject: each partition
keeps its local top-k, the driver merges — O(n) scan + O(k) memory, never
a global sort. That's the only acceptable global top-k at 100 TB.
Every LIMIT is total-ordered on a unique key (determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "sort_multikey_limit",
    category="sorts",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price_r,
           round(l_quantity, 2) AS qty_r
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def sort_multikey_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 lineitems by (price desc, orderkey, linenumber)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(25)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price_r"),
            F.round("l_quantity", 2).alias("qty_r"),
        )
    )


@register(
    "topk_global",
    category="sorts",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY round(sum(value), 2) DESC, user_id
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by total event value (agg → top-k, tie-broken on id).

    The aggregate shrinks the data to |users| rows before the top-k, so
    the sort never sees raw events — aggregate-then-rank, the scale-safe
    order of operations.
    """
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        # rank on the ROUNDED total: raw double sums accumulate in
        # engine-specific order, so an unrounded sort key could flip the
        # top-10 boundary between Spark and the oracle by one ulp.
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        agg.orderBy(F.col("total_value").desc(), F.col("user_id"))
        .limit(10)
        .select("user_id", "total_value", "n_events")
    )
