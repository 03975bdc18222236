"""Set operations (SURVEY.md §2.B "Set operations").

UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/EXCEPT add a
distinct (one hash shuffle on all columns). At scale, prefer UNION ALL +
explicit dedup on a key over engine-wide distinct when the key is known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "set_union_all",
    category="setops",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM (
      SELECT event_type, value FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_type, value FROM events WHERE value > 50
    )
    GROUP BY event_type
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping slices (duplicates preserved)."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("value") > 50)
    return (
        a.unionByName(b)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "set_union_distinct",
    category="setops",
    oracle="""
    SELECT event_type, count(*) AS n_users
    FROM (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type IN ('purchase', 'error')
      UNION
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type IN ('error', 'view')
    )
    GROUP BY event_type
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup across both sides ('error' rows overlap)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    a = ev.filter(F.col("event_type").isin("purchase", "error")).distinct()
    b = ev.filter(F.col("event_type").isin("error", "view")).distinct()
    return (
        a.unionByName(b)
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "set_intersect",
    category="setops",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both purchased and hit an error (INTERSECT, distinct)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    category="setops",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
      AND n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (EXCEPT on key sets)."""
    nation = load(spark, sf_dir, "nation")
    cust_nations = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    supp_nations = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    # subtract = EXCEPT DISTINCT (set semantics). exceptAll would be wrong
    # here: it removes one occurrence per supplier row, so a nation with
    # more customers than suppliers would survive. Re-join to nation for
    # names (broadcast: the key set is tiny).
    keys = cust_nations.subtract(supp_nations)
    return nation.join(
        F.broadcast(keys), nation.n_nationkey == keys.nk, "left_semi"
    ).select("n_nationkey", "n_name")


@register(
    "set_multiset_all",
    category="setops",
    oracle="""
    WITH a AS (
      SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    ),
    b AS (
      SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'
    ),
    ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
    ix AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    SELECT 'except_all' AS op, count(*) AS n_rows,
           count(DISTINCT k) AS n_distinct, min(k) AS min_k
    FROM ex
    UNION ALL
    SELECT 'intersect_all', count(*), count(DISTINCT k), min(k) FROM ix
    ORDER BY op
    """,
)
def set_multiset_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the MULTISET set operations, whose
    semantics (bag difference keeps max(m-n,0) copies, bag intersect
    keeps min(m,n)) the distinct-flavored set_except/set_intersect ops
    cannot express.

    Spark's exceptAll/intersectAll plan as a count-tagged aggregate +
    replicate generate (no pairwise matching): each side collapses to
    (value, count) — one shuffle each — and the survivor multiplicity
    replicates row-locally. That is also why they scale: the shuffled
    payload is the distinct key set with counts, never the raw bags.
    Summary counts keep the output deterministic (the raw multiset
    row order is not).
    """
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))

    def summarize(df: DataFrame, op: str) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("k").alias("n_distinct"),
            F.min("k").alias("min_k"),
        )
    return (
        summarize(a.exceptAll(b), "except_all")
        .unionByName(summarize(a.intersectAll(b), "intersect_all"))
        .orderBy("op")
    )
