"""Second-tier relational operators: subqueries, pivot/unpivot,
deterministic sampling, corrupt-input dead-lettering.

These round out the surface a reference user would expect from a full
engine: Catalyst's subquery decorrelation (SURVEY.md §4.2), reshaping
(pivot = conditional aggregation, unpivot = Expand), hash-based sampling
(the reproducible kind a training pipeline needs — never rand()), and the
error path the reference gets wrong (silent drop of oversized lines,
publisher.go:182-202 — here malformed records are counted and routed, not
lost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "subq_correlated_scalar",
    category="advanced",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey
    )
    AND c_custkey <= 1000
    """,
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance.

    Catalyst decorrelates this into an aggregate + join
    (RewriteCorrelatedScalarSubquery) — no per-row re-execution, which is
    the difference between O(n) and O(n²) at scale. Expressed through the
    SQL entry point because that's where users write subqueries.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer_sq c
        WHERE c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer_sq c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        AND c_custkey <= 1000
        """
    )


@register(
    "agg_pivot",
    category="advanced",
    oracle="""
    SELECT
      user_id % 10                                              AS user_decile,
      count(*) FILTER (WHERE event_type = 'click')              AS click,
      count(*) FILTER (WHERE event_type = 'purchase')           AS purchase,
      count(*) FILTER (WHERE event_type = 'error')              AS error,
      count(*) FILTER (WHERE event_type = 'view')               AS "view",
      count(*) FILTER (WHERE event_type = 'signup')             AS signup
    FROM events
    GROUP BY 1
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types into columns per user decile.

    `pivot(col, values)` with explicit values compiles to one hash
    aggregate with conditional agg expressions (exactly the oracle's
    FILTER clauses) — one pass, one shuffle. Omitting the value list
    would add a distinct-scan job to discover them: always pass values
    when known.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_decile"))
        .pivot("event_type", ["click", "purchase", "error", "view", "signup"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "agg_unpivot",
    category="advanced",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
      FROM lineitem WHERE l_orderkey <= 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
      FROM lineitem WHERE l_orderkey <= 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey <= 500
    )
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three measure columns into (metric, val) rows.

    `unpivot` is a single Expand node — each input row emits 3 output
    rows in one pass with no shuffle and no triple-scan (the oracle's
    UNION ALL form would scan three times without common-subtree reuse).
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric_raw",
        "val_raw",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("metric_raw") == "l_quantity", "quantity")
        .when(F.col("metric_raw") == "l_extendedprice", "price")
        .otherwise("discount")
        .alias("metric"),
        F.round("val_raw", 2).alias("val"),
    )


@register(
    "sample_hash_mod",
    category="advanced",
    oracle="""
    SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
    FROM documents
    WHERE strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 4
    GROUP BY lang
    """,
)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% sample via content hash (md5 first nibble < 4).

    Training pipelines must never sample with rand(): a hash-mod sample
    is reproducible across runs, engines, and cluster sizes, composes
    with incremental ingestion (a doc's membership never changes), and
    needs no shuffle — the predicate evaluates per-row in the scan.
    TABLESAMPLE/df.sample are the non-reproducible alternative.
    """
    docs = load(spark, sf_dir, "documents")
    nibble = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    return (
        docs.filter(nibble < 4)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "scan_json_corrupt",
    category="advanced",
    oracle="""
    WITH lines AS (
      SELECT event_id,
             CASE WHEN event_id % 13 = 0
                  THEN substr(props, 1, greatest(length(props) - 3, 1))
                  ELSE props END AS raw
      FROM events WHERE event_id <= 2000
    )
    SELECT
      json_valid(raw)                                           AS parsed_ok,
      count(*)                                                  AS n,
      round(avg(CASE WHEN json_valid(raw)
                THEN CAST(json_extract_string(raw, '$.k') AS DOUBLE) END), 2) AS avg_k
    FROM lines
    GROUP BY 1
    """,
)
def scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record dead-lettering: corrupt JSON is detected, counted,
    and kept — never silently dropped.

    The reference silently truncates request bodies at 64 KiB lines and
    still ACKs (publisher.go:182-202, SURVEY.md §2.A5) — data loss with a
    success status. The engine's contract: a parse failure yields a null
    struct (from_json), rows route to a dead-letter branch with full
    counts, and the ACK-equivalent (query success) reflects reality.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    raw = F.when(
        F.col("event_id") % 13 == 0,
        F.substring(
            F.col("props"), 1, F.greatest(F.length("props") - 3, F.lit(1))
        ),
    ).otherwise(F.col("props"))
    # get_json_object → null on malformed input (every valid fixture line
    # carries a non-null $.k, so null ⟺ corrupt here; matches the
    # oracle's json_valid guard).
    k = F.get_json_object(raw, "$.k").cast("double")
    df = ev.select(k.alias("k"))
    return df.groupBy(F.col("k").isNotNull().alias("parsed_ok")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("k"), 2).alias("avg_k"),
    )
