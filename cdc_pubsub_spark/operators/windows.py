"""Window-function operators (SURVEY.md §2.B "Window functions").

Window evaluation shuffles once on the partition key and sorts within
partitions; every query here bounds its key range so results stay
hash-comparable, and orders on a unique tiebreak column so ranks are
deterministic (SURVEY.md §2.B determinism rules).

The lag/lead pair is the batch form of the CDC before/after diff the
reference transports (wrapped envelopes carry prior-state implicitly via
the `updated` cursor — reference README.md:27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_pubsub_spark.functions.rounding import r2, r4
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "win_rank",
    category="windows",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_orderpriority,
      rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)              AS rnk,
      dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)              AS drnk,
      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey)  AS rn
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer.

    rank and dense_rank rank by priority alone (real ties → gap vs no-gap
    semantics differ); row_number adds the unique o_orderkey tiebreak so
    it is total-ordered and deterministic.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w_ties = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_total = Window.partitionBy("o_custkey").orderBy("o_orderpriority", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.row_number().over(w_total).alias("rn"),
    )


@register(
    "win_lag_lead",
    category="windows",
    oracle="""
    SELECT
      event_id,
      round(value, 2) AS value_r,
      round(lag(value)  OVER w, 2) AS prev_value,
      round(lead(value) OVER w, 2) AS next_value,
      CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        - lag(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) OVER w AS gap_sec
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag/lead of event values and inter-event gap seconds.

    The before/after diff of a change stream, expressed as one window
    pass — the Spark shape of reading a CDC envelope's prior state.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        F.round("value", 2).alias("value_r"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        (epoch - F.lag(epoch).over(w)).alias("gap_sec"),
    )


@register(
    "win_running_frame",
    category="windows",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)  AS running_revenue,
      floor(avg(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS trailing3_avg
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue + trailing-3 moving average (ROWS frames)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_revenue"),
        # avg over a 2-3 row frame creates exact decimal midpoints (x/2);
        # r2's floor formula rounds identically on both engines.
        r2(F.avg("o_totalprice").over(w.rowsBetween(-2, 0))).alias("trailing3_avg"),
    )


@register(
    "win_range_frame",
    category="windows",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice
            RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) AS near_price_sum
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key: sum of order prices within
    $10k below each order's price (peers included — RANGE, not ROWS)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("near_price_sum"),
    )


@register(
    "win_ntile_pct",
    category="windows",
    oracle="""
    SELECT
      o_orderkey,
      ntile(4)       OVER w                       AS quartile,
      round(percent_rank() OVER w, 4)             AS pct_rank,
      round(cume_dist()    OVER w, 4)             AS cume
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over order totals (global window,
    total-ordered on (price, orderkey) so bucket assignment is exact)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "win_first_last",
    category="windows",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(first_value(o_totalprice) OVER w, 2) AS first_price,
      round(last_value(o_totalprice)
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        AS final_price,
      round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over each customer's order
    history — the CDC first/current/nth-state projection. last_value uses
    the full-partition frame (the default running frame would just echo
    the current row — the classic last_value trap)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("final_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@register(
    "topk_per_group",
    category="windows",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price_r, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
      WHERE o_custkey <= 200
    )
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (windowed top-k).

    row_number + filter is the scalable per-group top-k: Spark pushes the
    rank filter into the window sort (WindowGroupLimit in the physical
    plan) so each partition keeps only k rows — no full materialization.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price_r"),
            "rn",
        )
    )


@register(
    "win_count_distinct",
    category="windows",
    oracle="""
    SELECT DISTINCT
      user_id,
      count(DISTINCT event_type) OVER (PARTITION BY user_id) AS n_types,
      count(*)                   OVER (PARTITION BY user_id) AS n_events
    FROM events
    WHERE event_id <= 5000
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation over a window partition — which Spark's
    window functions reject outright (DISTINCT_WINDOW_FUNCTION_
    UNSUPPORTED): emulated exactly with size(collect_set() OVER w).

    collect_set is an unbounded-frame window aggregate, so the distinct
    set builds once per partition in the window sort — same single
    shuffle as any windowed aggregate, no self-join (the naive rewrite,
    a groupBy + join back, shuffles twice). The set is bounded by the
    distinct-value cardinality (5 event types), not partition size; for
    high-cardinality columns at 100 TB swap in approx hll_sketch_agg
    over the same window. DISTINCT rows output because the window
    replicates its value per input row — both engines dedupe
    identically.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 5000)
    w = Window.partitionBy("user_id")
    return (
        ev.select(
            "user_id",
            F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types"),
            F.count(F.lit(1)).over(w).alias("n_events"),
        )
        .distinct()
    )


@register(
    "win_gaps_islands",
    category="windows",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    islands AS (
      SELECT user_id, event_id - rn AS grp,
             count(*) AS run_len,
             min(event_id) AS run_start,
             max(event_id) AS run_end
      FROM purchases
      GROUP BY user_id, event_id - rn
    )
    SELECT run_len,
           count(*)          AS n_runs,
           min(run_start)    AS first_run_start,
           max(run_end)      AS last_run_end
    FROM islands
    GROUP BY run_len
    ORDER BY run_len
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE event ids per user
    — the classic value-based sequence detection (its time-based twin
    is events_sessionize).

    The id-minus-row_number trick: within a user's ordered purchases,
    consecutive ids share a constant (id - rn), so one window pass plus
    one aggregate finds every island with no self-join and no
    iteration — the shape that replaces the quadratic "find run
    boundaries by joining each row to its successor" formulation. One
    shuffle on user_id serves the window AND the island aggregate
    (id - rn preserves the user partitioning); the run-length histogram
    is a 25-row final rollup. At 100 TB the same two-level shape holds
    because islands never cross user partitions.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "event_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    purchases = ev.select(
        "user_id", "event_id", F.row_number().over(w).alias("rn")
    )
    islands = (
        purchases.groupBy(
            "user_id", (F.col("event_id") - F.col("rn")).alias("grp")
        )
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("event_id").alias("run_start"),
            F.max("event_id").alias("run_end"),
        )
    )
    return (
        islands.groupBy("run_len")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.min("run_start").alias("first_run_start"),
            F.max("run_end").alias("last_run_end"),
        )
        .orderBy("run_len")
    )


@register(
    "win_moving_zscore",
    category="windows",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, value,
             avg(value) OVER tw AS mu,
             stddev_samp(value) OVER tw AS sigma,
             count(*) OVER tw AS n_trail
      FROM events
      WINDOW tw AS (PARTITION BY user_id
                    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT user_id, event_id,
             CASE WHEN n_trail >= 5 AND sigma > 0
                  THEN abs(value - mu) / sigma END AS z
      FROM w
    )
    SELECT user_id,
           count(z)                                   AS n_scored,
           CAST(sum(CASE WHEN z > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
                                                      AS n_anomalies,
           floor(max(z) * 10000 + 0.5) / 10000        AS max_z
    FROM scored
    GROUP BY user_id
    HAVING count(z) > 0
    ORDER BY user_id
    """,
)
def win_moving_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: each event against the mean/stddev of its
    user's TRAILING 20 events (exclusive of itself) — the streaming-
    monitor shape, vs events_anomaly_zscore's global per-type stats.

    One (user, time)-ordered window computes trailing avg, stddev, and
    count in a single pass (Spark evaluates all three over the same
    frame buffer); scores only emit with >= 5 trailing samples and
    nonzero spread, the warm-up guard every rolling detector needs.
    The trailing frame EXCLUDES the current row (ROWS -20 TO -1): a
    self-inclusive frame dilutes the very spike being scored. At
    100 TB this shape is skew-sensitive like sessionization — same
    per-user day-split mitigation. The per-user rollup is co-
    partitioned with the window (one shuffle total); z is division-
    created, so the floor-formula r4 rounds max_z identically.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-20, -1)
    )
    w = ev.select(
        "user_id",
        "value",
        F.avg("value").over(tw).alias("mu"),
        F.stddev_samp("value").over(tw).alias("sigma"),
        F.count(F.lit(1)).over(tw).alias("n_trail"),
    )
    z = F.when(
        (F.col("n_trail") >= 5) & (F.col("sigma") > 0),
        F.abs(F.col("value") - F.col("mu")) / F.col("sigma"),
    )
    return (
        w.select("user_id", z.alias("z"))
        .groupBy("user_id")
        .agg(
            F.count("z").alias("n_scored"),
            F.sum(F.when(F.col("z") > 3.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
            r4(F.max("z")).alias("max_z"),
        )
        .filter(F.col("n_scored") > 0)
        .orderBy("user_id")
    )
