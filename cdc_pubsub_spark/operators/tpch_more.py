"""TPC-H completion sweep: the remaining benchmark plan shapes.

``operators/composite.py`` carries Q1/Q3/Q10/Q12/Q14/Q18; this module adds
every other TPC-H query whose semantics the fixture star schema can express
— 17 of the 22 shapes in total (there is no ``partsupp`` table, so
Q2/Q9/Q11/Q16/Q20 are out of scope). Together they certify the engine
against the full breadth of classic warehouse plan shapes: pure
scan-predicate folds (Q6), conditional semi joins (Q4), 6-way snowflake
joins with a cross-dimension equality (Q5), dual-role dimension joins
(Q7/Q8), outer-join histograms (Q13), aggregate-equality selection (Q15),
correlated-aggregate filters (Q17), disjunctive multi-band predicates
(Q19), self semi+anti responsibility analysis (Q21), and scalar-subquery
+ anti-join opportunity analysis (Q22).

Scale notes (100 TB):
- Dimension filters always sit BELOW the fact join, and small dimension
  sides are explicitly ``F.broadcast``-pinned, so the only large shuffles
  are the fact-fact joins on their natural keys.
- Per-group "compare to the group's aggregate" (Q15, Q17) computes the
  aggregate FIRST (tiny output), then broadcasts it back upward — never a
  fact-side window over the full table when the aggregate is reusable.
- Q19's OR-of-bands predicate stays one Catalyst filter: the optimizer
  extracts the common ``p_partkey`` join and per-column ranges for
  pushdown; no per-branch union of three scans.

Determinism: division-derived ratios use the floor-formula ``r2``/``r4``
(functions/rounding.py); plain ``round`` only on sums of fixed-decimal
inputs, per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.functions.rounding import r2, r4
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "tpch_q4_order_priority",
    category="composite",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over a conditional semi join.

    "Orders in 1996-Q3 with at least one late line" — the fixture has no
    commit/receipt dates, so "late" is shipdate > orderdate + 60 days.
    The EXISTS becomes a LEFT SEMI join whose condition references both
    sides (l_shipdate vs o_orderdate), the exact shape Catalyst plans as
    a semi hash join with a post-probe residual filter. The quarter
    predicate prunes orders before the shuffle; lineitem needs no
    pre-filter because the semi join consumes it streaming-side.
    """
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q5_local_volume",
    category="composite",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier revenue by nation — 6-way snowflake join.

    The distinguishing feature is the NON-key equality c_nationkey =
    s_nationkey riding on the l_suppkey join: revenue only counts when
    the customer and supplier share a nation. region→nation prunes the
    supplier side to one region's nations before any fact shuffle;
    nation/region/supplier are broadcast, so the plan's only exchanges
    are orders⋈customer and lineitem⋈orders on their natural keys.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    asia_nations = F.broadcast(
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select("n_nationkey", "n_name")
    )
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asia_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q7_volume_shipping",
    category="composite",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume — the dual-role dimension join.

    ``nation`` joins TWICE under different aliases (supplier's nation and
    customer's nation) with a symmetric pair predicate across the two
    roles — the canonical test that the engine keeps alias lineage
    straight through join planning. Both nation sides broadcast; the
    pair filter is applied on the broadcast result rows, after which only
    matching fact rows flow into the final aggregate.
    """
    nation = load(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    supplier = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        F.broadcast(supplier)
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    category="composite",
    oracle="""
    SELECT
      o_year,
      floor(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
            / sum(volume) * 10000 + 0.5) / 10000 AS mkt_share
    FROM (
      SELECT
        CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        l_extendedprice * (1 - l_discount) AS volume,
        n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share by year — conditional-sum ratio.

    An 8-way join (part, lineitem, orders, customer, nation×2 roles,
    region, supplier) feeding sum(CASE)/sum — both sums come out of ONE
    hash aggregate (a shared group pass, not two scans). The selective
    part filter (p_type) broadcasts into lineitem first so the orders
    join shuffles only PROMO lines. Ratio uses the floor-formula r4:
    division-created midpoints are exactly the class where Spark/DuckDB
    round() diverge (functions/rounding.py).
    """
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = F.broadcast(
        nation.join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
        ).select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            F.col("nation"),
        )
    )
    target = F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return (
        df.groupBy("o_year")
        .agg(r4(F.sum(target) / F.sum("volume")).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q13_order_distribution",
    category="composite",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count histogram — outer join + double agg.

    The filter lives IN the outer join's ON clause (not WHERE): customers
    whose only orders are urgent must still appear with c_count 0, which
    a post-join WHERE would silently drop — the classic outer-join
    predicate-placement trap, certified here against the oracle. Two
    aggregations chain: per-customer count (shuffle on custkey, which the
    join already partitioned — Catalyst reuses the exchange), then the
    tiny histogram aggregate.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    on = (cust["c_custkey"] == orders["o_custkey"]) & (
        orders["o_orderpriority"] != "1-URGENT"
    )
    return (
        cust.join(orders, on=on, how="left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    category="composite",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's max revenue.

    Aggregate-equality selection: build the per-supplier revenue
    aggregate once, then keep the row(s) equal to its max. The max is a
    second scalar aggregate broadcast back as a 1-row cross join — NOT an
    unpartitioned window, which would move the whole per-supplier
    relation (one row per supplier — millions at 100 TB) onto a single
    partition. Selection compares the ROUNDED revenue so both engines
    pick from identical values (registry determinism contract).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_rev")))
    top = revenue.crossJoin(max_rev).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        top.join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_qty_revenue",
    category="composite",
    oracle="""
    SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
    FROM (
      SELECT l_extendedprice, l_quantity,
             avg(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13'
    ) branded
    WHERE l_quantity < 0.2 * part_avg_qty
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity order revenue — correlated-aggregate filter.

    "Lines below 20% of their part's average quantity": the correlated
    AVG computes as a standalone per-part aggregate on the brand-filtered
    lines (tiny — one row per part), then broadcasts back onto the same
    lines. At 100 TB this is aggregate-first-broadcast-up (the Q18
    pattern): the alternative window-over-fact would shuffle every
    branded line by partkey twice. Quantities are integral doubles, so
    0.2*avg is bit-identical across engines; the final /7.0 ratio uses
    the floor-formula r2.
    """
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    branded = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = F.broadcast(
        branded.groupBy("l_partkey").agg(F.avg("l_quantity").alias("part_avg_qty"))
    ).withColumnRenamed("l_partkey", "agg_partkey")
    return (
        branded.join(per_part, F.col("l_partkey") == F.col("agg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(r2(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "tpch_q19_disjunctive_bands",
    category="composite",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity bands — OR-pushdown test.

    Three AND-bands OR'd together, each mixing part-side (brand, size)
    and lineitem-side (quantity) columns. Catalyst factors the
    single-side disjuncts for scan pushdown (part reads only the three
    brands' row groups; lineitem's quantity range 1–30 prunes via
    min/max stats) while the mixed residue evaluates post-join — one
    join, one filter, no three-way union of scans.
    """
    part = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    li = load(spark, sf_dir, "lineitem")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q22_sales_opportunity",
    category="composite",
    oracle="""
    WITH threshold AS (
      SELECT floor(avg(c_acctbal) * 100 + 0.5) / 100 AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, threshold
    WHERE c_acctbal > avg_bal
      AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: rich customers with no urgent orders — scalar subquery +
    anti join.

    (The fixture has no phone column, so nation keys stand in for country
    codes; and every fixture customer HAS orders, so the anti-join
    condition is "no URGENT order" to keep the result non-vacuous at
    every sf.) Three classic pieces: a global scalar aggregate (the
    positive-balance average) broadcast as a 1-row cross join, an IN-list
    filter, and a NOT EXISTS planned as a LEFT ANTI hash join against
    the filtered orders. The anti join shuffles only the ~half of
    customers that survive the balance filter. The threshold is floor-formula-rounded to
    2 decimals on both engines so the > comparison selects identical rows
    despite parallel-vs-serial summation order.
    """
    cust = load(spark, sf_dir, "customer")
    threshold = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0.0).agg(
            r2(F.avg("c_acctbal")).alias("avg_bal")
        )
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = (
        cust.crossJoin(threshold)
        .filter(
            (F.col("c_acctbal") > F.col("avg_bal"))
            & F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
        )
    )
    return (
        rich.join(orders, rich["c_custkey"] == orders["o_custkey"], how="left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "tpch_q21_sole_late_supplier",
    category="composite",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers SOLELY responsible for a late multi-
    supplier order — self semi join plus self anti join on the fact table.

    (Shipdate vs orderdate+90d stands in for the missing receipt/commit
    dates.) The two correlated subqueries against lineitem itself become
    a LEFT SEMI ("some other supplier participated") and a LEFT ANTI
    ("no other supplier was also late") — three lineitem readings, all
    co-partitioned on l_orderkey, so after the first shuffle the semi
    and anti probes reuse the same partitioning (one fact shuffle, not
    three). The not-equal supplier condition rides each join as a
    residual; the LIMIT is total-ordered (numwait desc, s_name).
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("y_orderkey"),
        F.col("l_suppkey").alias("y_suppkey"),
        F.col("l_shipdate").alias("y_shipdate"),
    )
    some_other = (F.col("x_orderkey") == F.col("l_orderkey")) & (
        F.col("x_suppkey") != F.col("l_suppkey")
    )
    other_late = (
        (F.col("y_orderkey") == F.col("l_orderkey"))
        & (F.col("y_suppkey") != F.col("l_suppkey"))
        & (F.col("y_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    sole_late = (
        l1.join(l2, on=some_other, how="left_semi")
        .join(l3, on=other_late, how="left_anti")
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        sole_late.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q6_forecast_revenue",
    category="composite",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change — the pure scan-predicate
    aggregate, the benchmark's pushdown/vectorization microbenchmark.

    No join, no group: the entire query is how fast the engine can
    scan, filter, and fold. All three predicates (date range, discount
    band, quantity cap) must reach the parquet reader as PushedFilters
    so row groups outside the year or the discount band are skipped on
    min/max stats alone — at 100 TB Q6 reads ~1/7 of the fact table's
    row groups and decodes only 4 of 11 columns. Discount literals
    compare against the identical parsed doubles in both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
