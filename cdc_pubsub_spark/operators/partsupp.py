"""The partsupp-dependent TPC-H shapes (Q2/Q9/Q11/Q16/Q20).

The driver fixture has no ``partsupp`` table, which kept 5 of the 22
TPC-H plan shapes out of scope through round 6 (round-6 VERDICT item 5).
This module SYNTHESIZES one deterministically — the same discipline as
the planted dedup corpora — so both engines derive bit-identical rows
from the tables they already share:

- **Keys**: the DISTINCT ``(l_partkey, l_suppkey)`` pairs of lineitem.
  This reproduces dbgen's structural invariant that every lineitem's
  part/supplier pair exists in partsupp, which is what keeps the Q9/Q20
  fact-side joins dense (a formula-only partsupp would strand ~96% of
  lineitems with no partsupp row and hollow out both queries).
- **Attributes**: pure integer formulas of the key pair —
  ``ps_availqty = (p*7 + s*13) % 9999 + 1`` and
  ``ps_supplycost_cents = (p*31 + s*17) % 99900 + 100`` (i.e. $1.00 to
  $1000.99 in integer cents). Integer cents keep every downstream
  aggregate (Q11's value ranking, Q2's min-cost, Q20's threshold)
  order-independent and exactly comparable cross-engine — the
  sim_ann_pq micro-unit discipline applied to money.

Scale notes (100 TB): the synthesized partsupp is a DERIVED dimension —
one distinct over lineitem's pair columns (map-side combine, one
shuffle) and row-local arithmetic; at warehouse scale it would be
materialized once and bucketed by ``ps_partkey`` like any other
dimension. Every query below keeps dimension filters under the fact
joins and broadcast-pins the small sides; the only large shuffles are
the pair-keyed fact joins.

Determinism: money stays in integer cents until the final projection;
quantities are integral in the fixture and aggregate as BIGINT; every
LIMIT rides a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load

# DuckDB twin of partsupp_frame — prepend inside WITH (...).
PARTSUPP_CTE = """
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST((ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1
                  AS INTEGER) AS ps_availqty,
             (ps_partkey * 31 + ps_suppkey * 17) % 99900 + 100
               AS ps_supplycost_cents
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey
            FROM lineitem)
    )
"""


def partsupp_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp dimension (see module docstring)."""
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 99900
            + 100
        ).alias("ps_supplycost_cents"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    category="composite",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()},
    eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
             ps_supplycost_cents
      FROM part
      JOIN partsupp ON p_partkey = ps_partkey
      JOIN eu_supp ON ps_suppkey = s_suppkey
      WHERE p_type = 'LARGE' AND p_size <= 15
    ),
    mins AS (
      SELECT p_partkey, min(ps_supplycost_cents) AS min_cents
      FROM cand GROUP BY p_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ps_supplycost_cents / 100.0 AS ps_supplycost
    FROM cand JOIN mins USING (p_partkey)
    WHERE ps_supplycost_cents = min_cents
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the minimum-cost EUROPE supplier for every LARGE
    small-size part — a correlated-MIN subquery planned aggregate-first.

    The spec's `ps_supplycost = (SELECT min(...) ...)` correlation
    becomes: filter part+region FIRST (both below the joins), aggregate
    the per-part min over the already-filtered candidates (tiny), and
    join it back — the Q15/Q17 house pattern, never a window over the
    unfiltered fact side. The min is taken on INTEGER cents, so ties
    and equality survive any engine's float formatting. Both dimension
    sides broadcast; the only shuffle is the per-part min + re-join,
    and both key on p_partkey so AQE coalesces them into one exchange.
    """
    ps = partsupp_frame(spark, sf_dir)
    part_f = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_brand")
    )
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(
        F.broadcast(part_f), F.col("ps_partkey") == F.col("p_partkey")
    ).join(F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    mins = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    return (
        cand.join(
            mins,
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            (F.col("ps_supplycost_cents") / 100.0).alias("ps_supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q9_product_profit",
    category="composite",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()}
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                     - (ps_supplycost_cents / 100.0) * l_quantity)
                     * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
                 AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and order
    year. Revenue minus supply cost per line, for parts named '%red%'.

    Plan shape at scale: the part filter broadcasts (307 of 2000 parts
    survive), the partsupp pair-dimension joins on the composite
    (l_partkey, l_suppkey) key, supplier/nation broadcast, and the one
    big shuffle is lineitem⋈orders on the order key — the same backbone
    as Q3/Q10. Supply cost enters as integer cents and converts to
    dollars ONCE per row before the multiply, exactly like the oracle,
    so the per-row doubles are bit-identical cross-engine. The per-row
    profit is then floored to integer CENTS before the sum (the repo's
    integer-cents discipline): Spark's shuffled partial aggregation and
    DuckDB's sequential fold accumulate in different orders, and a
    float sum is the exact flake class the discipline exists to kill —
    integer sums are order-independent. One division back to dollars at
    projection time.
    """
    li = load(spark, sf_dir, "lineitem")
    ps = partsupp_frame(spark, sf_dir)
    part_f = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.col("ps_supplycost_cents") / 100.0
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(load(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (
                F.sum(
                    F.floor(amount * 100 + F.lit(0.5)).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    category="composite",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()},
    nat_ps AS (
      SELECT ps_partkey,
             ps_supplycost_cents * ps_availqty AS value_units
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    ),
    total AS (
      SELECT sum(value_units) AS t,
             count(DISTINCT ps_partkey) AS np
      FROM nat_ps
    )
    SELECT ps_partkey,
           CAST(sum(value_units) AS BIGINT) AS stock_value_cents
    FROM nat_ps, total
    GROUP BY ps_partkey, t, np
    HAVING sum(value_units) * np > t * 2
    ORDER BY stock_value_cents DESC, ps_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding a significant share of one
    nation's stock value (> 0.5% of the national total).

    The spec's scalar subquery (the national total) is an
    aggregate-first broadcast scalar: nat_ps is computed ONCE, its
    grand total (1 row) cross-joins back over the per-part aggregate —
    Catalyst plans a BroadcastNestedLoopJoin over a single-row side,
    i.e. a broadcast variable, not a cartesian risk. Everything is
    integer arithmetic (cents × qty), so the share comparison and
    output are exact on both engines. The spec's fixed 0.0001/SF
    fraction is replaced by a SCALE-FREE one — keep parts holding more
    than 2× the mean per-part share (value·n_parts > 2·total, pure
    integer cross-multiplication) — so the query returns a meaningful
    tail at every sf instead of going empty as the part count grows.
    """
    nat_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_3"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    nat_ps = (
        partsupp_frame(spark, sf_dir)
        .join(F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias(
                "value_units"
            ),
        )
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(
        F.sum("value_units").alias("value_sum")
    )
    total = per_part.agg(
        F.sum("value_sum").alias("t"),
        F.count(F.lit(1)).alias("np"),  # per_part is one row per key
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_sum") * F.col("np") > F.col("t") * 2)
        .select(
            "ps_partkey",
            F.col("value_sum").cast("bigint").alias("stock_value_cents"),
        )
        .orderBy(F.col("stock_value_cents").desc(), "ps_partkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    category="composite",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can deliver each surviving
    (brand, type, size) bucket, excluding blacklisted suppliers.

    The fixture has no s_comment, so the spec's
    'Customer…Complaints' supplier exclusion becomes s_acctbal < 0
    (6 suppliers) — same NOT-IN-subquery plan shape. s_suppkey is
    non-null by construction, so the NOT IN is a plain LEFT ANTI join
    (the null-aware variant, join_null_semantics, is exercised
    elsewhere). Part attribute filters broadcast below the join; the
    count(DISTINCT) groups on three low-cardinality columns — one
    Expand-free shuffle at 100 TB because the distinct key (suppkey)
    rides the aggregation buffer.
    """
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part_f = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    return (
        partsupp_frame(spark, sf_dir)
        .join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part_f), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "tpch_q20_excess_inventory",
    category="composite",
    oracle=f"""
    WITH {PARTSUPP_CTE.strip()},
    red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
    ),
    shipped97 AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS BIGINT)) AS qty97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM partsupp
      JOIN red_parts ON ps_partkey = p_partkey
      JOIN shipped97
        ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE ps_availqty * 2 > qty97
    )
    SELECT s_name, n_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN excess ON s_suppkey = ps_suppkey
    ORDER BY s_name
    """,
)
def tpch_q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding excess stock of
    '%red%' parts — availqty exceeding half of what they actually
    shipped in 1997.

    The spec's correlated `0.5 * (SELECT sum(l_quantity) ...)` becomes
    aggregate-first: shipped97 pre-aggregates per (part, supplier) pair
    on the same composite key the partsupp join uses (ONE shuffle
    partitioning serves both), and the half-threshold is the integer
    comparison availqty*2 > qty — no floats anywhere. Pairs with no
    1997 shipments drop out in the inner join, exactly the spec's
    NULL-comparison semantics. The distinct supplier set then SEMI-joins
    the supplier dimension. The spec's single-nation restriction is
    dropped (the output carries n_name instead): the fixture's smallest
    sf has ~10 suppliers total, and a one-nation slice of it is
    routinely empty — an all-nations listing keeps the certified result
    non-trivial at every sf while preserving the plan shape (the
    nation join remains; only the filter moved into the projection).
    """
    red_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    shipped97 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty97"))
    )
    excess = (
        partsupp_frame(spark, sf_dir)
        .join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped97,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty97"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select(
            "s_name", "n_name", F.round("s_acctbal", 2).alias("s_acctbal")
        )
        .orderBy("s_name")
    )
