"""Spot-check oracle parity at bench scale (sf0.1) for a representative
query slice: proves the determinism discipline (rounding, total orders,
tie-breaks) survives a 10× data-volume step, not just the driver's
sf0.01 gate."""

from __future__ import annotations

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401

from .parity import assert_parity

SF_BENCH = "/root/testdata/sf0.1"

SPOT = [
    "agg_hash_groupby",      # flagship
    "join_multiway",         # deepest join tree
    "win_running_frame",     # float-midpoint-sensitive windows
    "cdc_upsert_materialize",  # CDC materialization
    "dedup_near",            # heaviest llm op with an exact oracle
    "topk_global",           # LIMIT determinism
    "sql_recursive_cte",     # recursion + gap-fill join at 10× months? no — same months, 10× facts
    "fn_variant_json",       # floor-formula avg rounding at 10× rows
    "join_lateral_topk",     # per-group LIMIT determinism at 10× customers
    "sim_ann_ivf",           # r04 oracle: rounded-rank ties stable at 10× vectors
    "dedup_embed_cosine",    # r04 LSH banding: exact pair set at 10× corpus
    "text_lm_perplexity",    # r04 sample-trained model at 10× corpus
    "agg_bitmap_distinct",   # r04 bitmap-exact distinct at 10× users
    "events_cohort_retention",  # r04 integer-epoch weeks at 10× events
    "tpch_q14_promo_revenue",   # r04 conditional ratio at 10× lineitems
    "dedup_containment",     # r05 hashed prefix-filter anchors at 10× corpus
    "text_boilerplate_spans",  # r05 cross-doc span DF thresholds at 10× docs
    "graph_pagerank",        # r05 unrolled rounds: float sums + ppb floor-rounding at 10× users
    "events_anomaly_zscore",  # r05 stddev z-flags at 10× events
    "dedup_minhash_lsh",     # r06 exact-join upgrade: prefix tier recall 1 at 10× corpus
    "sim_ann_pq",            # r06 integer-microunit ADC ranking at 10× vectors
    "events_attribution",    # r06 packed-touch-key windows at 10× events
    "profile_drift_psi",     # r06 signed r4 psi terms at 10× orders
    # r10 window representatives (the float/ordering-riskiest of the 92
    # never-driver-sampled r09 additions; a one-shot full-registry
    # sf0.1 parity run at r10 close measured 377/377 MATCH — these pin
    # the hardest of them permanently):
    "ts_theil_sen",          # median-of-slopes at 10× pairs
    "ml_gmm_em",             # EM responsibilities: float sums at 10× rows
    "ml_isotonic_calibration",  # PAV pool merges at 10× bins' mass
    "profile_cramers_v",     # chi2 contingency at 10× cells' mass
    "text_lm_kneser_ney",    # continuation backoff at 10× bigrams
    "events_anomaly_shesd",  # iterative ESD deletions at 10× points
    "orders_croston_intermittent",  # SES folds over a longer series
    "ts_periodogram",        # injected trig table at 10× samples
    "events_hotspot_grid",   # Getis-Ord z at 10× cell mass
    "dedup_levenshtein_block",  # r10 star cap: exact pair set at 10× corpus
    "ml_conformal_interval", # split-conformal quantile at 10× calib rows
    "graph_katz_centrality", # integer attenuated paths at 10× edges
    # r11: the rows-only graduation — portable md5+affine band
    # collisions must replay identically in DuckDB at 10× corpus:
    "dedup_minhash_banded",
]


@pytest.mark.parametrize("name", SPOT)
def test_sf01_parity(spark, name):
    assert_parity(spark, name, SF_BENCH)


def test_rounding_formula_cross_engine_sweep(spark):
    """The r2/r4 floor-formula contract, certified by brute force: 200k
    deterministic SIGNED doubles (integer-derived, so both engines
    construct bit-identical inputs) rounded by Spark's r2/r4 must equal
    DuckDB's literal floor-formula output EXACTLY — including the
    negative-midpoint half-toward-+inf cases the contract sanctions.
    This is the evidence behind rounding.py's signed-use clause."""
    import duckdb

    from pyspark.sql import functions as F

    from cdc_pubsub_spark.functions.rounding import r2, r4

    n = 200_000
    # x = ((i*2654435761) mod 10^9 - 5*10^8) / 10^4: exact integer ops
    # then one exact-by-construction division — identical doubles on
    # both engines, spanning ±50000 with 4 fractional digits of
    # structure (includes exact .xx5 midpoints for r2).
    sdf = (
        spark.range(n)
        .select(
            ((F.col("id") * 2654435761) % 1000000000 - 500000000).alias("k")
        )
        .select((F.col("k") / 10000.0).alias("x"))
        .select(r2(F.col("x")).alias("a"), r4(F.col("x")).alias("b"))
        # Compare via order-independent INTEGER sums (a float sum of 200k
        # terms carries partitioning-order ulp noise — the exact noise
        # r2/r4 exist to keep out of COMPARED values; sums of rounded
        # values are not part of the contract).
        .select(
            F.floor(F.col("a") * 100 + F.lit(0.5)).cast("bigint").alias("ia"),
            F.floor(F.col("b") * 10000 + F.lit(0.5)).cast("bigint").alias("ib"),
            "a",
        )
        .agg(
            F.sum("ia").alias("sa"),
            F.sum("ib").alias("sb"),
            F.min("a").alias("mina"),
            F.max("a").alias("maxa"),
        )
        .collect()[0]
    )
    con = duckdb.connect()
    row = con.execute(
        f"""
        WITH xs AS (
          SELECT ((i * 2654435761) % 1000000000 - 500000000) / 10000.0 AS x
          FROM range({n}) t(i)
        ),
        r AS (
          SELECT floor(x * 100 + 0.5) / 100 AS a,
                 floor(x * 10000 + 0.5) / 10000 AS b
          FROM xs
        )
        SELECT CAST(sum(CAST(floor(a * 100 + 0.5) AS BIGINT)) AS BIGINT),
               CAST(sum(CAST(floor(b * 10000 + 0.5) AS BIGINT)) AS BIGINT),
               min(a), max(a)
        FROM r
        """
    ).fetchone()
    assert (sdf["sa"], sdf["sb"], sdf["mina"], sdf["maxa"]) == (
        row[0],
        row[1],
        row[2],
        row[3],
    ), f"spark={tuple(sdf)} duckdb={row}"
