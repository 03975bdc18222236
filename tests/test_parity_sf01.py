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
]


@pytest.mark.parametrize("name", SPOT)
def test_sf01_parity(spark, name):
    assert_parity(spark, name, SF_BENCH)
