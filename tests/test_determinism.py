"""Registry-wide determinism net: every operator, run twice in the same
session, must produce identical canonical rows.

The driver hashes each query's output once per round — a nondeterministic
operator passes or fails at random. This class of bug is real: the
minhash signatures were once build-dependent (HOF lambda mis-binding,
see llmops/dedup.py). This test re-executes EVERY registered query and
compares canonicalized results, catching partitioning-, ordering-, and
plan-build-sensitive nondeterminism across the whole surface.
"""

from __future__ import annotations

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY

from .parity import canonical_rows

# approx_count_distinct / percentile_approx sketches ARE deterministic in
# Spark (fixed rsd/accuracy, deterministic merge). No exclusions: even the
# push-ingest twin is deterministic since its r10 oracle graduation — the
# wall-clock-dependent live aggregate is verified in-op (raises on
# divergence) and the RETURNED frame is the batch twin over a pinned
# prefix.
ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_rerun_identical(spark, sf_dir, name):
    fn = REGISTRY[name].fn
    first = canonical_rows(fn(spark, sf_dir).toPandas())
    second = canonical_rows(fn(spark, sf_dir).toPandas())
    assert first == second, f"{name} is nondeterministic across reruns"


def test_event_timestamps_unique_at_all_sfs(spark):
    """events_ohlc_resample's open/close use bare min_by/max_by on the
    epoch-micros key, which is deterministic ONLY while timestamps are
    globally unique — min_by tie-breaking is engine-arbitrary (see
    agg_min_max_by). This is the assertion that license rests on: if a
    regenerated fixture ever collides two events on the same
    microsecond, this fails by name instead of the oracle hash failing
    nondeterministically."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.tables import load

    from .conftest import ALL_SFS

    for sf in ALL_SFS:
        ev = load(spark, sf, "events").select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
        n, d = ev.agg(
            F.count("us").alias("n"), F.countDistinct("us").alias("d")
        ).first()
        assert n == d, f"{sf}: {n - d} duplicate event timestamps"


def test_documents_nonempty_at_all_sfs(spark):
    """corpus_sequence_pack's first_doc uses min_by(doc_id, start_tok),
    deterministic only while every doc contributes >= 1 token (an
    empty doc would give two docs the same cumulative start and
    engine-arbitrary tie-breaking). tok = (n_chars+3) div 4 >= 1 iff
    n_chars >= 1 — assert it by name across all sfs, same discipline
    as the event-timestamp uniqueness guard above."""
    from pyspark.sql import functions as F

    from cdc_pubsub_spark.tables import load

    from .conftest import ALL_SFS

    for sf in ALL_SFS:
        min_chars = (
            load(spark, sf, "documents").agg(F.min("n_chars")).first()[0]
        )
        assert min_chars >= 1, f"{sf}: empty document (n_chars={min_chars})"


PARTITION_SPOT = [
    # The float-accumulation-heaviest ops: partial-aggregate order is
    # the classic nondeterminism channel (sum-of-doubles depends on
    # partition boundaries unless the op quantizes or rounds at the
    # contract edge). A one-shot r10 sweep measured 378/378 identical
    # at shuffle.partitions 7 vs 32; these pin the riskiest few.
    "graph_pagerank",
    "agg_stats",
    "ml_gmm_em",
    "text_lm_perplexity",
    "profile_corr_matrix",
    "events_attribution",
    "embed_kmeans",
    "orders_croston_intermittent",
]


@pytest.mark.parametrize("name", PARTITION_SPOT)
def test_partition_count_insensitive(spark, sf_dir, name):
    """Same op, different shuffle-partition count, identical canonical
    output — the accumulation-order axis test_rerun_identical (same
    config twice) cannot exercise."""
    fn = REGISTRY[name].fn
    base = canonical_rows(fn(spark, sf_dir).toPandas())
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        got = canonical_rows(fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got == base, f"{name} output depends on partition count"
