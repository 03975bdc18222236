"""Invariant tests for the six r12 operators promoted out of staging/
(KMV epoch rollup, AR(2) Yule-Walker, Haar energy, pinball eval, bloom
decontamination, polygon overlay). sf0.01 oracle parity is covered by
tests/test_parity.py like every registered op; these pin the algebraic
invariants the hash pass cannot distinguish from consistently-wrong
formulas.
"""

from __future__ import annotations

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY

from .parity import duck_connection

SF_CORRECT = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


def _q(name, spark, sf):
    return REGISTRY[name].fn(spark, sf)

def test_kmv_rollup_monotone_and_bounded(spark):
    """Cumulative sketches only grow: est/exact are nondecreasing in
    epoch, the estimate equals the exact count on the below-k branch
    (sf0.001: 15 users < k=64), and on the estimating branch the
    relative error stays inside the KMV 3/sqrt(k) envelope."""
    rows = sorted(
        _q("agg_kmv_epoch_rollup", spark, SF_CORRECT).collect(),
        key=lambda r: r["epoch"],
    )
    assert len(rows) == 6
    for a, b in zip(rows, rows[1:]):
        assert b["exact_users"] >= a["exact_users"]
        assert b["est_users"] >= a["est_users"]
    for r in rows:
        if r["sketch_size"] < 64:
            assert r["est_users"] == r["exact_users"]
        else:
            assert abs(r["est_users"] - r["exact_users"]) <= (
                3 / 64**0.5
            ) * r["exact_users"]
    small = sorted(
        _q("agg_kmv_epoch_rollup", spark, SF_SMOKE).collect(),
        key=lambda r: r["epoch"],
    )
    assert all(r["est_users"] == r["exact_users"] for r in small), (
        "below-k prefixes must take the exact branch"
    )


def test_ar2_coefficients_stationary_range(spark):
    """Fitted AR(2) must satisfy the stationarity triangle
    (|φ2| < 1, φ2 ± φ1 < 1) for every event_type — daily revenue sums
    of an i.i.d.-ish fixture are weakly autocorrelated, so wildly
    out-of-triangle coefficients mean the integer moment algebra
    broke, not that the data changed."""
    rows = _q("ts_ar2_yule_walker", spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert abs(r["phi2"]) < 1, r
        assert r["phi2"] + r["phi1"] < 1, r
        assert r["phi2"] - r["phi1"] < 1, r
        assert abs(r["r1"]) <= 1 and abs(r["r2"]) <= 1, r


def test_haar_energy_shape_and_nonnegativity(spark):
    """Each event_type must emit exactly levels 1-4 with nonnegative
    integer energies, and coarse levels must not all vanish (the
    fixture's daily sums have real week-scale variation — all-zero
    coarse energy means the pairwise-sum cascade broke)."""
    rows = _q("ts_haar_wavelet_energy", spark, SF_CORRECT).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        assert sorted(x["level"] for x in rs) == [1, 2, 3, 4], t
        assert all(x["energy_micro"] >= 0 for x in rs), t
        assert sum(x["energy_micro"] for x in rs) > 0, t


def test_pinball_symmetry_identity(spark):
    """Exact pinball identity: L_q(r) + L_{1-q}(r) = |r|, so the q10
    and q90 means must sum to twice the q50 mean (= MAE) up to the
    4 dp output quantization — an algebra-level check the oracle's
    hash pass cannot distinguish from a consistently-wrong formula."""
    rows = _q("ml_quantile_pinball_eval", spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        lhs = r["pinball_q10"] + r["pinball_q90"]
        rhs = 2 * r["pinball_q50"]
        assert abs(lhs - rhs) <= 3e-4, r


def test_bloom_contamination_no_false_negatives(spark):
    """Bloom filters must never miss a member: every exact probe-gram
    hit is bloom-flagged, so per doc n_flagged == n_exact + n_fp (the
    three sums are aggregated independently in-plan — the identity
    failing would mean a member gram's bits were NOT all in the bloom,
    i.e. a false negative). The planted contamination must also
    actually surface (some doc with n_exact >= 1)."""
    rows = _q("corpus_contamination_bloom", spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r["n_flagged"] == r["n_exact"] + r["n_fp"], r
        assert r["n_flagged"] >= 1
    assert any(r["n_exact"] >= 1 for r in rows), (
        "planted probe grams must be found in their source docs"
    )


def test_overlay_grid_join_matches_quadratic_truth(spark):
    """The grid-cell candidate join must lose nothing vs the direct
    quadratic overlay (recall 1: any intersecting pair shares at least
    one covering cell) and emit exact areas — compared pairwise
    against a brute-force recomputation of the fixture geometry."""
    rows = _q("join_polygon_overlay_area", spark, SF_CORRECT).collect()
    assert rows
    con = duck_connection(SF_CORRECT)
    truth = con.sql(REGISTRY["join_polygon_overlay_area"].oracle).fetchall()
    assert [(r["rid_a"], r["rid_b"], r["area"]) for r in rows] == [
        tuple(t) for t in truth
    ]
    assert all(r["area"] > 0 for r in rows)
