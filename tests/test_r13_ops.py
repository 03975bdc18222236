"""Parity + invariants for the three r13-promoted ops (matrix profile,
exact 2-feature Shapley, mergeable moment rollup) — converted from the
staging tests at promotion (the r12 precedent): same sf0.001 + sf0.01
oracle gate as every registered op, plus the op-specific invariants.
"""

from __future__ import annotations

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401  (populates REGISTRY)
from cdc_pubsub_spark.registry import REGISTRY

R13_OPS = ("agg_moment_rollup_mergeable", "ml_shapley_linear2",
           "ts_matrix_profile")
STAGED = {n: REGISTRY[n].fn for n in R13_OPS}
ORACLES = {n: REGISTRY[n].oracle for n in R13_OPS}

from .parity import canonical_rows, duck_connection

SF_CORRECT = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", R13_OPS)
@pytest.mark.parametrize("sf", [SF_SMOKE, SF_CORRECT])
def test_r13_oracle_parity(spark, name, sf):
    sdf = STAGED[name](spark, sf).toPandas()
    con = duck_connection(sf)  # hold the ref: .sql() resolves lazily
    ddf = con.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert canonical_rows(sdf) == canonical_rows(ddf), name


def test_matrix_profile_brute_force_replay(spark):
    """Replay the profile in python from the daily series: for the
    emitted motif and discord, the squared distances and the
    exclusion-zone rule must match an exhaustive scan exactly
    (all-integer op)."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    W = 4
    daily = (
        load(spark, SF_CORRECT, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS day_idx",
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day_idx"], r["x"]))
    got = {
        r["event_type"]: r
        for r in STAGED["ts_matrix_profile"](spark, SF_CORRECT).collect()
    }
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        wins = {
            t + 1: xs[t : t + W] for t in range(len(xs) - W + 1)
        }  # 1-based starts
        mp = {}
        for s, v in wins.items():
            best = None
            for s2, v2 in wins.items():
                if abs(s2 - s) < W:
                    continue
                d2 = sum((a - b) ** 2 for a, b in zip(v, v2))
                if best is None or d2 < best:
                    best = d2
            mp[s] = best
        motif_d2 = min(mp.values())
        motif_start = min(s for s, d in mp.items() if d == motif_d2)
        discord_d2 = max(mp.values())
        discord_start = min(s for s, d in mp.items() if d == discord_d2)
        g = got[et]
        assert g["n_windows"] == len(wins)
        assert g["motif_d2"] == motif_d2
        assert g["motif_start"] == motif_start
        assert g["discord_d2"] == discord_d2
        assert g["discord_start"] == discord_start
        # the motif's nearest neighbor is a real window outside the
        # exclusion zone achieving the motif distance
        nn = g["motif_nn_start"]
        assert nn in wins and abs(nn - motif_start) >= W
        assert (
            sum(
                (a - b) ** 2
                for a, b in zip(wins[motif_start], wins[nn])
            )
            == motif_d2
        )


def test_shapley_efficiency_axiom(spark):
    """phi_quantity + phi_discount == R2_full (the efficiency axiom —
    the whole point of Shapley attribution), each phi sits between 0
    and R2_full here, and discount dominates (the generator's target
    literally multiplies by 1 - discount)."""
    rows = {
        r["feature"]: r
        for r in STAGED["ml_shapley_linear2"](spark, SF_CORRECT).collect()
    }
    assert set(rows) == {"quantity", "discount"}
    full = rows["quantity"]["r2_full"]
    assert rows["discount"]["r2_full"] == full
    total = rows["quantity"]["shapley_r2"] + rows["discount"]["shapley_r2"]
    assert abs(total - full) < 5e-6  # efficiency, to quantization
    assert rows["discount"]["shapley_r2"] > rows["quantity"]["shapley_r2"]
    for r in rows.values():
        assert -1e-9 <= r["r2_alone"] <= full + 1e-9


def test_moment_rollup_merge_equals_rescan(spark):
    """The mergeable-sketch property: the cumulative (n, sum, sumsq)
    at the LAST epoch must equal a direct rescan of all daily rows —
    merge-vs-rescan equality, pinned per event_type via the emitted
    mean/std."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF_CORRECT, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS day_idx",
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["x"])
    rows = STAGED["agg_moment_rollup_mergeable"](spark, SF_CORRECT).collect()
    last = {}
    for r in rows:
        cur = last.get(r["event_type"])
        if cur is None or r["epoch"] > cur["epoch"]:
            last[r["event_type"]] = r
    import math

    for et, xs in series.items():
        n = len(xs)
        mean = sum(xs) / n
        var_n2 = n * sum(x * x for x in xs) - sum(xs) ** 2
        std = math.sqrt(var_n2) / n
        g = last[et]
        assert g["n_days"] == n
        assert abs(g["mean_cents"] - round(mean, 2)) < 0.011
        assert abs(g["pop_std_cents"] - round(std, 2)) < 0.011
    # mean is monotone-epoch cumulative: n_days strictly increases
    for et in series:
        ep = sorted(
            (r["epoch"], r["n_days"]) for r in rows if r["event_type"] == et
        )
        assert all(b[1] > a[1] for a, b in zip(ep, ep[1:]))
