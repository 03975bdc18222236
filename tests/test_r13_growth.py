"""Invariant tests for the r13 growth operators (beyond the oracle-parity
gate, which runs driver-identical at sf0.001 + sf0.01 before each op's
commit). One invariant per op minimum — the house gate rule."""

from __future__ import annotations

from fractions import Fraction

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401  (populates REGISTRY)
from cdc_pubsub_spark.registry import REGISTRY

SF = "/root/testdata/sf0.01"


def test_ddsketch_relative_error_guarantee(spark):
    """DDSketch's contract: every quantile estimate is within alpha = 1%
    RELATIVE error of an exact with-ties percentile of the same
    quantized values — replayed exactly in python per group."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["agg_ddsketch_quantile"].fn(spark, SF).collect()
    vals: dict[str, list[int]] = {}
    for r in (
        load(spark, SF, "lineitem")
        .selectExpr(
            "l_returnflag",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    ):
        vals.setdefault(r["l_returnflag"], []).append(r["cents"])
    assert len(rows) == 3 * len(vals)
    for r in rows:
        xs = sorted(vals[r["l_returnflag"]])
        assert r["n_rows"] == len(xs)
        # lower quantile (ceil rank), the convention the op implements
        rank = -(-len(xs) * r["q_pct"] // 100)
        exact_cents = xs[rank - 1]
        est_cents = r["est_price"] * 100
        rel = abs(est_cents - exact_cents) / exact_cents
        assert rel <= 0.0101, (
            f"{r['l_returnflag']} p{r['q_pct']}: est {est_cents}"
            f" vs exact {exact_cents} rel {rel:.5f}"
        )


def test_pacf_matches_yule_walker_cramer(spark):
    """Durbin-Levinson's phi33 must equal the Cramer's-rule solution of
    the Yule-Walker 3x3 system [R][phi] = [r] — an independent
    derivation replayed in python from the same biased ACF values."""
    rows = REGISTRY["ts_pacf_durbin_levinson"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        r1, r2, r3 = r["r1"], r["r2"], r["r3"]
        # Toeplitz R = [[1,r1,r2],[r1,1,r1],[r2,r1,1]]; phi33 is the
        # last component of R^-1 [r1,r2,r3] = det(R with col3 := r)/det(R).
        det = (
            1 * (1 - r1 * r1)
            - r1 * (r1 - r1 * r2)
            + r2 * (r1 * r1 - r2)
        )
        det3 = (
            1 * (1 * r3 - r1 * r2)
            - r1 * (r1 * r3 - r1 * r2)
            + r1 * (r1 * r2 - r2 * r2)
        )
        # expand: det3 = det of [[1,r1,r1],[r1,1,r2],[r2,r1,r3]] by 3rd col
        det3 = (
            r1 * (r1 * r1 - r2)
            - r2 * (r1 - r1 * r2)
            + r3 * (1 - r1 * r1)
        )
        if r["pacf3"] is None:
            continue
        assert det != 0
        assert abs(det3 / det - r["pacf3"]) < 5e-6, r


def test_kappa_mcc_fraction_replay_and_inequality(spark):
    """Replay kappa and MCC in exact rationals from the collected
    confusion cells; pin the AM-GM consequence |kappa| <= |MCC| and
    the shared sign (both are scaled versions of TP*TN - FP*FN)."""
    import math

    rows = REGISTRY["ml_cohen_kappa_mcc"].fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        tp, fp, fn_, tn, n = r["tp"], r["fp"], r["fn"], r["tn"], r["n"]
        assert tp + fp + fn_ + tn == n
        num = tp * tn - fp * fn_
        kden = n * n - ((tp + fp) * (tp + fn_) + (fn_ + tn) * (fp + tn))
        kappa = Fraction(2 * num, kden)
        mccden = (tp + fp) * (tp + fn_) * (tn + fp) * (tn + fn_)
        mcc = num / math.sqrt(mccden)
        assert abs(float(kappa) - r["kappa"]) < 5e-6
        assert abs(mcc - r["mcc"]) < 5e-6
        assert abs(r["kappa"]) <= abs(r["mcc"]) + 5e-6
        if num != 0:
            assert (r["kappa"] > 0) == (r["mcc"] > 0)
        # the planted classifier thresholds the generative feature:
        # agreement must be far above chance
        assert r["kappa"] > 0.2, r


def _word_counts(spark, sf):
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = (
        load(spark, sf, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .count()
        .collect()
    )
    counts: dict = {}
    for r in rows:
        counts[(r["source"], r["w"])] = r["count"]
    return counts


def test_lexical_richness_python_replay(spark):
    """Exact replay of Yule's K and Simpson's D from the raw (source,
    word) counts, plus structural identities."""
    counts = _word_counts(spark, SF)
    rows = REGISTRY["text_lexical_richness"].fn(spark, SF).collect()
    per_source: dict = {}
    for (s, _w), c in counts.items():
        per_source.setdefault(s, []).append(c)
    assert len(rows) == len(per_source)
    for r in rows:
        fs = per_source[r["source"]]
        n, v = sum(fs), len(fs)
        assert r["n_tokens"] == n and r["n_types"] == v
        assert r["hapax"] == sum(1 for f in fs if f == 1)
        assert r["hapax"] + r["dis_legomena"] <= v
        sum_f2 = sum(f * f for f in fs)
        import math

        yule = 1e4 * (sum_f2 - n) / (n * n)
        simpson = (sum_f2 - n) / (n * (n - 1))
        assert abs(r["yule_k"] - yule) < 5e-6
        assert abs(r["simpson_d"] - simpson) < 5e-6
        assert abs(r["herdan_c"] - math.log(v) / math.log(n)) < 5e-6


def test_burrows_delta_metric_properties(spark):
    """Delta is a mean of per-word metrics, so the triangle inequality
    must hold on every source triple; deltas are non-negative and every
    pair sees the full marker panel on this fixture."""
    rows = REGISTRY["text_burrows_delta"].fn(spark, SF).collect()
    d = {}
    for r in rows:
        assert r["burrows_delta"] >= 0
        assert r["n_markers"] == 8
        d[(r["source_a"], r["source_b"])] = r["burrows_delta"]

    def dd(a, b):
        return d[(a, b)] if (a, b) in d else d[(b, a)]

    sources = sorted({s for pair in d for s in pair})
    assert len(d) == len(sources) * (len(sources) - 1) // 2
    import itertools

    for a, b, c in itertools.islice(itertools.combinations(sources, 3), 200):
        # quantization adds <= 1e-6 per term; allow 4 ulps of slack
        assert dd(a, c) <= dd(a, b) + dd(b, c) + 4e-6, (a, b, c)


def test_dispersion_dp_bounds_and_replay(spark):
    """DP in [0, 1); DPnorm >= DP; exact replay for every profiled word
    from the raw counts (the cleared-denominator identity)."""
    counts = _word_counts(spark, SF)
    tot: dict = {}
    for (s, _w), c in counts.items():
        tot[s] = tot.get(s, 0) + c
    T = sum(tot.values())
    rows = REGISTRY["text_dispersion_dp"].fn(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        w, cw = r["w"], r["c_total"]
        num = sum(
            abs(counts.get((s, w), 0) * T - tot[s] * cw) for s in tot
        )
        dp = num / (2 * cw * T)
        assert 0 <= r["dp"] < 1
        assert abs(r["dp"] - dp) < 5e-6
        assert r["dp_norm"] >= r["dp"] - 5e-6
