"""Invariant tests for the round-12 EXTENSION wave (post-close session:
ARMA(1,1) moments, mbox scan, ICO container decode, CDC tombstone
compaction, and the later extension batches). sf0.01 oracle parity is
covered registry-wide by tests/test_parity.py; these pin the algebraic
and format invariants a consistently-wrong implementation could fake
through the hash check.
"""

from __future__ import annotations

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY

SF_CORRECT = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


def _q(name, spark, sf):
    return REGISTRY[name].fn(spark, sf)


# --- ts_arma11_moments -------------------------------------------------------


def test_arma11_theta_is_invertible_root(spark):
    """The emitted theta must be the INVERTIBLE root of the MoM
    quadratic: |theta| <= 1, and plugging (phi, theta) back into the
    ARMA(1,1) autocorrelation identity
    rho1 = (1+phi*theta)(phi+theta)/(1+2*phi*theta+theta^2)
    must reproduce the measured r1 — a sign slip in the root choice or
    a transposed coefficient in B breaks the identity immediately."""
    rows = _q("ts_arma11_moments", spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        if r["theta"] is None:
            assert not r["invertible"]
            continue
        assert r["invertible"]
        assert abs(r["theta"]) <= 1.0 + 1e-9
        phi, theta = r["phi"], r["theta"]
        rho1_back = ((1 + phi * theta) * (phi + theta)) / (
            1 + 2 * phi * theta + theta * theta
        )
        # r1/phi/theta are all 4dp-floored; the identity holds to the
        # accumulated quantization (~1e-3 through the nonlinear map).
        assert abs(rho1_back - r["r1"]) < 5e-3, (r["event_type"], rho1_back, r["r1"])


def test_arma11_phi_is_rho_ratio(spark):
    """phi-hat = rho2/rho1 by construction (ARMA(1,1): rho2 = phi*rho1):
    the emitted phi times r1 must reproduce r2 within quantization."""
    for r in _q("ts_arma11_moments", spark, SF_CORRECT).collect():
        if r["phi"] is None:
            continue
        assert abs(r["phi"] * r["r1"] - r["r2"]) < 5e-4, r


# --- scan_mbox ---------------------------------------------------------------


def test_mbox_quoting_is_engaged_and_split_safe(spark):
    """The rendered mailbox blobs must actually CONTAIN >From escapes
    (the planted % 4 and % 9 slices), and the number of unescaped
    postmarks must equal the message count — i.e. the escapes are what
    keeps the postmark split exact. A renderer that forgot to quote
    would make n_postmarks > n_msgs and the parse (and this pin) would
    catch it before the oracle does."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    docs = load(spark, SF_SMOKE, "documents")
    # Rebuild the op's blob relation via the registered op's own module
    # path: run the op (exercises render+parse), then independently
    # check the raw render for escape bytes.
    out = {r["source"]: r for r in _q("scan_mbox", spark, SF_SMOKE).collect()}
    n_docs = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert sum(r["n_quoted_lines"] for r in out.values()) > 0
    for src, r in out.items():
        assert r["n_msgs"] == n_docs[src]
        assert r["n_blobs"] == 5  # doc_id % 5 bucketing


def test_mbox_body_bytes_exclude_escape_bytes(spark):
    """body_bytes counts UNQUOTED bytes: the '>' escape prefixes are
    writer artifacts, not content. Quoted lines exist on the % 4 / % 9
    slices, so if the parser forgot to strip them, body_bytes would
    exceed the oracle's closed form by exactly n_quoted_lines — pin the
    subtraction via the closed form on one source."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    docs = load(spark, SF_SMOKE, "documents").filter("source = 'src0'")
    expect = docs.selectExpr(
        "CASE WHEN doc_id % 9 = 0 THEN 58"
        " ELSE least(60, length(text)) END"
        " + 1 + CASE WHEN doc_id % 4 = 0 THEN 15 ELSE 7 END AS b"
    ).agg(F.sum("b")).collect()[0][0]
    got = [
        r
        for r in _q("scan_mbox", spark, SF_SMOKE).collect()
        if r["source"] == "src0"
    ][0]
    assert got["body_bytes"] == expect


# --- multimodal_decode_ico ---------------------------------------------------


def test_ico_decoder_unit_roundtrip():
    """Direct kernel pin: a doc on the PNG slice must dispatch its first
    icon to the PNG decoder and the rest to the DIB branch; the planted
    transparent pixel appears exactly once per even-doc DIB icon."""
    from cdc_pubsub_spark.llmops.multimodal import _synth_ico, decode_ico

    icons = decode_ico(_synth_ico(300))  # 300 % 5 == 0, % 2 == 0, 1 icon
    assert icons[0]["kind"] == "png"
    assert icons[0]["n_transparent"] == 0
    icons = decode_ico(_synth_ico(302))  # 3 icons, all DIB, even doc
    assert [i["kind"] for i in icons] == ["dib", "dib", "dib"]
    assert all(i["n_transparent"] == 1 for i in icons)
    icons = decode_ico(_synth_ico(301))  # odd doc: opaque masks
    assert all(i["n_transparent"] == 0 for i in icons)


def test_ico_decoder_rejects_corruption():
    """Dead-letter stance: a flipped container type or a truncated
    payload raises instead of emitting garbage."""
    from cdc_pubsub_spark.llmops.multimodal import _synth_ico, decode_ico

    good = _synth_ico(7)
    bad_type = b"\x00\x00\x02\x00" + good[4:]
    with pytest.raises(ValueError):
        decode_ico(bad_type)
    with pytest.raises(ValueError):
        decode_ico(good[: len(good) - 10])


def test_ico_icon_count_and_png_slice(spark):
    """Per-icon fan-out: sum over docs of (1 + doc_id % 3) rows; the
    kind='png' population is exactly the doc_id % 5 == 0 slice's first
    icons."""
    from pyspark.sql import functions as F

    df = _q("multimodal_decode_ico", spark, SF_SMOKE)
    rows = df.collect()
    expect = sum(1 + d % 3 for d in range(0, 301))
    assert len(rows) == expect
    png = [r for r in rows if r["kind"] == "png"]
    assert {r["doc_id"] % 5 for r in png} == {0}
    assert all(r["icon_idx"] == 0 for r in png)
    assert len(png) == len({r["doc_id"] for r in png}) == 61  # 0,5,...,300


# --- cdc_tombstone_compaction ------------------------------------------------


def test_tombstone_partition_is_exact(spark):
    """The three compaction classes partition the key space: their
    n_keys must sum to the distinct key count, tombstone classes carry
    zero value checksum (deletes have no payload), and the tombstone
    population is exactly the planted key % 5 slice — a compactor that
    classified on 'has any tombstone version' would also sweep in the
    key % 7 re-insert slice and break this equality."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = {r["status"]: r for r in _q("cdc_tombstone_compaction", spark, SF_CORRECT).collect()}
    assert set(rows) == {"live", "tombstone_purged", "tombstone_retained"}
    orders = load(spark, SF_CORRECT, "orders")
    n_keys = orders.select("o_orderkey").distinct().count()
    assert sum(r["n_keys"] for r in rows.values()) == n_keys
    n_tomb = (
        orders.select("o_orderkey")
        .distinct()
        .filter("o_orderkey % 5 = 0")
        .count()
    )
    assert (
        rows["tombstone_purged"]["n_keys"]
        + rows["tombstone_retained"]["n_keys"]
        == n_tomb
    )
    assert rows["tombstone_purged"]["val_checksum"] == 0
    assert rows["tombstone_retained"]["val_checksum"] == 0
    assert rows["live"]["val_checksum"] > 0
    # Superseded accounting: dropped versions across classes = total
    # feed rows minus one surviving version per key.
    total_versions = (
        orders.selectExpr("o_orderkey % 3 + 1 AS v").agg(F.sum("v")).collect()[0][0]
    )
    assert (
        sum(r["n_superseded_dropped"] for r in rows.values())
        == total_versions - n_keys
    )


# --- ml_brier_decomposition --------------------------------------------------


def test_brier_murphy_identity_exact(spark):
    """The generalized Brier identity Brier = REL - RES + UNC + WBV
    - 2*WBC holds
    EXACTLY in rational arithmetic. Recompute every term with
    python Fractions from the same integer bin aggregates the op uses;
    the emitted (quantized) components must match the exact values to
    their quantization, and the identity must hold to 0 in Fractions —
    a transposed moment, a dropped term, or a wrong denominator cannot
    pass."""
    from fractions import Fraction as Fr

    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    li = load(spark, SF_CORRECT, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS s",
        "CASE WHEN ((l_orderkey % 1048576) * 2654435761"
        " + l_linenumber * 40503) % 1000"
        " < 150 + 14 * CAST(l_quantity AS BIGINT) THEN 1 ELSE 0 END AS y",
    )
    bins = (
        li.groupBy(F.expr("(150 + 14 * s) div 100").alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("pos"),
            F.sum(F.expr("150 + 14 * s")).alias("sp"),
            F.sum(
                F.expr("CAST(150 + 14 * s AS DECIMAL(38,0)) * (150 + 14 * s)")
            ).alias("spp"),
            F.sum(F.expr("(150 + 14 * s) * y")).alias("spy"),
        )
        .collect()
    )
    D = 1000
    N = sum(int(b["n"]) for b in bins)
    P = sum(int(b["pos"]) for b in bins)
    brier = sum(
        Fr(int(b["spp"]) - 2 * D * int(b["spy"]) + D * D * int(b["pos"]), 1)
        for b in bins
    ) / (N * D * D)
    rel = sum(
        Fr((int(b["pos"]) * D - int(b["sp"])) ** 2, int(b["n"])) for b in bins
    ) / (N * D * D)
    res = sum(
        Fr((int(b["pos"]) * N - int(b["n"]) * P) ** 2, int(b["n"])) for b in bins
    ) / (N * N * N)
    unc = Fr(P * (N - P), N * N)
    wbv = sum(
        Fr(int(b["n"]) * int(b["spp"]) - int(b["sp"]) ** 2, int(b["n"]))
        for b in bins
    ) / (N * D * D)
    wbc = sum(
        Fr(D * (int(b["n"]) * int(b["spy"]) - int(b["sp"]) * int(b["pos"])),
           int(b["n"]))
        for b in bins
    ) / (N * D * D)
    # exact rational identity (generalized 5-term decomposition)
    assert brier == rel - res + unc + wbv - 2 * wbc
    got = _q("ml_brier_decomposition", spark, SF_CORRECT).collect()[0]
    for col, exact in (
        ("brier", brier),
        ("reliability", rel),
        ("resolution", res),
        ("uncertainty", unc),
        ("within_bin_var", wbv),
        ("within_bin_cov", wbc),
    ):
        assert abs(got[col] - float(exact)) < 2e-6, (col, got[col], float(exact))
    # The generator IS the model: reliability sits at the noise floor,
    # resolution carries most of the skill.
    assert got["reliability"] < 0.001
    assert got["resolution"] > 0.01


# --- ml_mcnemar_paired -------------------------------------------------------


def test_mcnemar_partition_and_winner(spark):
    """The 2x2 paired table partitions every row; classifier A (the
    generator's own feature) must dominate classifier B (a feature the
    generator never reads) in every group, with b >> c driving a
    significant chi2; chi2 recomputed from the emitted counts matches
    the emitted value."""
    for r in _q("ml_mcnemar_paired", spark, SF_CORRECT).collect():
        assert (
            r["n_both"] + r["b_only_a"] + r["c_only_b"] + r["n_neither"]
            == r["n"]
        )
        assert r["acc_a"] > r["acc_b"]
        assert r["b_only_a"] > r["c_only_b"]
        assert r["significant"]
        b, c = r["b_only_a"], r["c_only_b"]
        chi2 = (b - c) ** 2 / (b + c)
        assert abs(r["chi2"] - round(chi2, 4)) < 2e-4


# --- ml_kendall_tau ----------------------------------------------------------


def test_kendall_exhaustive_pair_identity(spark):
    """Every unordered row pair is exactly one of: concordant,
    discordant, tied-on-x-only, tied-on-y-only, tied-on-both — so
    C + D + n1 + n2 - n12 = n(n-1)/2 EXACTLY (n1/n2 include both-tied
    pairs; subtracting n12 undoes the double count). This is the pin
    that the dense-grid double cumulative counts every pair once and
    none twice."""
    rows = _q("ml_kendall_tau", spark, SF_CORRECT).collect()
    assert len(rows) == 3
    for r in rows:
        n = r["n_rows"]
        total = (
            r["concordant"]
            + r["discordant"]
            + r["tie_x_pairs"]
            + r["tie_y_pairs"]
            - r["tie_xy_pairs"]
        )
        assert total == n * (n - 1) // 2, r
        assert -1.0 <= r["tau_b"] <= 1.0
        # quantity and line price are positively linked by construction
        assert r["tau_b"] > 0.3, r


def test_kendall_agrees_with_spearman_sign(spark):
    """tau and rho measure the same monotone link: same sign, and
    |tau| <= |rho| on this near-bivariate-monotone fixture (the
    classic tau ~ 2/3 * rho small-correlation relation makes tau the
    smaller of the two here)."""
    tau = {
        r["l_returnflag"]: r["tau_b"]
        for r in _q("ml_kendall_tau", spark, SF_CORRECT).collect()
    }
    rho = {
        r["l_returnflag"]: r["spearman_rho"]
        for r in _q("ml_spearman_rho", spark, SF_CORRECT).collect()
    }
    for g in tau:
        assert tau[g] * rho[g] > 0
        assert abs(tau[g]) < abs(rho[g])


# --- orders_newsvendor_quantile ----------------------------------------------


def test_newsvendor_service_floor_and_order_statistic(spark):
    """The 0.75-fractile stocking level must achieve >= 75% service on
    the history it was fit to (the defining property of the with-ties
    order statistic), stockouts must complement the service count, and
    the level must be an OBSERVED weekly demand value."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    li = load(spark, SF_CORRECT, "lineitem")
    part = load(spark, SF_CORRECT, "part")
    weekly = (
        li.join(part, li.l_partkey == part.p_partkey)
        .selectExpr(
            "p_brand",
            "unix_micros(CAST(l_shipdate AS TIMESTAMP))"
            " div 604800000000 AS wk",
            "CAST(l_quantity AS BIGINT) AS q",
        )
        .groupBy("p_brand", "wk")
        .agg(F.sum("q").alias("demand"))
    )
    observed = {
        (r["p_brand"], r["demand"]) for r in weekly.collect()
    }
    rows = _q("orders_newsvendor_quantile", spark, SF_CORRECT).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["achieved_service"] >= 0.75
        assert (r["p_brand"], r["stock_level"]) in observed
        served = r["n_weeks"] - r["n_stockout_weeks"]
        assert abs(r["achieved_service"] - round(served / r["n_weeks"], 4)) < 2e-4


# --- text_vocab_growth -------------------------------------------------------


def test_vocab_growth_is_monotone_and_heaps_shaped(spark):
    """Cumulative vocabulary is nondecreasing, the final checkpoint
    equals the exact corpus-wide distinct-type count, and the
    type-token ratio FALLS as the corpus grows (Heaps beta < 1) —
    a broken first-occurrence aggregate violates one of these
    immediately."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = sorted(
        _q("text_vocab_growth", spark, SF_CORRECT).collect(),
        key=lambda r: r["checkpoint_pct"],
    )
    assert [r["checkpoint_pct"] for r in rows] == list(range(10, 101, 10))
    for a, b in zip(rows, rows[1:]):
        assert b["vocab_size"] >= a["vocab_size"]
        assert b["tokens_seen"] > a["tokens_seen"]
        assert b["n_docs"] > a["n_docs"]
        assert b["type_token_ratio"] <= a["type_token_ratio"] + 1e-9
    docs = load(spark, SF_CORRECT, "documents")
    truth_vocab = (
        docs.selectExpr("explode(split(text, ' ')) AS w")
        .select("w")
        .distinct()
        .count()
    )
    truth_tokens = docs.selectExpr(
        "size(split(text, ' ')) AS n"
    ).agg(F.sum("n")).collect()[0][0]
    assert rows[-1]["vocab_size"] == truth_vocab
    assert rows[-1]["tokens_seen"] == truth_tokens


# --- graph_rich_club ---------------------------------------------------------


def test_rich_club_monotone_and_guarded(spark):
    """Raising k can only shrink the club: n_rich and e_rich are
    non-increasing in k; phi stays in [0,1]; and the planted degree
    ceiling (max 8 at sf0.01) leaves the k=10 club empty, so the
    < 2-member NULL guard fires in-fixture."""
    rows = sorted(
        _q("graph_rich_club", spark, SF_CORRECT).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [2, 3, 4, 6, 10]
    for a, b in zip(rows, rows[1:]):
        assert b["n_rich"] <= a["n_rich"]
        assert b["e_rich"] <= a["e_rich"]
    for r in rows:
        if r["phi"] is not None:
            assert 0.0 <= r["phi"] <= 1.0
    assert rows[0]["phi"] is not None and rows[0]["n_rich"] > 2
    assert rows[-1]["n_rich"] < 2 and rows[-1]["phi"] is None


# --- scan_ics_calendar -------------------------------------------------------


def test_ics_folding_populations_and_checksums(spark):
    """Both folded and unfolded VEVENTs must exist (the fold condition
    is length-dependent by construction), and the parsed UID checksum
    must equal the source event_id sum per type — i.e. every event
    survives the render -> fold -> blob -> split -> unfold -> parse
    round trip exactly once."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    ev = load(spark, SF_CORRECT, "events")
    truth = {
        r["event_type"]: (r["n"], r["s_id"], r["s_user"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("event_id").alias("s_id"),
            F.sum("user_id").alias("s_user"),
        )
        .collect()
    }
    rows = _q("scan_ics_calendar", spark, SF_CORRECT).collect()
    assert len(rows) == len(truth)
    for r in rows:
        n, s_id, s_user = truth[r["event_type"]]
        assert r["n_events"] == n
        assert r["uid_checksum"] == s_id
        assert r["user_checksum"] == s_user
        assert 0 < r["n_folded"] < n  # both populations planted


# --- multimodal_decode_pbm ---------------------------------------------------


def test_pbm_decoder_unit_known_bits():
    """Hand-check the P4 bit unpack on a 9x1 bitmap with a known
    pattern: 9 columns need 2 bytes per row, the second byte carries
    ONE pixel (MSB) and 7 padding bits — an LSB-first reader or one
    that forgets the row pad lands different black positions."""
    from cdc_pubsub_spark.llmops.multimodal import decode_pbm

    # bits: 1 0 1 0 0 0 0 0 | 1 (j=0,2,8 black)
    payload = b"P4\n9 1\n" + bytes([0b10100000, 0b10000000])
    out = decode_pbm(payload)
    assert (out["width"], out["height"]) == (9, 1)
    assert out["n_black"] == 3
    assert out["black_j_checksum"] == 0 + 2 + 8


def test_pbm_roundtrip_and_corruption():
    """Synth/decode agree with the closed form for both encodings;
    truncation and alien raster characters raise (dead-letter
    stance)."""
    import pytest as _pytest

    from cdc_pubsub_spark.llmops.multimodal import (
        _pbm_bit,
        _synth_pbm,
        decode_pbm,
    )

    for doc in (6, 7, 12, 13):  # P4 even / P1 odd, with/without comment
        w, h = 9 + doc % 9, 3 + doc % 5
        out = decode_pbm(_synth_pbm(doc))
        assert (out["width"], out["height"]) == (w, h)
        assert out["n_black"] == sum(
            _pbm_bit(doc, j) for j in range(w * h)
        )
        assert out["black_j_checksum"] == sum(
            j for j in range(w * h) if _pbm_bit(doc, j)
        )
    with _pytest.raises(ValueError):
        decode_pbm(_synth_pbm(6)[:-1])
    with _pytest.raises(ValueError):
        decode_pbm(b"P1\n2 2\n01x1\n")


# --- wave D: ts stationarity / drift -----------------------------------------


def test_kpss_telescoping_and_verdict(spark):
    """The demeaned partial sums telescope to zero at t = n (an exact
    integer identity of the n-scaled deviations), eta is positive, and
    this fixture's mean-reverting dailies must test LEVEL-STATIONARY
    for every type at the 5% critical value."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = _q("ts_kpss_level", spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["kpss_eta"] is not None and r["kpss_eta"] > 0
        assert r["is_level_stationary"]
        assert r["kpss_eta"] <= 0.463
    daily = (
        load(spark, SF_CORRECT, "events")
        .selectExpr(
            "event_type",
            "CAST(date_trunc('DAY', ts) AS DATE) AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.expr("CAST(floor(sum(value)*100 + 0.5) AS BIGINT)").alias("x"))
    )
    tele = (
        daily.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s"))
        .join(daily, "event_type")
        .selectExpr("event_type", "n * x - s AS e")
        .groupBy("event_type")
        .agg(F.sum("e").alias("s_n"))
        .collect()
    )
    assert all(r["s_n"] == 0 for r in tele)


def test_page_hinkley_nonneg_and_split_populations(spark):
    """PH_t >= 0 by construction, so ph_max is nonnegative; the
    mean-relative calibration must produce BOTH alarming and quiet
    series on this fixture (an absolute threshold saturates — the bug
    the calibration pass caught); alarm accounting is consistent."""
    rows = _q("events_page_hinkley_drift", spark, SF_CORRECT).collect()
    assert len(rows) == 5
    alarmed = [r for r in rows if r["n_alarm_days"] > 0]
    quiet = [r for r in rows if r["n_alarm_days"] == 0]
    assert alarmed and quiet, rows
    for r in rows:
        assert r["ph_max_ppm"] >= 0
        if r["n_alarm_days"] > 0:
            assert r["ph_max_ppm"] > 600000
            assert 1 <= r["first_alarm_t"] <= r["n_days"]
        else:
            assert r["ph_max_ppm"] <= 600000
            assert r["first_alarm_t"] is None


def test_variance_ratio_identity_and_verdict(spark):
    """VR(1) == 1 exactly through the full machinery (the bias factor
    n1^2/(1*n1^2) and g1/g1 both cancel); the fixture's mean-reverting
    dailies (independent daily draws => differences are negatively
    autocorrelated) land VR(2) < 1, agreeing with ts_kpss_level from
    the opposite test direction."""
    rows = _q("ts_variance_ratio", spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["vr1"] == 1.0
        assert r["vr2"] is not None and r["vr2"] < 1.0
        assert r["is_mean_reverting"]
        assert r["vr4"] is not None and r["vr4"] > 0


def test_record_stats_first_day_convention_and_harmonic(spark):
    """Day 1 is both a high and a low record (counts >= 1), counts are
    bounded by n_days, and the ppb-integer harmonic fold reproduces
    H_n to its quantization."""
    rows = _q("ts_record_stats", spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        n = r["n_days"]
        assert 1 <= r["n_records_hi"] <= n
        assert 1 <= r["n_records_lo"] <= n
        h_n = sum(1.0 / t for t in range(1, n + 1))
        assert abs(r["expected_records"] - h_n) < 1e-3
        # i.i.d.-looking dailies: record counts should not wildly
        # exceed the null expectation on this fixture
        if r["hi_trending"]:
            assert r["n_records_hi"] > 2 * h_n - 1


# --- wave E: plan-shape variety ----------------------------------------------


def test_interval_stabbing_matches_brute_force(spark):
    """The two-histogram sweep must equal the brute-force
    point-in-interval count on a sample of hours — including boundary
    hours where starts land exactly on the hour (the planted 3-minute
    grid makes start % 3600 == 0 real), pinning the <= / > boundary
    conventions."""
    from cdc_pubsub_spark.tables import load

    iv = [
        (r["start_s"], r["end_s"])
        for r in load(spark, SF_SMOKE, "events")
        .selectExpr(
            "CASE WHEN event_id % 50 = 0"
            " THEN unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"
            " div 3600 * 3600"
            " ELSE unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"
            " END AS start_s",
            "event_id",
        )
        .selectExpr(
            "start_s",
            "start_s + (1 + event_id % 120) * 60 AS end_s",
        )
        .collect()
    ]
    got = {
        r["hour_idx"]: r["n_stabbing"]
        for r in _q("events_interval_stabbing", spark, SF_SMOKE).collect()
    }
    assert any(s % 3600 == 0 for s, _ in iv)  # boundary starts planted
    hours = sorted(got)
    for h in hours[:3] + hours[len(hours) // 2 : len(hours) // 2 + 3]:
        p = h * 3600
        brute = sum(1 for s, e in iv if s <= p < e)
        assert got[h] == brute, (h, got[h], brute)
    # hours with zero stabbing are filtered out
    assert all(v > 0 for v in got.values())


def test_token_budget_prefix_rule(spark):
    """Fractional-knapsack prefix structure: full caps before the
    knee, zero after, exactly one partial knee at most; the grand
    total equals min(budget, sum of caps)."""
    rows = sorted(
        _q("corpus_token_budget_allocation", spark, SF_CORRECT).collect(),
        key=lambda r: r["rnk"],
    )
    assert len(rows) == 20
    total_alloc = sum(r["allocated"] for r in rows)
    budget = sum(r["tokens_available"] for r in rows) * 4 // 10
    cap_sum = sum(r["cap"] for r in rows)
    assert total_alloc == min(budget, cap_sum)
    seen_partial = False
    for r in rows:
        if r["fully_taken"]:
            assert not seen_partial  # full caps form a prefix
            assert r["allocated"] == r["cap"]
        else:
            if r["allocated"] > 0:
                assert not seen_partial  # at most one knee
                seen_partial = True
            assert r["allocated"] < r["cap"]


def test_fd_confidence_spectrum(spark):
    """The key-LHS candidate is exactly functional (confidence 1.0,
    is_exact); the near-independent candidates sit strictly below; and
    confidence is always >= the reciprocal-domain floor and <= 1."""
    rows = {r["fd_name"]: r for r in _q("profile_fd_confidence", spark, SF_CORRECT).collect()}
    assert set(rows) == {
        "orderkey_to_status",
        "custkey_to_priority",
        "custkey_to_status",
        "year_to_priority",
    }
    assert rows["orderkey_to_status"]["is_exact_fd"]
    assert rows["orderkey_to_status"]["confidence"] == 1.0
    for name in ("custkey_to_priority", "year_to_priority"):
        r = rows[name]
        assert not r["is_exact_fd"]
        assert r["confidence"] < 0.9
        assert r["confidence"] > 0.1
    # orderkey LHS has one group per row (the PK control)
    assert (
        rows["orderkey_to_status"]["n_lhs_groups"]
        == rows["orderkey_to_status"]["n_rows"]
    )


def test_knapsack_prefix_structure_and_capacity(spark):
    """Greedy structure: classes are taken full from the highest
    density down to a single partial knee, nothing after; the taken
    weight never exceeds capacity but taking ONE more item from the
    knee would overflow (prefix maximality)."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = sorted(
        _q("orders_greedy_knapsack", spark, SF_CORRECT).collect(),
        key=lambda r: -r["density"],
    )
    assert [r["density"] for r in rows] == [5, 4, 3, 2, 1]
    items = load(spark, SF_CORRECT, "orders").selectExpr(
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w"
    )
    cap = items.agg(F.expr("sum(w) div 10")).collect()[0][0]
    taken = sum(r["weight_taken"] for r in rows)
    assert taken <= cap
    statuses = [r["class_status"] for r in rows]
    # full* [partial] none* — a prefix pattern
    import re

    assert re.fullmatch(r"(full )*(partial )?(none ?)*", " ".join(statuses) + " ")
    # exact replay: recompute the greedy prefix in python and match
    # per-class taken counts/weights item for item
    its = sorted(
        (
            (-int(r["density"]), int(r["k"]), int(r["w"]))
            for r in load(spark, SF_CORRECT, "orders")
            .selectExpr(
                "o_orderkey AS k",
                "6 - CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"
                " AS density",
                "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w",
            )
            .collect()
        )
    )
    cum, by_class = 0, {}
    for negd, _, w in its:
        cum += w
        if cum <= cap:
            n, tw = by_class.get(-negd, (0, 0))
            by_class[-negd] = (n + 1, tw + w)
    for r in rows:
        n, tw = by_class.get(r["density"], (0, 0))
        assert r["n_taken"] == n, (r["density"], r["n_taken"], n)
        assert r["weight_taken"] == tw
        assert r["value_taken"] == tw * r["density"]


# --- wave F ------------------------------------------------------------------


def test_max_drawdown_brute_force_replay(spark):
    """Recompute max drawdown, earliest trough, earliest prior peak,
    and recovery in python from the daily series — the op must match
    exactly (all-integer op, so equality is exact)."""
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
        series.setdefault(r["event_type"], []).append(
            (r["day_idx"], r["x"])
        )
    got = {r["event_type"]: r for r in _q("ts_max_drawdown", spark, SF_CORRECT).collect()}
    for et, pts in series.items():
        pts.sort()
        peak, best, trough_day, peak_val = None, -1, None, None
        run = -(10**18)
        for d, x in pts:
            run = max(run, x)
            if run - x > best:
                best, trough_day, peak_val = run - x, d, run
        peak_day = min(d for d, x in pts if x == peak_val and d <= trough_day)
        recovered = any(
            x >= peak_val for d, x in pts if d > trough_day
        )
        g = got[et]
        assert g["max_drawdown_cents"] == best
        assert g["trough_day"] == trough_day
        assert g["peak_day"] == peak_day
        assert g["recovered"] == recovered


def test_wilson_contains_rate_and_clamps(spark):
    """Containment lo <= rate <= hi; Wilson bounds stay in [0, 1];
    with rates near 1 on this fixture, Wilson's lower bound sits BELOW
    Wald's (the score interval pulls toward 1/2 — the asymmetry Wald
    lacks), and the interval narrows as n grows across segments."""
    rows = _q("orders_wilson_ci_conversion", spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0
        assert r["wilson_lo"] < r["wald_lo"] or r["rate"] < 0.5
        width = r["wilson_hi"] - r["wilson_lo"]
        assert width > 0


def test_qp_kernel_roundtrip_and_hazards():
    """The encoder actually plants soft breaks and escapes; the
    decoder reproduces the source text's length/checksum; processing
    escapes before unwrapping breaks (the classic QP bug) is
    detected as malformed input."""
    import pytest as _pytest

    from cdc_pubsub_spark.llmops.multimodal import _synth_qp, decode_qp

    text = "word " * 30
    enc = _synth_qp(7, text)
    assert b"=\r\n" in enc  # soft breaks planted
    out = decode_qp(enc)
    src = text[:80]
    assert out["decoded_len"] == len(src)
    assert out["char_checksum"] == sum(ord(c) for c in src)
    assert out["n_escaped"] == sum(
        1 for j in range(len(src)) if (7 + j) % 7 == 0
    )
    with _pytest.raises(ValueError):
        decode_qp(b"abc=Z9def")
    # a soft break mid-stream must NOT be treated as an escape
    assert decode_qp(b"ab=\r\ncd")["decoded_len"] == 4


def test_cuped_theta_exact_and_variance_identity(spark):
    """Re-derive pooled theta with Fractions from per-user integer
    revenues; the op's theta matches to its micro quantization, the
    adjusted-mean identity holds, and the POOLED variance ratio is
    <= 1 (pooled theta is the pooled-OLS minimizer; per-variant ratios
    may wobble above 1 only by quantization)."""
    from fractions import Fraction as Fr

    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    pu = (
        load(spark, SF_CORRECT, "events")
        .selectExpr(
            "user_id",
            "CASE WHEN CAST(date_trunc('DAY', ts) AS DATE)"
            " < DATE'2024-01-16'"
            " THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END AS xc",
            "CASE WHEN CAST(date_trunc('DAY', ts) AS DATE)"
            " >= DATE'2024-01-16'"
            " THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END AS yc",
        )
        .groupBy("user_id")
        .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y"))
        .collect()
    )
    n = len(pu)
    sx = sum(int(r["x"]) for r in pu)
    sy = sum(int(r["y"]) for r in pu)
    sxy = sum(int(r["x"]) * int(r["y"]) for r in pu)
    sxx = sum(int(r["x"]) ** 2 for r in pu)
    theta = Fr(n * sxy - sx * sy, n * sxx - sx * sx)
    rows = _q("events_ab_cuped", spark, SF_CORRECT).collect()
    assert len(rows) == 2
    for r in rows:
        assert abs(r["theta"] - float(theta)) < 2e-6
        assert r["var_ratio"] <= 1.01  # per-variant wobble bound
    # pooled reduction: weighted ratio strictly below 1 when theta != 0
    if theta != 0:
        assert any(r["var_ratio"] < 1.0 for r in rows)


# --- wave G ------------------------------------------------------------------


def test_inventory_policy_eoq_identity(spark):
    """EOQ must satisfy its defining identity EOQ^2 = 2*D*S/H (D =
    annualized mean weekly demand, S = 100, H = 2) to rounding, and
    the reorder point must exceed lead-time demand by exactly the
    safety stock."""
    rows = _q("orders_inventory_policy", spark, SF_CORRECT).collect()
    assert len(rows) == 25
    for r in rows:
        d_weekly = r["total_demand"] / r["n_weeks"]
        eoq_sq_expected = 2 * 52 * d_weekly * 100 / 2
        assert abs(r["eoq_units"] ** 2 - eoq_sq_expected) < eoq_sq_expected * 1e-3
        mu_l = 2 * d_weekly
        assert (
            abs(r["reorder_point_units"] - (mu_l + r["safety_stock_units"]))
            < 0.05
        )
        assert r["safety_stock_units"] >= 0


def test_yoy_first_year_null_and_exact_ratio(spark):
    """The first 12 months carry NULL growth; afterwards the ratio
    recomputes exactly from the emitted revenue levels."""
    rows = sorted(
        _q("orders_yoy_growth", spark, SF_CORRECT).collect(),
        key=lambda r: (r["year"], r["month"]),
    )
    by_ym = {(r["year"], r["month"]): r for r in rows}
    for i, r in enumerate(rows):
        prev = by_ym.get((r["year"] - 1, r["month"]))
        if prev is None:
            assert r["yoy_revenue_growth"] is None
        else:
            expect = prev and (r["revenue_cents"] / prev["revenue_cents"] - 1)
            assert abs(r["yoy_revenue_growth"] - expect) < 2e-4
    assert sum(1 for r in rows if r["yoy_revenue_growth"] is None) == 12


def test_ulid_lex_order_is_time_order(spark):
    """ULID's design property: the lexicographic minimum of the
    rendered ids equals the render of the EARLIEST event (timestamp
    prefix dominates), and parsed ms checksums equal the direct
    epoch-ms sums — the full parse chain is load-bearing."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load
    from cdc_pubsub_spark.functions.scalar import _ulid_exprs

    render, _, _ = _ulid_exprs("spark")
    ev = load(spark, SF_CORRECT, "events")
    truth = {
        r["event_type"]: (r["s_ms"], r["u_first"])
        for r in ev.selectExpr(
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ms",
            f"{render} AS u",
        )
        .groupBy("event_type")
        .agg(
            F.sum("ms").alias("s_ms"),
            F.expr("min_by(u, struct(ms, u))").alias("u_first"),
        )
        .collect()
    }
    for r in _q("fn_ulid_roundtrip", spark, SF_CORRECT).collect():
        s_ms, u_first = truth[r["event_type"]]
        assert r["ms_checksum"] == s_ms
        assert r["lex_min_ulid"] == u_first
        assert len(r["lex_min_ulid"]) == 26


def test_replication_lag_straggler_and_order_stats(spark):
    """Partition 3 is the planted straggler: breach rate 1.0 and p50
    above the healthy partitions' p99; healthy partitions never breach
    (max planted lag 449 ms < 1 s SLA); order statistics are
    internally ordered min <= p50 <= p99 <= max."""
    rows = {r["partition_id"]: r for r in _q("cdc_replication_lag", spark, SF_CORRECT).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for pid, r in rows.items():
        assert (
            r["lag_min_ms"]
            <= r["lag_p50_ms"]
            <= r["lag_p99_ms"]
            <= r["lag_max_ms"]
        )
        if pid == 3:
            assert r["breach_rate"] == 1.0
            assert r["lag_p50_ms"] > max(
                rows[p]["lag_p99_ms"] for p in (0, 1, 2)
            )
        else:
            assert r["n_sla_breaches"] == 0
            assert r["lag_max_ms"] < 1000


# --- wave H ------------------------------------------------------------------


def test_phone_normalize_all_formats_ok(spark):
    """Every rendered number in every format class must normalize to
    its exact expected E.164 (n_normalized_ok == n), and the three
    format classes partition the user population."""
    from cdc_pubsub_spark.tables import load

    rows = _q("fn_phone_e164_normalize", spark, SF_CORRECT).collect()
    assert {r["format_class"] for r in rows} == {0, 1, 2}
    n_users = (
        load(spark, SF_CORRECT, "events").select("user_id").distinct().count()
    )
    assert sum(r["n"] for r in rows) == n_users
    for r in rows:
        assert r["n_normalized_ok"] == r["n"]
        assert r["digits_checksum"] > 0


def test_duplicate_payments_banded_recall_replay(spark):
    """Recall-1 of the (customer, week)-banded candidate join: a
    direct python replay over one customer slice finds exactly the
    suspect pairs the op counts (pigeonhole: a <=7-day window spans at
    most two 7-day buckets)."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    pay = (
        load(spark, SF_CORRECT, "orders")
        .selectExpr(
            "o_orderkey AS k",
            "o_custkey AS cust",
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
            " AS BIGINT) AS day_idx",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .collect()
    )
    by_cust: dict = {}
    for r in pay:
        by_cust.setdefault(r["cust"], []).append(
            (r["day_idx"], r["k"], r["cents"])
        )
    n_suspect = checksum = 0
    for pts in by_cust.values():
        pts.sort()
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                da, ka, ca = pts[i]
                db, kb, cb = pts[j]
                if db - da > 7:
                    break
                if abs(cb - ca) * 100 <= ca:
                    n_suspect += 1
                    checksum += ka + kb
    got = _q("orders_duplicate_payments", spark, SF_CORRECT).collect()[0]
    assert got["n_suspect_pairs"] == n_suspect
    assert got["pair_checksum"] == checksum
    assert got["n_suspect_pairs"] > 0  # population exists at sf0.01


def test_ngram_saturation_monotone_and_bigram_identity(spark):
    """Saturation and singleton share rise with n; the exact identity
    total_2gram = total_1gram - n_docs holds (each doc of L tokens
    contributes L-1 bigrams)."""
    from cdc_pubsub_spark.tables import load

    rows = {r["ngram_order"]: r for r in _q("text_ngram_saturation", spark, SF_CORRECT).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["saturation"] < rows[2]["saturation"] < rows[3]["saturation"]
    assert (
        rows[1]["singleton_share"]
        < rows[2]["singleton_share"]
        < rows[3]["singleton_share"]
    )
    n_docs = load(spark, SF_CORRECT, "documents").count()
    assert rows[2]["total_ngrams"] == rows[1]["total_ngrams"] - n_docs
    assert rows[3]["total_ngrams"] == rows[2]["total_ngrams"] - n_docs


def test_anova_decomposition_exact(spark):
    """SST = SSB + SSW exactly in Fractions from the daily series; the
    emitted F and eta^2 match the exact values to quantization."""
    from fractions import Fraction as Fr

    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF_CORRECT, "events")
        .selectExpr(
            "(unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000) % 7 AS dow",
            "CAST(date_trunc('DAY', ts) AS DATE) AS d",
            "value",
        )
        .groupBy("d", "dow")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    xs = [(int(r["dow"]), int(r["x"])) for r in daily]
    n = len(xs)
    s = sum(x for _, x in xs)
    groups: dict = {}
    for g, x in xs:
        groups.setdefault(g, []).append(x)
    k = len(groups)
    sst = sum(Fr(x, 1) ** 2 for _, x in xs) - Fr(s * s, n)
    ssb = sum(
        Fr(sum(v) ** 2, len(v)) for v in groups.values()
    ) - Fr(s * s, n)
    ssw = sum(
        sum(Fr(x, 1) ** 2 for x in v) - Fr(sum(v) ** 2, len(v))
        for v in groups.values()
    )
    assert sst == ssb + ssw  # exact decomposition
    f_exact = (ssb / (k - 1)) / (ssw / (n - k))
    eta_exact = ssb / sst
    got = _q("events_anova_dow", spark, SF_CORRECT).collect()[0]
    assert got["n_days"] == n and got["n_groups"] == k
    assert abs(got["f_stat"] - float(f_exact)) < 5e-3
    assert abs(got["eta_squared"] - float(eta_exact)) < 5e-5
    assert got["significant_5pct"] == (float(f_exact) > 2.51)


# --- wave I ------------------------------------------------------------------


def test_robots_longest_match_shadow(spark):
    """The doc_id % 4 == 1 slice lives in the allow-overrides-disallow
    shadow (/data/public/ under /data/): every one of those requests
    must be ALLOWED — a first-match or shortest-match evaluator blocks
    them all. The %4==0 slice is blocked, %4==3 is untouched
    (no-match default allow)."""
    from cdc_pubsub_spark.tables import load

    docs = load(spark, SF_SMOKE, "documents").selectExpr(
        "source", "doc_id", "doc_id % 4 AS cls"
    ).collect()
    expect_allowed: dict = {}
    for r in docs:
        src = r["source"]
        a, d = expect_allowed.get(src, (0, 0))
        # cls 1 (shadow allow) and cls 3 (no match) are allowed;
        # cls 0 (broad disallow) and cls 2 (tmp disallow) blocked.
        if r["cls"] in (1, 3):
            a += 1
        else:
            d += 1
        expect_allowed[src] = (a, d)
    for r in _q("scan_robots_txt_compliance", spark, SF_SMOKE).collect():
        a, d = expect_allowed[r["source"]]
        assert r["n_allowed"] == a, r
        assert r["n_disallowed"] == d, r


def test_fx_base_identity_and_triangulation(spark):
    """Currency 0 (USD, rate 1.0) converts to itself exactly; the
    triangulated EUR totals agree with converting the aggregate (the
    per-order truncation is < 1 cent per order)."""
    rows = {r["curr_id"]: r for r in _q("orders_fx_normalize", spark, SF_CORRECT).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[0]["usd_cents"] == rows[0]["native_cents"]
    rate = {c: (1000000 if c == 0 else 200000 + c * 337000) for c in range(5)}
    for c, r in rows.items():
        agg_eur = r["native_cents"] * rate[c] // rate[3]
        assert abs(r["eur_cents"] - agg_eur) <= r["n_orders"]
        # currency 3 to itself: rate_c/rate_3 == 1
        if c == 3:
            assert abs(r["eur_cents"] - r["native_cents"]) <= r["n_orders"]


def test_learning_curve_nested_and_converging(spark):
    """Slices are nested md5 buckets: n grows ~2x per step; the slope
    estimate converges (25% within 5% of the full fit) and R^2 is
    stable — the flat-curve signature of a bias-limited model."""
    rows = {r["frac_pct"]: r for r in _q("ml_learning_curve_ols", spark, SF_CORRECT).collect()}
    assert set(rows) == {25, 50, 100}
    assert rows[25]["n_train"] < rows[50]["n_train"] < rows[100]["n_train"]
    assert abs(rows[50]["n_train"] / rows[25]["n_train"] - 2) < 0.2
    full = rows[100]["slope_net_per_gross"]
    assert abs(rows[25]["slope_net_per_gross"] - full) / abs(full) < 0.02
    for r in rows.values():
        assert 0 <= r["r_squared"] <= 1
        # net price rises with gross at ~ the mean discount complement
        assert 0.9 < r["slope_net_per_gross"] < 1.0
        assert r["r_squared"] > 0.98
    assert abs(rows[25]["r_squared"] - rows[100]["r_squared"]) < 0.02


def test_join_estimate_width1_exact_and_degrading(spark):
    """The per-value histogram (width 1) estimates the join size
    EXACTLY (Sum c_o(k)*c_l(k) IS the join size); wider buckets only
    add error (weakly monotone here)."""
    rows = {r["bucket_width"]: r for r in _q("profile_join_cardinality_estimate", spark, SF_CORRECT).collect()}
    assert set(rows) == {1, 64, 4096}
    assert rows[1]["est_rows"] == rows[1]["actual_rows"]
    assert rows[1]["rel_error"] == 0.0
    assert rows[64]["rel_error"] <= rows[4096]["rel_error"] + 1e-9
    actual = {r["actual_rows"] for r in rows.values()}
    assert len(actual) == 1  # same ground truth every row
