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


def test_bullwhip_cv2_python_replay(spark):
    """Replay CV^2 of both monthly series exactly from raw rows; pin
    the ratio identity and the amplified flag."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    orders = load(spark, SF, "orders")
    li = load(spark, SF, "lineitem")
    dem = (
        orders.selectExpr(
            "o_orderpriority AS p",
            "year(o_orderdate) * 12 + month(o_orderdate) AS m",
        )
        .groupBy("p", "m")
        .count()
        .collect()
    )
    sup = (
        li.join(orders.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .selectExpr(
            "o_orderpriority AS p",
            "year(l_shipdate) * 12 + month(l_shipdate) AS m",
            "CAST(l_quantity AS BIGINT) AS q",
        )
        .groupBy("p", "m")
        .agg(F.sum("q").alias("x"))
        .collect()
    )

    def cv2(vals):
        n, s, q = len(vals), sum(vals), sum(v * v for v in vals)
        return (n * q - s * s) / (s * s)

    dser: dict = {}
    for r in dem:
        dser.setdefault(r["p"], []).append(r["count"])
    sser: dict = {}
    for r in sup:
        sser.setdefault(r["p"], []).append(r["x"])
    rows = REGISTRY["orders_bullwhip_ratio"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        cd, cs = cv2(dser[r["o_orderpriority"]]), cv2(sser[r["o_orderpriority"]])
        assert abs(r["cv2_demand"] - cd) < 5e-6
        assert abs(r["cv2_supply"] - cs) < 5e-6
        assert abs(r["bullwhip_ratio"] - cs / cd) < max(5e-6, 2e-5 * cs / cd)
        assert r["amplified"] == (cs > cd)


def test_markov_absorption_numpy_solve_and_total_probability(spark):
    """Solve (I-Q)B = R and (I-Q)t = 1 with numpy from the raw
    transition counts; absorption probabilities must sum to 1 (the
    fixture's chain reaches an absorbing state from everywhere)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from cdc_pubsub_spark.tables import load

    ev = load(spark, SF, "events").selectExpr(
        "user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = (
        ev.select(F.col("event_type").alias("prev"),
                  F.lead("event_type").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("prev", "nxt").count().collect()
    )
    states = ("click", "signup", "view")
    absorbing = ("purchase", "error")
    c = {(r["prev"], r["nxt"]): r["count"] for r in trans}
    t = {s: sum(v for (p, _n), v in c.items() if p == s) for s in states}
    Q = np.array([[c.get((i, j), 0) / t[i] for j in states] for i in states])
    R = np.array([[c.get((i, a), 0) / t[i] for a in absorbing] for i in states])
    B = np.linalg.solve(np.eye(3) - Q, R)
    steps = np.linalg.solve(np.eye(3) - Q, np.ones(3))
    rows = {r["state"]: r for r in
            REGISTRY["events_markov_absorption"].fn(spark, SF).collect()}
    for i, s in enumerate(states):
        r = rows[s]
        assert r["n_out"] == t[s]
        assert abs(r["p_purchase"] - B[i][0]) < 5e-6
        assert abs(r["p_error"] - B[i][1]) < 5e-6
        assert abs(r["p_purchase"] + r["p_error"] - 1.0) < 1e-5, r
        assert abs(r["expected_steps"] - steps[i]) < 5e-5
        assert r["expected_steps"] >= 1


def test_eccentricity_python_bfs_replay(spark):
    """Exact python BFS replay per seed, including the horizon-cap and
    frontier_exhausted semantics."""
    from collections import deque
    from cdc_pubsub_spark.tables import load

    users = sorted(
        r["user_id"]
        for r in load(spark, SF, "events").select("user_id").distinct().collect()
    )
    uset = set(users)
    out = {u: [(u * 7 + 3) % 1000, (u * 13 + 11) % 1000] for u in users}
    rows = {r["seed"]: r for r in
            REGISTRY["graph_eccentricity_sample"].fn(spark, SF).collect()}
    seeds = [u for u in users if u % 4 == 0]
    assert set(rows) == set(seeds)
    H = 8
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= H or u not in uset:
                continue
            for v in out[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        # cap: nodes at distance > H are unreachable within horizon
        reached = {n: d for n, d in dist.items() if d <= H}
        r = rows[s]
        assert r["n_reached"] == len(reached), s
        assert r["ecc_capped"] == max(reached.values()), s
        assert r["frontier_exhausted"] == (max(reached.values()) < H), s


def test_ppm_tga_decoders_reject_corruption(spark):
    """The decode kernels are real parsers: corrupt payloads raise
    instead of returning plausible stats (magic, truncation, RLE
    overrun, maxval)."""
    from cdc_pubsub_spark.llmops.multimodal import (
        _synth_ppm_dual,
        _synth_tga,
        decode_ppm_dual,
        decode_tga,
    )

    good = _synth_ppm_dual(4)
    with pytest.raises(ValueError):
        decode_ppm_dual(b"P4" + good[2:])  # PBM magic is not a PPM
    with pytest.raises(ValueError):
        decode_ppm_dual(good[:-3])  # truncated P6 raster
    bad_maxval = good.replace(b"255", b"100", 1)
    with pytest.raises(ValueError):
        decode_ppm_dual(bad_maxval)
    tga = _synth_tga(7)  # odd -> RLE
    with pytest.raises(ValueError):
        decode_tga(tga[:10])  # truncated header
    with pytest.raises(ValueError):
        decode_tga(bytes([0, 1]) + tga[2:])  # colormapped unsupported
    # flipping one RLE header's length desyncs the packet walk
    broken = bytearray(tga)
    broken[18] = 0x80 | 0x7F  # 128-pixel run overruns the image
    with pytest.raises(ValueError):
        decode_tga(bytes(broken))


def test_tga_hazards_are_load_bearing(spark):
    """A no-BGR-swap reader and a no-row-flip reader must each fail on
    the planted fixtures (means differ / poschk differs)."""
    from cdc_pubsub_spark.llmops.multimodal import _synth_tga, decode_tga

    # doc 5: bottom-up (5 % 5 == 0), RLE (odd)
    f = decode_tga(_synth_tga(5))
    assert f["bottom_up"] and f["rle"]
    # replay WITHOUT the row flip: poschk must differ, means must not
    d, w, h = 5, 4 + 5 % 5, 3 + 5 % 4
    r = 1 + d % 3
    n = w * h
    rs = [(d * 41 + (j // r) * 91) % 256 for j in range(n)]
    gs = [(d * 23 + (j // r) * 73) % 256 for j in range(n)]
    bs = [(d * 19 + (j // r) * 57) % 256 for j in range(n)]
    poschk_noflip = sum((j + 1) * (rs[j] + gs[j] + bs[j]) for j in range(n))
    assert f["mean_r"] == sum(rs) // n  # row-order invariant
    assert f["poschk"] != poschk_noflip  # row-order sensitive
    # doc 2: top-down raw; un-swapped channels flip mean_r/mean_b
    f2 = decode_tga(_synth_tga(2))
    d = 2
    n2 = (4 + d % 5) * (3 + d % 4)
    mean_b_as_r = sum((d * 19 + j * 57) % 256 for j in range(n2)) // n2
    assert f2["mean_r"] != mean_b_as_r


def test_permutation_importance_marginals_and_dominance(spark):
    """The hash-cyclic shift is a true permutation (marginals exactly
    preserved) and permutation collapses the planted signal."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from cdc_pubsub_spark.tables import load

    li = load(spark, SF, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS x1",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2",
        "cast(conv(substr(md5(concat(CAST(l_orderkey AS STRING), '-',"
        " CAST(l_linenumber AS STRING))), 1, 15), 16, 10) as bigint)"
        " AS h",
    )
    w = Window.partitionBy(F.expr("h % 4096")).orderBy("h", "x1", "x2")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sums = (
        li.select(
            "x1",
            F.coalesce(F.lag("x1").over(w), F.last("x1").over(wf)).alias(
                "xp1"
            ),
        )
        .agg(
            F.sum("x1").alias("s"),
            F.sum("xp1").alias("sp"),
            F.sum(F.expr("x1 * x1")).alias("q"),
            F.sum(F.expr("xp1 * xp1")).alias("qp"),
            F.count(F.lit(1)).alias("n"),
            F.count("xp1").alias("np"),
        )
        .collect()[0]
    )
    assert sums["s"] == sums["sp"] and sums["q"] == sums["qp"]
    assert sums["n"] == sums["np"]
    rows = {
        r["feature"]: r
        for r in REGISTRY["ml_permutation_importance_ols"]
        .fn(spark, SF)
        .collect()
    }
    assert rows["discount"]["importance"] > rows["quantity"]["importance"]
    for r in rows.values():
        assert r["r2_perm"] < 0.01, r  # permutation kills the signal
        assert abs(r["importance"] - (r["r2_orig"] - r["r2_perm"])) < 2e-6


def test_spectral_entropy_bounds_and_replay(spark):
    """0 <= normalized entropy <= 1; python replay of entropy and
    flatness from the exact integer energies (same trig table)."""
    import math
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS d",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c0",
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c0").alias("cents"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["cents"]))
    rows = {r["event_type"]: r for r in
            REGISTRY["ts_spectral_entropy"].fn(spark, SF).collect()}
    for et, pts in series.items():
        n = len(pts)
        sx = sum(c for _, c in pts)
        energies = []
        for p in range(2, 29):
            cqs = {r_: int(math.floor(math.cos(2 * math.pi * r_ / p) * 10000 + 0.5)) for r_ in range(p)}
            sqs = {r_: int(math.floor(math.sin(2 * math.pi * r_ / p) * 10000 + 0.5)) for r_ in range(p)}
            sdc = sum((n * c - sx) * cqs[d % p] for d, c in pts)
            sds = sum((n * c - sx) * sqs[d % p] for d, c in pts)
            energies.append(sdc * sdc + sds * sds)
        tot = sum(energies)
        hq = sum(
            int(math.floor(-(e / tot) * math.log(e / tot) * 1e9 + 0.5))
            for e in energies if e > 0
        )
        se = hq / (1e9 * math.log(27))
        r = rows[et]
        assert 0.0 <= r["spectral_entropy_norm"] <= 1.0 + 1e-9
        assert abs(r["spectral_entropy_norm"] - se) < 5e-6
        assert r["n_periods"] == 27
        if r["spectral_flatness"] is not None:
            assert 0.0 <= r["spectral_flatness"] <= 1.0 + 1e-9


def test_granger_numpy_refit(spark):
    """Refit both nested models with numpy per pair; pin F and the
    RSS_u <= RSS_r monotonicity nesting guarantees."""
    import numpy as np
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], {})[r["d"]] = r["x"]
    rows = REGISTRY["ts_granger_lag1"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        ys, cs = series[r["effect"]], series[r["cause"]]
        days = sorted(ys)
        prev = {days[i]: days[i - 1] for i in range(1, len(days))}
        cdays = sorted(cs)
        cprev = {cdays[i]: cdays[i - 1] for i in range(1, len(cdays))}
        rows_abc = [
            (ys[d], ys[prev[d]], cs[cprev[d]])
            for d in days
            if d in prev and d in cprev
        ]
        # op pairs on the SAME day carrying each series' own lag
        a = np.array([t[0] for t in rows_abc], dtype=float)
        b = np.array([t[1] for t in rows_abc], dtype=float)
        c = np.array([t[2] for t in rows_abc], dtype=float)
        n = len(a)
        assert r["n_obs"] == n
        Xr = np.column_stack([np.ones(n), b])
        Xu = np.column_stack([np.ones(n), b, c])
        rss_r = np.sum((a - Xr @ np.linalg.lstsq(Xr, a, rcond=None)[0]) ** 2)
        rss_u = np.sum((a - Xu @ np.linalg.lstsq(Xu, a, rcond=None)[0]) ** 2)
        assert rss_u <= rss_r + 1e-6
        fstat = (n - 3) * (rss_r - rss_u) / rss_u
        assert abs(r["f_stat"] - fstat) < max(1e-3, 1e-3 * abs(fstat)), (
            r, fstat)
        assert r["granger_causal"] == (fstat > 4.3)


def test_homoglyph_collisions_match_plant(spark):
    """Every planted spoof must surface as a collision group; sources
    without planted ids must report zero collisions; raw exact-dedup
    (no skeleton) must NOT see the spoofs as duplicates."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    docs = load(spark, SF, "documents").select("doc_id", "source")
    planted = (
        docs.filter(F.col("doc_id") % 9 == 0)
        .groupBy("source")
        .count()
        .collect()
    )
    planted_by_source = {r["source"]: r["count"] for r in planted}
    rows = {r["source"]: r for r in
            REGISTRY["text_homoglyph_dedup"].fn(spark, SF).collect()}
    for src, r in rows.items():
        expect = planted_by_source.get(src, 0)
        assert r["n_spoofed_docs"] == expect, src
        # each planted doc forms exactly one {original, spoof} collision
        # group (original texts are unique within a source fixture)
        assert r["n_collision_groups"] == expect, src
        assert r["n_skeleton_groups"] == r["n_docs_total"] - expect, src


def test_abc_migration_marginals_and_replay(spark):
    """Row fractions sum to 1 per from-class; the full 3x3 matrix must
    equal an exact python replay of the integer class-boundary rule
    over both halves (cum*100 <= tot*70 / 90, rev-desc cust-asc)."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["orders_abc_migration"].fn(spark, SF).collect()
    from collections import defaultdict

    frac = defaultdict(float)
    for r in rows:
        frac[r["class_from"]] += r["frac_of_from"]
    for cls, s in frac.items():
        assert abs(s - 1.0) < 5e-4, (cls, s)

    raw = (
        load(spark, SF, "orders")
        .selectExpr(
            "o_custkey AS cust",
            "CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'"
            " THEN 1 ELSE 2 END AS half",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .groupBy("half", "cust")
        .agg(F.sum("cents").alias("rev"))
        .collect()
    )
    halves: dict = {1: [], 2: []}
    for r in raw:
        halves[r["half"]].append((r["rev"], r["cust"]))
    cls_of: dict = {}
    for h, lst in halves.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        tot = sum(r for r, _ in lst)
        cum = 0
        for rev, cust in lst:
            cum += rev
            cls_of[(h, cust)] = (
                "A" if cum * 100 <= tot * 70
                else "B" if cum * 100 <= tot * 90 else "C"
            )
    expect = defaultdict(int)
    for (h, cust), c1 in cls_of.items():
        if h == 1 and (2, cust) in cls_of:
            expect[(c1, cls_of[(2, cust)])] += 1
    got = {(r["class_from"], r["class_to"]): r["n_customers"] for r in rows}
    assert got == dict(expect)


def test_mase_python_replay(spark):
    """Replay both backtests exactly from the daily series; pin the
    shared-day-set rule and the ratio."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], {})[r["d"]] = r["x"]
    rows = {r["event_type"]: r for r in
            REGISTRY["events_forecast_backtest_mase"].fn(spark, SF).collect()}
    for et, s in series.items():
        days = [d for d in s if d - 1 in s and d - 7 in s]
        sae7 = sum(abs(s[d] - s[d - 7]) for d in days)
        sae1 = sum(abs(s[d] - s[d - 1]) for d in days)
        r = rows[et]
        assert r["n_backtest"] == len(days)
        assert r["sae_seasonal"] == sae7
        assert r["sae_naive"] == sae1
        if sae1 > 0:
            assert abs(r["relative_mae"] - sae7 / sae1) < 5e-6
            assert r["seasonal_wins"] == (sae7 / sae1 < 1.0)


def test_trigram_jaccard_set_replay(spark):
    """Replay every reported pair's Jaccard from python trigram SETS;
    verify the 0.5 threshold and that no qualifying pair was missed
    (exhaustive over distinct names — the candidate equi-join must
    have recall 1 for any pair with inter >= 1, which >= 0.5 implies)."""
    from cdc_pubsub_spark.tables import load

    names = sorted(
        r["name"]
        for r in load(spark, SF, "part")
        .selectExpr("p_name AS name")
        .distinct()
        .collect()
    )
    tri = {
        n: {n[i : i + 3] for i in range(len(n) - 2)}
        for n in names
        if len(n) >= 3
    }
    expect = {}
    keys = sorted(tri)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(tri[a] & tri[b])
            uni = len(tri[a] | tri[b])
            if inter * 2 >= uni and inter > 0:
                expect[(a, b)] = (inter, uni)
    rows = REGISTRY["join_fuzzy_trigram"].fn(spark, SF).collect()
    got = {(r["name_a"], r["name_b"]): (r["inter"], r["uni"]) for r in rows}
    assert got == expect
    for r in rows:
        assert abs(r["jaccard"] - r["inter"] / r["uni"]) < 1e-4


def test_tar_blob_is_real_ustar(spark):
    """The synthesized archives must parse with the stdlib tarfile
    module (uncorrupted members), and the walker must flag exactly the
    planted corruption while still walking past it."""
    import io
    import tarfile

    from cdc_pubsub_spark.operators.modern import _tar_blob, _tar_walk

    members = [(i, "srcx", f"word {i} " * (i % 30 + 1)) for i in range(1, 80)]
    blob = _tar_blob(members)
    walked = _tar_walk(blob)
    assert len(walked) == len(members)
    bad = {m["name"] for m in walked if not m["chksum_ok"]}
    planted = {
        f"srcx/doc_{i}.txt" for i, _, _ in members if i % 37 == 0
    }
    # corruption flips byte 0 of the name, so compare by suffix
    assert len(bad) == len(planted)
    clean = [(i, "s", "x" * i) for i in range(1, 9)]
    tf = tarfile.open(fileobj=io.BytesIO(_tar_blob(clean)))
    got = {m.name: m.size for m in tf.getmembers()}
    assert got == {f"s/doc_{i}.txt": i for i in range(1, 9)}


def test_target_encoding_oof_excludes_own_fold(spark):
    """Recompute every OOF mean from raw rows; pin the complement
    identity and that leakage_gap matches |oof - full|."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    raw = (
        load(spark, SF, "lineitem")
        .selectExpr(
            "concat(l_returnflag, '/', l_linestatus) AS cat",
            "cast(conv(substr(md5(concat(CAST(l_orderkey AS STRING), '-',"
            " CAST(l_linenumber AS STRING))), 1, 15), 16, 10) as bigint)"
            " % 5 AS fold",
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
            " AS BIGINT) AS y",
        )
        .groupBy("cat", "fold")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
        .collect()
    )
    agg: dict = {}
    for r in raw:
        agg[(r["cat"], r["fold"])] = (r["n"], r["s"])
    cats = {c for c, _ in agg}
    rows = REGISTRY["ml_target_encoding_kfold"].fn(spark, SF).collect()
    assert len(rows) == len(agg)
    for r in rows:
        c, f = r["cat"], r["fold"]
        n_c = sum(n for (cc, _), (n, _) in agg.items() if cc == c)
        s_c = sum(s for (cc, _), (_, s) in agg.items() if cc == c)
        n_f, s_f = agg[(c, f)]
        assert r["n_rows"] == n_f
        import math

        oof = math.floor((s_c - s_f) / (n_c - n_f) + 0.5)
        assert r["oof_mean_cents"] == oof
        assert r["full_mean_cents"] == math.floor(s_c / n_c + 0.5)
        gap = abs((s_c - s_f) / (n_c - n_f) - s_c / n_c)
        assert abs(r["leakage_gap_cents"] - round(gap, 2)) < 0.02


def test_resolved_frontier_lattice_replay(spark):
    """Replay the min-over-partitions-of-max lattice meet in python;
    pin the resolved/unresolved split against raw timestamps."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    ev = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type AS topic",
            "user_id % 4 AS part",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        )
        .collect()
    )
    highs: dict = {}
    all_ts: dict = {}
    for r in ev:
        key = (r["topic"], r["part"])
        highs[key] = max(highs.get(key, 0), r["ts_us"])
        all_ts.setdefault(r["topic"], []).append(r["ts_us"])
    rows = {r["topic"]: r for r in
            REGISTRY["cdc_resolved_frontier"].fn(spark, SF).collect()}
    topics = {t for t, _ in highs}
    assert set(rows) == topics
    for t in topics:
        parts = {p: h for (tt, p), h in highs.items() if tt == t}
        frontier = min(parts.values())
        r = rows[t]
        assert r["frontier_us"] == frontier
        assert r["high_us"] == max(parts.values())
        assert r["n_parts"] == len(parts)
        assert r["straggler_part"] == min(
            p for p, h in parts.items() if h == frontier
        )
        assert r["n_resolved"] == sum(
            1 for x in all_ts[t] if x <= frontier
        )
        assert r["n_resolved"] + r["n_unresolved"] == len(all_ts[t])
        # the frontier is emittable: every partition passed it
        assert all(h >= frontier for h in parts.values())


def test_order_dependency_known_verdicts(spark):
    """Structural facts: a key ordering a near-random column must show
    violations, rates live in [0, 1] with n_violations <= n_adjacent;
    the date->key candidate is replayed exactly in python."""
    from cdc_pubsub_spark.tables import load

    rows = {r["candidate"]: r for r in
            REGISTRY["profile_order_dependency"].fn(spark, SF).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_adjacent"]
        assert r["od_holds"] == (r["n_violations"] == 0)
    raw = (
        load(spark, SF, "orders")
        .select("o_orderpriority", "o_orderdate", "o_orderkey")
        .collect()
    )
    from collections import defaultdict

    parts = defaultdict(list)
    for r in raw:
        parts[r["o_orderpriority"]].append(
            (r["o_orderdate"], r["o_orderkey"])
        )
    viol = adj = 0
    for lst in parts.values():
        lst.sort()
        for i in range(len(lst) - 1):
            adj += 1
            if lst[i + 1][1] < lst[i][1]:
                viol += 1
    r = rows["o_orderdate_orders_o_orderkey"]
    assert r["n_adjacent"] == adj and r["n_violations"] == viol


def test_stl_strength_bounds_and_planted_weekly(spark):
    """Both indices live in [0, 1]; the events generator plants weekly
    structure, so at least one type must show nonzero seasonal
    strength; full python replay for one type."""
    import math
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = {r["event_type"]: r for r in
            REGISTRY["ts_stl_strength"].fn(spark, SF).collect()}
    assert rows
    for r in rows.values():
        for k in ("f_seasonal", "f_trend"):
            if r[k] is not None:
                assert 0.0 <= r[k] <= 1.0 + 1e-9
    daily = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], {})[r["d"]] = r["x"]
    et = sorted(series)[0]
    s = series[et]
    days = sorted(s)
    rowsu = []
    for i, d in enumerate(days):
        if i >= 3 and i + 3 < len(days):
            win = days[i - 3 : i + 4]
            if len(win) == 7:
                sum7 = sum(s[dd] for dd in win)
                rowsu.append((d % 7, s[d] * 7000, (s[d] * 7 - sum7) * 1000))
    from collections import defaultdict

    by_dow = defaultdict(list)
    for dow, _xu, du in rowsu:
        by_dow[dow].append(du)
    su = {dow: math.floor(sum(v) / len(v) + 0.5) for dow, v in by_dow.items()}

    def var(vals):
        n, sm, q = len(vals), sum(vals), sum(v * v for v in vals)
        return n * q - sm * sm

    ru = [du - su[dow] for dow, _xu, du in rowsu]
    sru = [du for _dow, _xu, du in rowsu]
    tru = [xu - su[dow] for dow, xu, du in rowsu]
    f_seas = max(0.0, 1.0 - var(ru) / var(sru)) if var(sru) > 0 else None
    f_trend = max(0.0, 1.0 - var(ru) / var(tru)) if var(tru) > 0 else None
    r = rows[et]
    assert r["n_used"] == len(rowsu)
    if f_seas is not None:
        assert abs(r["f_seasonal"] - f_seas) < 5e-6
    if f_trend is not None:
        assert abs(r["f_trend"] - f_trend) < 5e-6
    assert any(
        (rr["f_seasonal"] or 0) > 0.05 for rr in rows.values()
    ), "weekly plant must register"


def test_semver_key_vs_reference_comparator(spark):
    """The lexical sort key must reproduce SemVer 2.0 §11 precedence
    for EVERY pair of planted versions (reference comparator written
    independently of the key scheme)."""
    import itertools

    rows = REGISTRY["fn_semver_order"].fn(spark, SF).collect()

    def parse(ver):
        core, _, pre = ver.partition("-")
        nums = tuple(int(x) for x in core.split("."))
        return nums, (pre.split(".") if pre else None)

    def cmp_ref(a, b):
        (ca, pa), (cb, pb) = parse(a), parse(b)
        if ca != cb:
            return -1 if ca < cb else 1
        if pa is None and pb is None:
            return 0
        if pa is None:
            return 1
        if pb is None:
            return -1
        for x, y in zip(pa, pb):
            xd, yd = x.isdigit(), y.isdigit()
            if xd and yd:
                if int(x) != int(y):
                    return -1 if int(x) < int(y) else 1
            elif xd != yd:
                return -1 if xd else 1
            elif x != y:
                return -1 if x < y else 1
        if len(pa) != len(pb):
            return -1 if len(pa) < len(pb) else 1
        return 0

    ranked = [(r["precedence_rank"], r["ver"]) for r in rows]
    for (ra, va), (rb, vb) in itertools.combinations(ranked, 2):
        c = cmp_ref(va, vb)
        if c == 0:
            assert ra == rb, (va, vb)
        else:
            assert (ra < rb) == (c < 0), (va, vb, ra, rb)
    # releases outrank every prerelease at the same core
    by_core: dict = {}
    for r in rows:
        core = r["ver"].split("-")[0]
        by_core.setdefault(core, []).append(r)
    for core, lst in by_core.items():
        rel = [r for r in lst if not r["is_prerelease"]]
        pre = [r for r in lst if r["is_prerelease"]]
        if rel and pre:
            assert min(r["precedence_rank"] for r in rel) > max(
                r["precedence_rank"] for r in pre
            ), core


def test_entity_clean_roundtrip_and_hazards(spark):
    """Round-trip must hold for every doc; a decoder that ignored hex
    entities would break docs on the %3 slice (checked by construction:
    those docs really contain &#x6F;)."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["text_html_entity_clean"].fn(spark, SF).collect()
    for r in rows:
        assert r["n_roundtrip_ok"] == r["n_docs"], r
        assert r["n_encoded_docs"] > 0
    docs = load(spark, SF, "documents")
    assert (
        docs.filter(F.col("text").contains("&")).count() == 0
    ), "fixture must be &-free for the plant to round-trip"


def test_adversarial_auc_controls(spark):
    """The hash split is the null control (AUC ~ 0.5, never
    'distinguishable'); the label split is the positive control for
    quantity (generates the label) and stays mild for discount."""
    rows = {(r["feature"], r["split_kind"]): r for r in
            REGISTRY["ml_adversarial_validation_auc"].fn(spark, SF).collect()}
    assert len(rows) == 4
    for feat in ("quantity", "discount"):
        r = rows[(feat, "hash_split")]
        assert abs(r["auc"] - 0.5) < 0.02, r
        assert not r["distinguishable"]
    q = rows[("quantity", "label_split")]
    assert q["distinguishable"] and q["auc"] > 0.7, q
    d = rows[("discount", "label_split")]
    assert abs(d["auc"] - 0.5) < abs(q["auc"] - 0.5), (d, q)


def test_hhi_python_replay_and_bounds(spark):
    """HHI in [10000/n, 10000]; exact replay from brand revenues."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    li = load(spark, SF, "lineitem")
    part = load(spark, SF, "part").select("p_partkey", "p_brand")
    raw = (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .selectExpr(
            "year(l_shipdate) AS yr",
            "p_brand AS brand",
            "CAST(floor(l_extendedprice*(1-l_discount)*100+0.5)"
            " AS BIGINT) AS c",
        )
        .groupBy("yr", "brand")
        .agg(F.sum("c").alias("cents"))
        .collect()
    )
    byyr: dict = {}
    for r in raw:
        byyr.setdefault(r["yr"], []).append(r["cents"])
    rows = {r["year"]: r for r in
            REGISTRY["orders_hhi_concentration"].fn(spark, SF).collect()}
    assert set(rows) == set(byyr)
    for yr, cents in byyr.items():
        t = sum(cents)
        hhi = sum(c * c for c in cents) / (t * t) * 10000
        r = rows[yr]
        assert abs(r["hhi"] - hhi) < 5e-4
        assert r["hhi_floor"] <= r["hhi"] + 1e-9 <= 10000
        assert r["n_brands"] == len(cents)


def test_turning_points_python_replay(spark):
    """Exact turning-point count replay; mean/variance formulas."""
    import math
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["x"]))
    rows = {r["event_type"]: r for r in
            REGISTRY["ts_turning_points"].fn(spark, SF).collect()}
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        tp = sum(
            1
            for i in range(1, len(xs) - 1)
            if (xs[i] > xs[i - 1] and xs[i] > xs[i + 1])
            or (xs[i] < xs[i - 1] and xs[i] < xs[i + 1])
        )
        n = len(xs)
        r = rows[et]
        assert r["n_days"] == n and r["turning_points"] == tp
        z = (tp - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
        assert abs(r["z_score"] - z) < 5e-6
        assert r["reject_randomness"] == (abs(z) > 1.96)


def test_rouge_closed_forms_on_planted_pairs(spark):
    """Exact copies score 1.0 everywhere; near copies score recall 1.0
    and precision strictly < 1 (the suffix grams dilute the candidate
    side); ROUGE-2 precision <= ROUGE-1 precision is NOT guaranteed,
    so only construction facts are pinned."""
    rows = REGISTRY["text_rouge_pairs"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r["kind"] == "exact":
            assert r["rouge_recall"] == 1.0 and r["rouge_precision"] == 1.0
        else:
            assert r["rouge_recall"] == 1.0, r  # suffix only ADDS grams
            assert r["rouge_precision"] < 1.0, r
        assert r["n_pairs"] > 0


def test_crc32c_vector_and_python_replay(spark):
    """Canonical vector crc32c('123456789') = 0xE3069283 through the
    SAME SQL expression, plus byte-for-byte python replay of sampled
    documents through an independent implementation."""
    from cdc_pubsub_spark.functions.scalar import _CRC_SPARK, _CRC32C_TBL
    from cdc_pubsub_spark.tables import load
    from pyspark.sql import functions as F

    def crc32c_py(data: bytes) -> int:
        crc = 0xFFFFFFFF
        for b in data:
            crc = (crc >> 4) ^ _CRC32C_TBL[(crc ^ b) & 0xF]
            crc = (crc >> 4) ^ _CRC32C_TBL[(crc ^ (b >> 4)) & 0xF]
        return crc ^ 0xFFFFFFFF

    assert crc32c_py(b"123456789") == 0xE3069283
    vec = (
        spark.range(1)
        .selectExpr("'123456789' AS s")
        .selectExpr("split(s, '') AS chs")
        .selectExpr(f"{_CRC_SPARK} AS crc")
        .collect()[0]["crc"]
    )
    assert vec == 0xE3069283, hex(vec)
    sample = (
        load(spark, SF, "documents")
        .filter(F.col("doc_id") % 70 == 0)
        .selectExpr("text", "split(text, '') AS chs")
        .selectExpr("text", f"{_CRC_SPARK} AS crc")
        .collect()
    )
    assert sample
    for r in sample:
        assert r["crc"] == crc32c_py(r["text"].encode()), r["text"][:40]


def test_mime_multipart_roundtrip_and_structure(spark):
    """Every part must round-trip (n_roundtrip_ok == n_parts); base64
    share matches the %3 plant; decoded bytes equal original bytes."""
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["scan_mime_multipart"].fn(spark, SF).collect()
    docs = (
        load(spark, SF, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END"))
            .alias("b64"),
            F.sum(F.length("text")).alias("bytes"),
        )
        .collect()
    )
    exp = {r["source"]: r for r in docs}
    for r in rows:
        e = exp[r["source"]]
        assert r["n_parts"] == e["n"]
        assert r["n_roundtrip_ok"] == e["n"], r
        assert r["n_base64_parts"] == e["b64"]
        assert r["decoded_bytes"] == e["bytes"]
    # The boundary delimiter is the ONE string the parser cannot
    # tolerate inside a 7bit payload (RFC 2046 makes the sender pick a
    # boundary absent from all parts) — pin that invariant on the
    # fixture so a future testdata change fails loudly here instead of
    # silently corrupting the split (r13 ADVICE).
    n_hazard = (
        load(spark, SF, "documents")
        .filter(F.col("text").contains("frontier-813"))
        .count()
    )
    assert n_hazard == 0, "fixture text must not contain the boundary"


def test_mime_multipart_payload_blank_lines_survive(spark):
    """A payload containing '\\n\\n' must round-trip: headers split at
    the FIRST blank line, not the last (r13 ADVICE item 2)."""
    from pyspark.sql import functions as F  # noqa: F401

    body = (
        "preamble is ignored"
        "\n--frontier-813\n"
        "Content-Type: text/plain\n"
        "Content-Transfer-Encoding: 7bit\n"
        "\n"
        "para one\n\npara two\n\npara three"
        "\n--frontier-813--\nepilogue ignored"
    )
    df = spark.range(1).selectExpr(f"'{body}'".replace("\n", "\\n") + " AS body")
    got = df.selectExpr(
        "transform(slice(split(body, '\\n--frontier-813\\n'), 2,"
        " size(split(body, '\\n--frontier-813\\n')) - 1),"
        " fr -> substring_index(fr, '\\n--frontier-813--', 1))"
        " AS rawparts"
    ).selectExpr(
        "transform(rawparts, rp -> substring(rp,"
        " length(substring_index(rp, '\\n\\n', 1)) + 3))[0] AS payload"
    ).collect()[0]["payload"]
    assert got == "para one\n\npara two\n\npara three"


def test_hill_estimator_python_replay(spark):
    """Replay alpha from the exact degree distribution; monotone tail
    sizes across xmin."""
    import math
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    users = [r["user_id"] for r in load(spark, SF, "events")
             .select("user_id").distinct().collect()]
    edges = set()
    for u in users:
        for a, b in ((7, 3), (13, 11), (17, 5), (23, 1)):
            v = (u * a + b) % 256
            if v != u:
                edges.add((min(u, v), max(u, v)))
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    rows = {r["xmin"]: r for r in
            REGISTRY["graph_powerlaw_hill"].fn(spark, SF).collect()}
    prev_n = None
    for xmin in (2, 3, 5):
        tail = [d for d in deg.values() if d >= xmin]
        lnsum_q = sum(
            int(math.floor(math.log(d / xmin) * 1e9 + 0.5))
            for d in tail
        )
        r = rows[xmin]
        assert r["n_tail"] == len(tail)
        if lnsum_q > 0:
            alpha = 1 + len(tail) * 1e9 / lnsum_q
            assert abs(r["alpha_hill"] - alpha) < 5e-6
        if prev_n is not None:
            assert r["n_tail"] <= prev_n
        prev_n = r["n_tail"]


def test_geohash_matches_bisection_reference(spark):
    """The integer-interleave encoding must equal the textbook 40-round
    bisection geohash for every distinct planted coordinate."""
    from cdc_pubsub_spark.functions.scalar import _GH_SPARK
    from cdc_pubsub_spark.tables import load

    ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"

    def ref(lat, lon, nchars=8):
        latlo, lathi, lonlo, lonhi = -90.0, 90.0, -180.0, 180.0
        bits = []
        even = True
        while len(bits) < nchars * 5:
            if even:
                mid = (lonlo + lonhi) / 2
                bits.append(1 if lon >= mid else 0)
                if lon >= mid:
                    lonlo = mid
                else:
                    lonhi = mid
            else:
                mid = (latlo + lathi) / 2
                bits.append(1 if lat >= mid else 0)
                if lat >= mid:
                    latlo = mid
                else:
                    lathi = mid
            even = not even
        return "".join(
            ALPHA[int("".join(map(str, bits[5 * k : 5 * k + 5])), 2)]
            for k in range(nchars)
        )

    rows = (
        load(spark, SF, "events")
        .select("user_id")
        .distinct()
        .selectExpr(
            "user_id",
            "CAST(user_id % 1777 AS DOUBLE) / 10 - 88.0 AS lat",
            "CAST((user_id * 31) % 3555 AS DOUBLE) / 10 - 177.7 AS lon",
        )
        .selectExpr(
            "lat",
            "lon",
            "CAST(floor((lon + 180.0) / 360.0 * 1048576) AS BIGINT)"
            " AS ix",
            "CAST(floor((lat + 90.0) / 180.0 * 1048576) AS BIGINT)"
            " AS iy",
        )
        .selectExpr("lat", "lon", f"{_GH_SPARK} AS gh")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["gh"] == ref(r["lat"], r["lon"]), (r["lat"], r["lon"])


def test_retention_halflife_python_replay(spark):
    """Replay the curve and the log-linear fit exactly."""
    import math
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    act = (
        load(spark, SF, "events")
        .selectExpr(
            "user_id",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS d",
        )
        .distinct()
        .collect()
    )
    from collections import defaultdict

    days = defaultdict(set)
    for r in act:
        days[r["user_id"]].add(r["d"])
    cohort = len(days)
    n_active = defaultdict(int)
    for u, ds in days.items():
        f = min(ds)
        for d in ds:
            if 1 <= d - f <= 14:
                n_active[d - f] += 1
    pts = [
        (off, int(math.floor(math.log(n / cohort) * 1e9 + 0.5)))
        for off, n in sorted(n_active.items())
        if n > 0
    ]
    k = len(pts)
    sd = sum(o for o, _ in pts)
    sdd = sum(o * o for o, _ in pts)
    sl = sum(l for _, l in pts)
    sdl = sum(o * l for o, l in pts)
    slope = (k * sdl - sd * sl) / (k * sdd - sd * sd) / 1e9
    rows = {r["day_offset"]: r for r in
            REGISTRY["events_retention_halflife"].fn(spark, SF).collect()}
    assert set(rows) == set(n_active)
    for off, n in n_active.items():
        r = rows[off]
        assert r["n_active"] == n
        assert abs(r["decay_slope"] - slope) < 5e-6
        if slope < 0:
            assert abs(r["half_life_days"] - math.log(2) / -slope) < 1e-3


def test_sample_entropy_python_replay(spark):
    """Replay B (m-matches), A (m+1-matches), and SampEn per type with
    the integer tolerance rule |delta|*5 <= range."""
    import math
    from pyspark.sql import functions as F
    from cdc_pubsub_spark.tables import load

    daily = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(F.expr("CAST(floor(sum(value)*100+0.5) AS BIGINT)").alias("x"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["x"]))
    rows = {r["event_type"]: r for r in
            REGISTRY["ts_sample_entropy"].fn(spark, SF).collect()}
    for et, pts in series.items():
        xs = [x for _, x in sorted(pts)]
        rng = max(xs) - min(xs)
        tpl = [
            (xs[i], xs[i + 1], xs[i + 2] if i + 2 < len(xs) else None)
            for i in range(len(xs) - 1)
        ]
        B = A = 0
        for i in range(len(tpl)):
            for j in range(i + 1, len(tpl)):
                p, q = tpl[i], tpl[j]
                if max(abs(p[0] - q[0]), abs(p[1] - q[1])) * 5 <= rng:
                    B += 1
                if (
                    p[2] is not None
                    and q[2] is not None
                    and max(
                        abs(p[0] - q[0]),
                        abs(p[1] - q[1]),
                        abs(p[2] - q[2]),
                    )
                    * 5
                    <= rng
                ):
                    A += 1
        r = rows[et]
        assert r["m_matches"] == B and r["m1_matches"] == A, (et, B, A, r)
        if A > 0 and B > 0:
            assert abs(r["sample_entropy"] + math.log(A / B) * -1
                       - 2 * -math.log(A / B)) < 1  # sanity of sign
            assert abs(r["sample_entropy"] - (-math.log(A / B))) < 5e-6


def test_vocab_jaccard_python_set_replay(spark):
    """Exhaustive python set replay: every source pair with a shared
    word must be emitted with exact inter/union; containment >= jaccard."""
    counts = _word_counts(spark, SF)
    vocab: dict = {}
    for (s, w), _c in counts.items():
        vocab.setdefault(s, set()).add(w)
    rows = REGISTRY["text_source_vocab_jaccard"].fn(spark, SF).collect()
    got = {(r["source_a"], r["source_b"]): r for r in rows}
    import itertools

    for a, b in itertools.combinations(sorted(vocab), 2):
        inter = len(vocab[a] & vocab[b])
        if inter == 0:
            assert (a, b) not in got
            continue
        r = got[(a, b)]
        assert r["inter"] == inter
        assert r["uni"] == len(vocab[a] | vocab[b])
        assert r["containment"] >= r["vocab_jaccard"] - 1e-9


def test_out_of_order_buffer_bound(spark):
    """Replay inversions per (topic, partition) in python; the max
    regression is the minimal lossless reorder buffer."""
    from cdc_pubsub_spark.tables import load

    ev = (
        load(spark, SF, "events")
        .selectExpr(
            "event_type AS topic",
            "user_id % 4 AS part",
            "event_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        )
        .collect()
    )
    from collections import defaultdict

    streams = defaultdict(list)
    for r in ev:
        streams[(r["topic"], r["part"])].append((r["event_id"], r["ts_us"]))
    stats = defaultdict(lambda: [0, 0, 0, 0])  # adj, inv, maxreg, sumreg
    for (topic, _p), lst in streams.items():
        lst.sort()
        s = stats[topic]
        for i in range(len(lst) - 1):
            s[0] += 1
            d = lst[i][1] - lst[i + 1][1]
            if d > 0:
                s[1] += 1
                s[2] = max(s[2], d)
                s[3] += d
    rows = {r["topic"]: r for r in
            REGISTRY["cdc_out_of_order_stats"].fn(spark, SF).collect()}
    for topic, (adj, inv, mx, sm) in stats.items():
        r = rows[topic]
        assert (r["n_adjacent"], r["n_inversions"]) == (adj, inv)
        assert r["max_regression_us"] == mx
        assert r["total_regression_us"] == sm
