"""Semantic pins for the round-7 additions: transaction-log reads,
Z-order clustering, cross-corpus chunk dedup, neighbor-Jaccard, golden
records, histogram-sketch quantiles, Holt forecast.

Value-level parity with DuckDB is covered by tests/test_parity.py (all of
these ops carry exact oracles); these tests pin the claims the oracle
alone cannot see — physical layout, pruning wins, non-vacuity, and plan
shapes."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.sources import lakehouse


def test_txn_log_snapshot_ignores_removed_file_still_on_disk(spark, sf_dir):
    """The reader must resolve the LOG, not the directory listing: after
    the v2 remove, add-001's parquet files still physically exist, but
    no row from them (urgent %4==1 orders) may appear in the snapshot."""
    root = lakehouse._build_txn_table(spark, sf_dir)
    removed_dir = os.path.join(root, "data", "add-001")
    assert glob.glob(os.path.join(removed_dir, "*.parquet")), (
        "fixture broke: removed file should still exist on disk"
    )
    live = lakehouse._resolve_live_files(root)
    assert os.path.join(root, "data", "add-001") not in live
    assert os.path.join(root, "data", "add-003") in live

    snap = spark.read.parquet(*live)
    n_urgent_mod1 = snap.filter(
        (F.col("o_orderkey") % 4 == 1)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).count()
    assert n_urgent_mod1 == 0, "copy-on-write delete leaked deleted rows"


def test_txn_log_time_travel_restores_pre_delete_state(spark, sf_dir):
    root = lakehouse._build_txn_table(spark, sf_dir)
    v1 = spark.read.parquet(*lakehouse._resolve_live_files(root, as_of=1))
    v2 = spark.read.parquet(*lakehouse._resolve_live_files(root))
    # v1 (pre-delete) strictly contains v2 (post-delete); the difference
    # is exactly the deleted urgent rows of the %4==1 file.
    deleted = v1.count() - v2.count()
    expected = v1.filter(
        (F.col("o_orderkey") % 4 == 1)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).count()
    assert deleted == expected > 0
    # v0 sees neither the append nor the delete.
    v0 = spark.read.parquet(*lakehouse._resolve_live_files(root, as_of=0))
    assert v0.filter(F.col("o_orderkey") % 4 == 2).count() == 0


def test_zorder_prunes_probe_box_and_writes_one_file_per_bucket(
    spark, sf_dir
):
    out = REGISTRY["sink_zorder_cluster"].fn(spark, sf_dir).collect()
    assert len(out) == 16
    scanned = sum(r.probe_scans_file for r in out)
    # The 2-D probe box covers ~(100/1024)·(200/1024) ≈ 2% of the key
    # space; Z-order locality must confine it to a small minority of
    # files. (An unclustered layout scans ~all 16: every file's min/max
    # box spans the domain.)
    assert scanned <= 6, f"Z-order pruning too weak: probe scans {scanned}/16"
    # Physical layout: one directory per bucket actually written.
    root = lakehouse.work_dir(
        "zorder_orders_" + os.path.basename(os.path.normpath(sf_dir))
    )
    bucket_dirs = glob.glob(os.path.join(root, "bucket=*"))
    assert len(bucket_dirs) == 16


def test_zorder_beats_single_dim_sort_on_the_probe(spark, sf_dir):
    """The claim that earns Z-order its complexity: a single-dim sort
    layout cannot prune the second dimension. Build the x-sorted
    16-bucket layout and show the same probe box scans MORE files than
    the Z-order layout."""
    from pyspark.sql.window import Window

    from cdc_pubsub_spark.tables import load

    pts = (
        load(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey",
            "o_custkey % 1024 AS x",
            "CAST(floor(o_totalprice) AS BIGINT) % 1024 AS y",
        )
    )
    w = Window.orderBy("x", "o_orderkey")
    linear = (
        pts.withColumn("bucket", F.ntile(16).over(w))
        .groupBy("bucket")
        .agg(
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .collect()
    )
    p = lakehouse._PROBE
    linear_scans = sum(
        1
        for r in linear
        if r.x_min <= p["x_hi"]
        and r.x_max >= p["x_lo"]
        and r.y_min <= p["y_hi"]
        and r.y_max >= p["y_lo"]
    )
    z = REGISTRY["sink_zorder_cluster"].fn(spark, sf_dir).collect()
    z_scans = sum(r.probe_scans_file for r in z)
    assert z_scans < linear_scans, (
        f"zorder {z_scans} files vs linear {linear_scans}"
    )


def test_interleave_bits_is_a_morton_code():
    """Spot-check the bit math against a hand-computed Morton pair."""
    import duckdb

    # x=0b101 (5), y=0b011 (3) → z bits y2x2 y1x1 y0x0 = 0b011011 +
    # x2 at bit 4 → compute directly.
    expected = 0
    x, y = 5, 3
    for i in range(10):
        expected |= ((x >> i) & 1) << (2 * i)
        expected |= ((y >> i) & 1) << (2 * i + 1)
    got = duckdb.sql(
        f"SELECT {lakehouse._interleave_sql('5', '3')}"
    ).fetchone()[0]
    assert got == expected


def test_line_dedup_actually_drops_boilerplate(spark, sf_correct):
    """Non-vacuity: at sf0.01 some chunks repeat across ≥3 docs (the
    fixture vocabulary is 30 words), so the op must drop something,
    and reassembly md5 must differ from the trivial all-kept hash for
    at least one affected doc."""
    rows = REGISTRY["text_line_dedup"].fn(spark, sf_correct).collect()
    assert any(r.n_kept < r.n_chunks for r in rows), (
        "no chunk was ever dropped — dedup is vacuous at this sf"
    )
    assert all(r.n_kept <= r.n_chunks for r in rows)


def test_jaccard_neighbors_plan_has_no_cartesian(spark, sf_dir):
    df = REGISTRY["graph_jaccard_neighbors"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_scores_are_valid(spark, sf_dir):
    rows = REGISTRY["graph_jaccard_neighbors"].fn(spark, sf_dir).collect()
    assert rows, "no similar pairs found"
    for r in rows:
        assert 0.0 < r.jaccard <= 1.0
        assert r.n_common >= 1
    # descending order pinned
    js = [r.jaccard for r in rows]
    assert js == sorted(js, reverse=True)


def test_survivorship_exercises_every_fallback_tier(spark, sf_correct):
    rows = (
        REGISTRY["repair_survivorship_golden"].fn(spark, sf_correct).collect()
    )
    prefixes = {r.golden_name.split(":")[0] for r in rows}
    assert prefixes == {"CRM", "WEB", "LEG"}, (
        f"fallback tiers not all exercised: {prefixes}"
    )
    # custkey divisible by 6: CRM name null (%3) and WEB name null (%2)
    # → legacy must win.
    by_key = {r.c_custkey: r for r in rows}
    assert by_key[6].golden_name.startswith("LEG:")
    assert by_key[1].golden_name.startswith("CRM:")
    # Balance fallback: CRM wins where present (custkey 1), web wins
    # where CRM is planted null (custkey 4, %4==0); legacy never wins
    # because web's balance is always non-null.
    bal = {
        r.c_custkey: round(r.c_acctbal, 2)
        for r in spark.read.parquet(
            os.path.join(sf_correct, "customer.parquet")
        )
        .filter(F.col("c_custkey").isin(1, 4))
        .collect()
    }
    assert abs(by_key[1].golden_acctbal - round(bal[1] + 10.0, 2)) < 1e-9
    assert abs(by_key[4].golden_acctbal - bal[4]) < 1e-9


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_correct):
    """The sketch's estimate must sit within one bin width (250) of the
    exact quantile — the advertised deterministic error bound."""
    li = spark.read.parquet(os.path.join(sf_correct, "lineitem.parquet"))
    est = {
        r.q: r.est_value
        for r in REGISTRY["agg_quantile_bin_sketch"]
        .fn(spark, sf_correct)
        .collect()
    }
    for q in (0.5, 0.9, 0.99):
        exact = li.selectExpr(
            f"percentile(l_extendedprice, {q}d) AS p"
        ).collect()[0].p
        assert abs(est[q] - exact) <= 250.0 + 1e-6, (q, est[q], exact)


def test_holt_forecast_extrapolates_linearly(spark, sf_dir):
    rows = REGISTRY["orders_forecast_holt"].fn(spark, sf_dir).collect()
    by_h = {r.horizon: r for r in rows}
    l, b = by_h[1].level_dollars, by_h[1].trend_dollars
    assert b != 0.0, "trend term vacuously zero"
    for h in (1, 2, 3):
        assert abs(by_h[h].forecast_dollars - (l + h * b)) < 0.02


def test_autocorr_is_bounded_and_pairs_shrink(spark, sf_dir):
    """ACF values are correlations (|acf| ≤ 1 up to the r4 floor); with
    a gapless daily calendar the pair count at lag k is exactly n − k,
    so n_pairs must be strictly decreasing in lag."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ts_autocorr"].fn(spark, sf_dir).collect()
    assert [r.lag for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert all(-1.0001 <= r.acf <= 1.0001 for r in rows)
    pairs = [r.n_pairs for r in rows]
    assert all(a > b for a, b in zip(pairs, pairs[1:]))


def test_changefeed_update_pairs_and_copy_suppression(spark, sf_dir):
    """CDF invariants: update pre/post images pair 1:1 with postimage
    revenue exactly doubled (the planted ×2 rewrite); the v2 delete
    count equals the urgent %4==1 population; copied-unchanged rows
    emit NOTHING (no insert rows at all — naive file diff would emit
    every rewritten row)."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    rows = REGISTRY["scan_txn_log_changefeed"].fn(spark, sf_dir).collect()
    by = {(r.version, r.change_type): r for r in rows}
    assert set(by) == {
        (2, "delete"),
        (3, "update_preimage"),
        (3, "update_postimage"),
    }, sorted(by)
    pre, post = by[(3, "update_preimage")], by[(3, "update_postimage")]
    assert pre.n_rows == post.n_rows > 0
    assert abs(post.revenue - 2 * pre.revenue) < 0.02 * pre.n_rows
    n_urgent = (
        load(spark, sf_dir, "orders")
        .filter("o_orderkey % 4 = 1 AND o_orderpriority = '1-URGENT'")
        .count()
    )
    assert by[(2, "delete")].n_rows == n_urgent


def test_cross_correlation_peak_and_symmetry_base(spark, sf_dir):
    """CCF invariants: |ccf| ≤ 1; exactly the 7 requested lags; the
    pair count at lag k equals the count at −k (grid symmetry)."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ts_cross_correlation"].fn(spark, sf_dir).collect()
    assert [r.lag for r in rows] == [-3, -2, -1, 0, 1, 2, 3]
    by = {r.lag: r for r in rows}
    assert all(-1.0001 <= r.ccf <= 1.0001 for r in rows)
    for k in (1, 2, 3):
        assert by[k].n_pairs == by[-k].n_pairs


def test_entropy_rate_bounds(spark, sf_dir):
    """0 ≤ H ≤ ln(n_states); perplexity = e^H lies in [1, n_states];
    five event types drawn near-uniformly should sit close to the
    ceiling."""
    import math

    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["events_entropy_rate"].fn(spark, sf_dir).collect()[0]
    assert r.n_states == 5
    assert 0.0 <= r.entropy_nats <= math.log(r.n_states) + 1e-4
    assert 1.0 <= r.perplexity <= r.n_states + 0.01
    assert abs(r.perplexity - math.exp(r.entropy_nats)) < 0.02
    assert r.entropy_nats > 0.8 * math.log(r.n_states)


def test_price_index_fisher_between_l_and_p(spark, sf_dir):
    """Fisher is the geometric mean of Laspeyres and Paasche, so it
    must lie between them; all indices are positive and near 1 for the
    stationary TPC-H price process."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["orders_price_index"].fn(spark, sf_dir).collect()[0]
    assert r.n_parts > 0
    lo, hi = sorted((r.laspeyres, r.paasche))
    assert lo - 1e-4 <= r.fisher <= hi + 1e-4
    assert 0.5 < r.laspeyres < 2.0 and 0.5 < r.paasche < 2.0


def test_csv_permissive_preserves_raw_corrupt_lines(spark, sf_dir):
    """The quarantine column must carry the ORIGINAL raw line for every
    corrupt row (reprocessability), and only for corrupt rows."""
    from cdc_pubsub_spark.paths import work_dir
    from cdc_pubsub_spark.registry import REGISTRY

    REGISTRY["scan_csv_permissive_recovery"].fn(spark, sf_dir).collect()
    back = (
        spark.read.schema(
            "o_orderkey BIGINT, o_totalprice DOUBLE, _bad STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(work_dir("csv_permissive"))
    ).cache()  # queries touching ONLY the corrupt column are disallowed
    # on a raw file scan (Spark 2.3+ restriction); cache materializes
    bad = back.filter("_bad IS NOT NULL")
    assert bad.count() > 0
    assert bad.filter("_bad NOT LIKE '%NOT_A_NUMBER'").count() == 0
    assert bad.filter("o_totalprice IS NOT NULL").count() == 0
    assert back.filter(
        "_bad IS NULL AND o_totalprice IS NULL"
    ).count() == 0


def test_moving_median_is_robust_order_statistic(spark, sf_dir):
    """The moving median must be an actual frame value, frames at the
    series edges shrink to their true counts (4..7 for a ±3 frame),
    and the median is bounded by the frame's own min/max."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["ts_moving_median"].fn(spark, sf_dir).collect()
    assert rows
    cents = {r.day_idx: r.cents for r in rows}
    for r in rows:
        assert 4 <= r.n_frame <= 7
        frame = [
            cents[d]
            for d in range(r.day_idx - 3, r.day_idx + 4)
            if d in cents
        ]
        assert len(frame) == r.n_frame
        assert r.median_cents in frame
        assert r.median_cents == sorted(frame)[(r.n_frame + 1) // 2 - 1]
        assert r.is_spike == (r.cents > 2 * r.median_cents)


def test_diff_in_diff_placebo_is_null(spark, sf_dir):
    """User-parity assignment is independent of value, so the true
    effect is ZERO: the estimator must not manufacture significance
    (|t| < 4), its SE must be positive, and every cell populated —
    the placebo audit that validates the error bars."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = REGISTRY["events_diff_in_diff"].fn(spark, sf_dir).collect()[0]
    assert min(r.n00, r.n01, r.n10, r.n11) > 0
    assert r.se_dollars > 0
    assert abs(r.t_stat) < 4.0, r
    assert abs(r.did_dollars) <= 4 * r.se_dollars + 1e-9


def test_periodogram_matches_pure_python_replication(spark, sf_dir):
    """Independent replication: rebuild the daily integer-cents series
    with DuckDB (a third engine), run the identical quantized-trig
    projection in pure Python, and require every r2 power and every
    dominant rank to match the Spark op exactly."""
    import math

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = con.sql(
        "SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
        " AS BIGINT) AS d,"
        " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        " AS c"
        f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
    ).fetchall()
    n = len(daily)
    sx = sum(c for _, c in daily)
    exp = {}
    powers = []
    for p in range(2, 29):
        trig = {
            r: (
                int(math.floor(math.cos(2 * math.pi * r / p) * 10000 + 0.5)),
                int(math.floor(math.sin(2 * math.pi * r / p) * 10000 + 0.5)),
            )
            for r in range(p)
        }
        sdc = sum((n * c - sx) * trig[d % p][0] for d, c in daily)
        sds = sum((n * c - sx) * trig[d % p][1] for d, c in daily)
        ac = float(sdc) / (10000.0 * float(n) * float(n))
        as_ = float(sds) / (10000.0 * float(n) * float(n))
        pw = ac * ac + as_ * as_
        exp[p] = math.floor(pw * 100 + 0.5) / 100
        powers.append((p, pw))
    ranks = {
        p: i + 1
        for i, (p, _) in enumerate(
            sorted(powers, key=lambda t: (-t[1], t[0]))
        )
    }
    rows = REGISTRY["ts_periodogram"].fn(spark, sf_dir).collect()
    assert len(rows) == 27
    for r in rows:
        assert r.n_days == n
        assert r.power_cents2 == exp[r.period], r
        assert r.dominant_rank == ranks[r.period], r



def test_cramers_v_bounds_and_planted_independence(spark, sf_dir):
    """V ∈ [0,1] for every pair; the day-of-week pairs must come out
    near-independent (orderdate is unrelated to status/priority in the
    generator: V ≈ 0), giving the statistic a known answer at both
    ends; dof must match the level counts."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["profile_cramers_v"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    by = {r.pair: r for r in rows}
    for r in rows:
        assert 0.0 <= r.cramers_v <= 1.0, r
        assert r.dof == (r.r_levels - 1) * (r.c_levels - 1)
        assert r.chi2 >= 0.0
    assert by["status_x_dow"].cramers_v < 0.1
    assert by["priority_x_dow"].cramers_v < 0.1

def test_hotspot_grid_finds_planted_cluster(spark, sf_dir):
    """The planted cluster (all user_id % 11 == 0 mass in cell (3,3))
    must dominate: the top-ranked hotspot sits in the 3×3 ring around
    (3,3), cell (3,3) itself carries the maximum cell total, and its
    G* is decisively positive while the tail of the top-15 is not."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["events_hotspot_grid"].fn(spark, sf_dir).collect()
    assert rows
    top = rows[0]
    assert abs(top.gx - 3) <= 1 and abs(top.gy - 3) <= 1, top
    assert top.gstar > 2.0, top
    cell33 = [r for r in rows if r.gx == 3 and r.gy == 3]
    assert cell33, "planted cell must appear in the top-15"
    assert cell33[0].cell_cents == max(r.cell_cents for r in rows)
    gs = [r.gstar for r in rows]
    assert gs == sorted(gs, reverse=True)


def test_fixed_width_offsets_round_trip_python(spark, sf_dir):
    """Rebuild the 60-byte layout in Python from the raw table and
    parse it back at the documented offsets — any disagreement with
    the engine's per-status aggregates means an offset, padding, or
    sign error in one of the twins."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    orders = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        "date_format(o_orderdate, 'yyyyMMdd') AS d8",
        "o_orderpriority",
    ).collect()
    agg = {}
    for o in orders:
        line = (
            str(o.o_orderkey).zfill(12)
            + str(o.o_custkey).zfill(10)
            + o.o_orderstatus
            + str(o.cents).zfill(14)
            + o.d8
            + o.o_orderpriority.ljust(15)
        )
        assert len(line) == 60, line
        st = line[22]
        a = agg.setdefault(st, [0, 0, 0, 0])
        a[0] += 1
        a[1] += int(line[0:12])
        a[2] += int(line[23:37])
        a[3] += int(line[37:45])
    rows = REGISTRY["scan_fixed_width"].fn(spark, sf_dir).collect()
    assert {r.status for r in rows} == set(agg)
    for r in rows:
        n, ks, cs, ds = agg[r.status]
        assert (r.n, r.key_sum, r.cents_sum, r.date_sum) == (n, ks, cs, ds)


def test_burstiness_fano_matches_python_and_bounds(spark, sf_dir):
    """Recompute the two-moment dispersion summary in exact Python
    integers from an independent DuckDB daily rollup; assert equality
    at the r4 grain plus the definitional bounds (fano > 0,
    burstiness strictly inside (−1, 1))."""
    import math

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = con.sql(
        "SELECT event_type,"
        " CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)"
        " AS d, CAST(count(*) AS BIGINT) AS c"
        f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    n_days = len({d for _, d, _ in daily})
    mom = {}
    for et, _d, c in daily:
        m = mom.setdefault(et, [0, 0])
        m[0] += c
        m[1] += c * c
    rows = REGISTRY["events_burstiness_fano"].fn(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(mom)
    for r in rows:
        s1, s2 = mom[r.event_type]
        mu = s1 / n_days
        var = s2 / n_days - mu * mu
        assert r.n_days == n_days and r.n_events == s1
        assert r.fano == math.floor(var / mu * 10000 + 0.5) / 10000
        b = (math.sqrt(var) - mu) / (math.sqrt(var) + mu)
        assert r.burstiness == math.floor(b * 10000 + 0.5) / 10000
        assert r.fano > 0
        assert -1.0 < r.burstiness < 1.0


def test_merge_into_action_buckets_exact(spark, sf_dir):
    """The five MERGE action buckets must match the closed-form key
    populations: inserts = never-seen %4==3 keys, deletes = matched
    %8==1, ignored deletes = unmatched %8==3 (the classic MERGE bug —
    a delete for an absent key must do nothing), updates = matched
    even keys, untouched = the rest of the target; checksums are
    exact key/cents sums."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    keys = [
        r.o_orderkey
        for r in load(spark, sf_dir, "orders").select("o_orderkey").collect()
    ]
    target = {k for k in keys if k % 4 != 3}
    source = {k for k in keys if k % 2 == 0 or k % 4 == 3 or k % 8 == 1}
    exp = {
        "inserted": {k for k in source - target if k % 8 not in (1, 3)},
        "ignored_delete": {k for k in source - target if k % 8 in (1, 3)},
        "deleted": {k for k in source & target if k % 8 in (1, 3)},
        "updated": {k for k in source & target if k % 8 not in (1, 3)},
        "untouched": target - source,
    }
    rows = {r.action: r for r in REGISTRY["sink_merge_into"].fn(spark, sf_dir).collect()}
    assert set(rows) == {a for a, ks in exp.items() if ks}
    for action, ks in exp.items():
        if not ks:
            continue
        assert rows[action].n == len(ks), action
        assert rows[action].key_checksum == sum(ks), action
    assert rows["deleted"].cents_sum == 0


def test_ip_cidr_blocks_match_python_partition(spark, sf_dir):
    """Closed-form replication: every user's block assignment is
    recomputed in Python (octet synthesis + numeric CIDR ranges) and
    compared exactly — including the 70.0.0.0/10 and 190.128.0.0/9
    blocks that cover only part of their first-octet space, and the
    render→parse round-trip flag."""
    from cdc_pubsub_spark.operators.modern import _cidr_blocks
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    users = [
        r.user_id
        for r in load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    ]
    blocks = _cidr_blocks()
    agg = {}
    for u in users:
        o1, o2, o3, o4 = (
            10 + (u % 4) * 60,
            u % 256,
            (u * 7) % 256,
            (u * 13) % 256,
        )
        num = ((o1 * 256 + o2) * 256 + o3) * 256 + o4
        name = next((c for c, lo, hi in blocks if lo <= num <= hi),
                    "unmatched")
        a = agg.setdefault(name, [0, None, None])
        a[0] += 1
        a[1] = num if a[1] is None else min(a[1], num)
        a[2] = num if a[2] is None else max(a[2], num)
    rows = REGISTRY["fn_ip_cidr"].fn(spark, sf_dir).collect()
    assert {r.block for r in rows} == set(agg)
    for r in rows:
        n, lo, hi = agg[r.block]
        assert (r.n_ips, r.min_ip, r.max_ip) == (n, lo, hi), r.block
        assert r.n_roundtrip_ok == n, "render->parse must be identity"
    assert "unmatched" in agg, "generator must exercise the fall-through"


def test_sax_motifs_match_python_replication(spark, sf_dir):
    """Rebuild the SAX pipeline (z-quantize, PAA, quartile banding,
    3-words) in pure Python from an independent DuckDB daily rollup
    and require the motif table to match exactly."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = dict(
        con.sql(
            "SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
            " AS BIGINT),"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    n = len(daily)
    s1 = sum(daily.values())
    s2 = sum(c * c for c in daily.values())
    mu = s1 / n
    sd = math.sqrt(s2 / n - mu * mu)
    frames = defaultdict(list)
    for d, c in daily.items():
        frames[d // 7].append(math.floor((c - mu) / sd * 1000000 + 0.5))
    sym = {}
    for f, zqs in frames.items():
        paa = sum(zqs) / (1000000.0 * len(zqs))
        sym[f] = "a" if paa < -0.6745 else (
            "b" if paa < 0 else ("c" if paa < 0.6745 else "d")
        )
    order = sorted(sym)
    words = defaultdict(lambda: [0, None])
    for i, f in enumerate(order[:-2]):
        w = sym[f] + sym[order[i + 1]] + sym[order[i + 2]]
        words[w][0] += 1
        if words[w][1] is None:
            words[w][1] = f
    exp = sorted(
        ((w, c, ff) for w, (c, ff) in words.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    rows = REGISTRY["events_sax_motifs"].fn(spark, sf_dir).collect()
    got = [(r.word, r.n_occurrences, r.first_frame) for r in rows]
    assert got == exp


def test_price_elasticity_matches_python_regression(spark, sf_dir):
    """Replicate the whole estimate in Python from an independent
    DuckDB rollup of (brand, price level, qty): same ln-ln least
    squares, compared at a 2e-3 grain (ln ulps); plus the structural
    bounds — the fixture's density artifact reads as a moderate
    NEGATIVE slope, never a runaway value."""
    import math

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    levels = con.sql(
        "SELECT p.p_brand, CAST(floor(l.l_extendedprice / l.l_quantity"
        " + 0.5) AS BIGINT) AS pd, CAST(sum(l.l_quantity) AS BIGINT) AS q"
        f" FROM read_parquet('{sf_dir}/lineitem.parquet') l"
        f" JOIN read_parquet('{sf_dir}/part.parquet') p"
        "   ON p.p_partkey = l.l_partkey"
        " WHERE floor(l.l_extendedprice / l.l_quantity + 0.5) >= 1"
        " GROUP BY 1, 2"
    ).fetchall()
    by_brand = {}
    for b, pd_, q in levels:
        by_brand.setdefault(b, []).append((math.log(pd_), math.log(q)))
    rows = REGISTRY["orders_price_elasticity"].fn(spark, sf_dir).collect()
    assert {r.brand for r in rows} == set(by_brand)
    for r in rows:
        pts = by_brand[r.brand]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert r.n_price_levels == n
        assert abs(r.elasticity - slope) < 2e-3, (r, slope)
        assert abs(r.fit_r2 - r2) < 2e-3, (r, r2)
        assert -3.0 < r.elasticity < 0.5, r
        assert 0.0 <= r.fit_r2 <= 1.0, r


def test_croston_matches_python_fold(spark, sf_dir):
    """Replicate Croston exactly in Python: same ordered nonzero
    series, same SES folds (alpha = 0.25, first element seeds), same
    r4 floors — and sanity-pin the rate against the naive estimate on
    the memoryless fixture."""
    import math

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = con.sql(
        "SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'"
        " AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS q"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
        " WHERE o_orderkey % 97 = 0 GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert len(daily) >= 3
    qs = [float(q) for _, q in daily]
    ds = [d for d, _ in daily]
    z = qs[0]
    for x in qs[1:]:
        z = 0.25 * x + 0.75 * z
    ivs = [float(b - a) for a, b in zip(ds, ds[1:])]
    p = ivs[0]
    for x in ivs[1:]:
        p = 0.25 * x + 0.75 * p
    r = REGISTRY["orders_croston_intermittent"].fn(spark, sf_dir).collect()[0]
    assert r.n_nonzero_days == len(daily)
    assert r.z_hat == math.floor(z * 10000 + 0.5) / 10000
    assert r.p_hat == math.floor(p * 10000 + 0.5) / 10000
    assert r.croston_rate == math.floor(z / p * 10000 + 0.5) / 10000
    assert 0.2 * r.naive_rate < r.croston_rate < 5.0 * r.naive_rate


def test_alert_debounce_matches_python_islands(spark, sf_dir):
    """Replicate threshold → islands → min-length in Python with the
    identical integer cross-multiply breach predicate; episodes must
    match exactly and never be shorter than the debounce floor."""
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = con.sql(
        "SELECT event_type,"
        " CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT),"
        " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    by_type = defaultdict(dict)
    for et, d, c in daily:
        by_type[et][d] = c
    exp = []
    for et, days in by_type.items():
        n, s1 = len(days), sum(days.values())
        breaches = sorted(d for d, c in days.items() if c * n * 100 > s1 * 105)
        run = []
        for d in breaches + [None]:
            if run and (d is None or d != run[-1] + 1):
                if len(run) >= 3:
                    exp.append(
                        (
                            et,
                            run[0],
                            run[-1],
                            len(run),
                            max(days[x] for x in run),
                            sum(days[x] for x in run),
                        )
                    )
                run = []
            if d is not None:
                run.append(d)
    exp.sort()
    rows = REGISTRY["events_alert_debounce"].fn(spark, sf_dir).collect()
    got = sorted(
        (r.event_type, r.start_day, r.end_day, r.n_days, r.peak_cents,
         r.total_cents)
        for r in rows
    )
    assert got == exp
    assert all(r.n_days >= 3 for r in rows)


def test_syslog_parse_offsets_on_handcrafted_line(spark):
    """Drive the exact parse expressions over a handcrafted RFC3164
    line so each extraction (PRI digits, 4th token host, bracketed
    pid, kv payload) is pinned to known values — independent of the
    fixture round-trip the oracle already certifies."""
    row = spark.sql(
        "SELECT CAST(substring(line, 2, instr(line, '>') - 2) AS BIGINT)"
        " AS pri,"
        " element_at(split(line, ' '), 4) AS host,"
        " substring(element_at(split(line, ' '), 5), 1,"
        " instr(element_at(split(line, ' '), 5), '[') - 1) AS tag,"
        " CAST(substring(element_at(split(line, ' '), 5),"
        " instr(element_at(split(line, ' '), 5), '[') + 1,"
        " instr(element_at(split(line, ' '), 5), ']')"
        " - instr(element_at(split(line, ' '), 5), '[') - 1) AS BIGINT)"
        " AS pid,"
        " CAST(element_at(split(element_at(split(line, ' '), 6), '='), 2)"
        " AS BIGINT) AS cents"
        " FROM (SELECT '<165>Aug 15 07:30:00 host-7 sshd[4242]: value=987'"
        " AS line)"
    ).collect()[0]
    assert row.pri == 165
    assert row.pri // 8 == 20 and row.pri % 8 == 5  # local4.notice
    assert row.host == "host-7"
    assert row.tag == "sshd"
    assert row.pid == 4242
    assert row.cents == 987


def test_ab_sprt_accepts_h1_fast_and_matches_python(spark, sf_dir):
    """The fixture's ~0.20 purchase share is far above H1's 0.12, so
    BOTH variants must accept H1, quickly; the cumulative integer LLR
    path is replicated exactly in Python."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    L1, L0 = 0.1823215567939546, -0.02247285585205863
    A = math.floor(2.9444389791664403 * 1000000 + 0.5)
    con = duckdb.connect()
    daily = con.sql(
        "SELECT user_id % 2,"
        " CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT),"
        " CAST(count(*) AS BIGINT),"
        " CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    paths = defaultdict(list)
    for v, d, n, x in daily:
        paths[v].append((d, math.floor((x * L1 + (n - x) * L0) * 1e6 + 0.5)))
    rows = {r.variant: r for r in
            REGISTRY["events_ab_sprt"].fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    for v, incs in paths.items():
        cum, first = 0, None
        for d, inc in incs:
            cum += inc
            if first is None and cum >= A:
                first = d
        r = rows[v]
        assert r.decision == "accept_h1"
        assert r.decision_day == first
        assert r.final_llr == math.floor(cum / 1e6 * 10000 + 0.5) / 10000
        span = incs[-1][0] - incs[0][0] + 1
        assert first - incs[0][0] < max(5, span // 3), (v, first)


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL concentration: the distance-ratio audit must center near 1
    with (near-)every pair inside [0.5, 2]; pair count matches the
    sample size; the sign matrix must not have degenerated (min <
    max)."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    m = (
        load(spark, sf_dir, "embeddings")
        .filter("vec_id < 60")
        .count()
    )
    r = REGISTRY["embed_random_projection"].fn(spark, sf_dir).collect()[0]
    assert r.n_pairs == m * (m - 1) // 2
    assert 0.85 <= r.mean_ratio <= 1.15, r
    assert r.n_within_2x >= 0.9 * r.n_pairs, r
    assert 0.05 <= r.min_ratio < r.max_ratio <= 4.0, r


def test_anomaly_esd_matches_python_rounds(spark, sf_dir):
    """Replicate the 4 remove-and-rebaseline rounds in Python from an
    independent DuckDB daily rollup: same exact integer moments, same
    pinned z, same (z desc, day asc) argmax — all four extracted
    outliers must match exactly."""
    import math

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = dict(
        con.sql(
            "SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
            " AS BIGINT),"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    exp = []
    cur = dict(daily)
    for k in range(1, 5):
        n = len(cur)
        s1 = sum(cur.values())
        s2 = sum(c * c for c in cur.values())
        mu = s1 / n
        sd = math.sqrt(s2 / n - mu * mu)
        best = min(
            ((-abs(c - mu) / sd, d) for d, c in cur.items())
        )
        z = -best[0]
        d = best[1]
        exp.append((k, d, cur[d], math.floor(z * 10000 + 0.5) / 10000,
                    z > 3.0))
        del cur[d]
    rows = REGISTRY["events_anomaly_esd"].fn(spark, sf_dir).collect()
    got = [(r.esd_round, r.day_idx, r.cents, r.z, r.is_significant)
           for r in rows]
    assert got == exp


def test_point_in_polygon_matches_python_winding(spark, sf_dir):
    """Replicate the integer winding test in Python over every event
    point; per-zone counts and checksums must match exactly, and the
    planted zones must each capture points."""
    import math
    from collections import defaultdict

    from cdc_pubsub_spark.operators.joins import _PIP_ZONES
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    def inside(px, py, ring):
        for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
            if (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) < 0:
                return False
        return True

    evs = load(spark, sf_dir, "events").selectExpr(
        "event_id", "user_id", "CAST(floor(value * 100 + 0.5) AS BIGINT)"
        " AS cents"
    ).collect()
    agg = defaultdict(lambda: [0, set(), 0])
    for e in evs:
        px = (e.user_id * 37 + e.event_id * 11) % 1000
        py = (e.user_id * 53 + e.event_id * 29) % 1000
        zone = next(
            (z for z, ring in sorted(_PIP_ZONES.items())
             if inside(px, py, ring)),
            "outside",
        )
        a = agg[zone]
        a[0] += 1
        a[1].add(e.user_id)
        a[2] += e.cents
    rows = REGISTRY["join_point_in_polygon"].fn(spark, sf_dir).collect()
    assert {r.zone for r in rows} == set(agg)
    for r in rows:
        n, us, cs = agg[r.zone]
        assert (r.n_points, r.n_users, r.cents_sum) == (n, len(us), cs)
    assert len(agg) == 4, "all three zones plus outside must be hit"


def test_business_days_closed_form_vs_brute_force(spark, sf_dir):
    """Brute-force every synthesized span day-by-day (epoch day 0 =
    Thursday; weekend = (d+3)%7 in {5,6}) and compare the op's
    per-bucket totals exactly."""
    from collections import defaultdict

    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    spans = load(spark, sf_dir, "orders").filter(
        "o_orderkey % 11 = 0"
    ).selectExpr(
        "o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
        " AS BIGINT) AS d0",
        "1 + o_orderkey % 45 AS n",
    ).collect()
    agg = defaultdict(lambda: [0, 0, None, None, 0])
    for s in spans:
        biz = sum(
            1 for d in range(s.d0, s.d0 + s.n) if (d + 3) % 7 < 5
        )
        b = agg[s.n // 7]
        b[0] += 1
        b[1] += biz
        b[2] = biz if b[2] is None else min(b[2], biz)
        b[3] = biz if b[3] is None else max(b[3], biz)
        b[4] += s.n
    rows = REGISTRY["fn_business_days"].fn(spark, sf_dir).collect()
    assert {r.weeks_bucket for r in rows} == set(agg)
    for r in rows:
        n, bs, bmin, bmax, cs = agg[r.weeks_bucket]
        assert (r.n, r.biz_days_sum, r.biz_days_min, r.biz_days_max,
                r.calendar_days_sum) == (n, bs, bmin, bmax, cs)


def test_conflict_lww_resolution_matches_python(spark, sf_dir):
    """Replicate the (hlc desc, priority desc, source) resolution in
    Python over both synthesized feeds; per-source win counts,
    conflict counts, and checksums must match exactly — and the
    planted equal-HLC population must exist and always resolve to the
    higher-priority feed A."""
    from collections import defaultdict

    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    orders = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
        " AS BIGINT) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    ).collect()
    versions = defaultdict(list)
    tie_keys = set()
    for o in orders:
        if o.k % 2 == 0:
            h = o.d * 1000 + (77 if o.k % 12 == 0 else o.k % 500)
            versions[o.k].append((h, 2, "A", o.cents))
        if o.k % 3 == 0:
            h = o.d * 1000 + (77 if o.k % 12 == 0 else (o.k * 7) % 500)
            versions[o.k].append((h, 1, "B", o.cents + 11))
        if o.k % 12 == 0:
            tie_keys.add(o.k)
    agg = defaultdict(lambda: [0, 0, 0, 0])
    winner_of = {}
    for k, vs in versions.items():
        # engine order: hlc desc, prio desc, src asc  => pick max by
        # (hlc, prio) then min src
        best = sorted(vs, key=lambda t: (-t[0], -t[1], t[2]))[0]
        winner_of[k] = best[2]
        a = agg[best[2]]
        a[0] += 1
        a[1] += 1 if len(vs) > 1 else 0
        a[2] += best[3]
        a[3] += k
    assert tie_keys, "tie population must exist"
    assert all(winner_of[k] == "A" for k in tie_keys), (
        "equal HLC must resolve by priority to feed A"
    )
    rows = {r.winning_source: r for r in
            REGISTRY["cdc_conflict_lww"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for srcname, (n, nc, vc, kc) in agg.items():
        r = rows[srcname]
        assert (r.n_keys, r.n_conflicted, r.val_checksum,
                r.key_checksum) == (n, nc, vc, kc)


def test_power_analysis_matches_python(spark, sf_dir):
    """Replicate the power formulas in Python from an independent
    DuckDB cell rollup at the r2/r4 grain; sample sizes must be
    positive and grow with variance/mean² across event types."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    ZA, ZB = 1.959963984540054, 0.8416212335729143
    con = duckdb.connect()
    cells = con.sql(
        "SELECT event_type,"
        " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
        " GROUP BY event_type,"
        " CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT),"
        " user_id % 2"
    ).fetchall()
    mom = defaultdict(lambda: [0, 0, 0])
    for et, c in cells:
        m = mom[et]
        m[0] += 1
        m[1] += c
        m[2] += c * c
    rows = REGISTRY["events_power_analysis"].fn(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(mom)
    for r in rows:
        n, s1, s2 = mom[r.event_type]
        mu = s1 / n
        var = s2 / n - mu * mu
        assert r.n_cells == n
        assert r.mean_daily_dollars == math.floor(mu / 100 * 100 + 0.5) / 100
        assert r.sd_daily_dollars == math.floor(
            math.sqrt(var) / 100 * 100 + 0.5
        ) / 100
        want_n = math.ceil(2 * (ZA + ZB) ** 2 * var / (0.05 * mu) ** 2)
        assert r.n_days_per_arm_mde5pct == want_n
        want_mde = math.floor(
            (ZA + ZB) * math.sqrt(2 * var / 30.0) / mu * 10000 + 0.5
        ) / 10000
        assert r.mde_30_days == want_mde
        assert r.n_days_per_arm_mde5pct > 0


def test_abc_xyz_matches_python(spark, sf_dir):
    """Replicate the bucket-granular ABC and integer-cross-multiply
    XYZ classifications in Python from the raw lineitem; the matrix
    must match exactly and every part must land in exactly one cell."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    li = con.sql(
        "SELECT l_partkey,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),"
        " CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)"
        " // 7,"
        " CAST(l_quantity AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    rev = defaultdict(int)
    weekly = defaultdict(int)
    weeks = set()
    for pk, cents, wk, q in li:
        rev[pk] += cents
        weekly[(pk, wk)] += q
        weeks.add(wk)
    nweeks = len(weeks)
    trev = sum(rev.values())
    brev = defaultdict(int)
    for pk, rv in rev.items():
        brev[len(bin(rv)) - 2] += rv
    cls = {}
    cum = 0
    for b in sorted(brev, reverse=True):
        before = cum
        cum += brev[b]
        cls[b] = "A" if before * 100 < 80 * trev else (
            "B" if before * 100 < 95 * trev else "C"
        )
    s1 = defaultdict(int)
    s2 = defaultdict(int)
    for (pk, wk), q in weekly.items():
        s1[pk] += q
        s2[pk] += q * q
    matrix = defaultdict(lambda: [0, 0])
    for pk, rv in rev.items():
        abc = cls[len(bin(rv)) - 2]
        num = nweeks * s2[pk] - s1[pk] * s1[pk]
        xyz = "X" if num * 4 < s1[pk] ** 2 else (
            "Y" if num < s1[pk] ** 2 else "Z"
        )
        m = matrix[(abc, xyz)]
        m[0] += 1
        m[1] += rv
    rows = REGISTRY["orders_abc_xyz"].fn(spark, sf_dir).collect()
    assert {(r.abc_class, r.xyz_class) for r in rows} == set(matrix)
    for r in rows:
        n, rv = matrix[(r.abc_class, r.xyz_class)]
        assert r.n_parts == n
        assert r.rev_share == math.floor(rv / trev * 10000 + 0.5) / 10000
    assert sum(r.n_parts for r in rows) == len(rev)


def test_column_fingerprint_known_overlaps(spark, sf_dir):
    """Known-answer pins: orderstatus {O,F,P} vs linestatus {O,F}
    must score exactly 2/3; semantically unrelated column pairs must
    score 0; every signature is bounded by k and by the column's
    distinct count."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = {(r.col_a, r.col_b): r for r in
            REGISTRY["profile_column_fingerprint"].fn(spark, sf_dir).collect()}
    assert len(rows) == 15
    r = rows[("lineitem.l_linestatus", "orders.o_orderstatus")]
    assert r.jaccard == 0.6667 and r.n_common == 2
    assert rows[("lineitem.l_returnflag", "orders.o_orderstatus")].n_common == 0
    assert rows[("customer.c_mktsegment", "nation.n_name")].jaccard == 0.0
    for r in rows.values():
        assert 0 < r.sig_a <= 32 and 0 < r.sig_b <= 32
        assert 0.0 <= r.jaccard <= 1.0


def test_sliding_distinct_matches_python(spark, sf_dir):
    """Replicate the trailing-7-day distinct in Python from an
    independent DuckDB (day, user) dedup; every day's WAU and window
    coverage must match exactly, and users_7d must dominate users_1d."""
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    du = con.sql(
        "SELECT DISTINCT CAST(epoch_us(CAST(ts AS TIMESTAMP))"
        " // 86400000000 AS BIGINT) AS d, user_id"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by_day = defaultdict(set)
    for d, u in du:
        by_day[d].add(u)
    rows = REGISTRY["events_sliding_distinct_users"].fn(spark, sf_dir).collect()
    assert {r.day_idx for r in rows} == set(by_day)
    for r in rows:
        window_days = [d for d in by_day if r.day_idx - 6 <= d <= r.day_idx]
        exp7 = set().union(*(by_day[d] for d in window_days))
        assert r.users_1d == len(by_day[r.day_idx])
        assert r.users_7d == len(exp7), r.day_idx
        assert r.days_in_window == len(window_days)
        assert r.users_7d >= r.users_1d


def test_luhn_detects_every_planted_corruption(spark, sf_dir):
    """Structural pin: Luhn detects every single-digit substitution,
    so only two (validity × corrupted) cells may exist, with counts
    matching the %5 planted split exactly."""
    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    rows = {(r.luhn_valid, r.corrupted): r for r in
            REGISTRY["fn_luhn_checksum"].fn(spark, sf_dir).collect()}
    assert set(rows) == {(True, False), (False, True)}
    keys = [r.o_orderkey for r in
            load(spark, sf_dir, "orders").select("o_orderkey").collect()]
    n_corr = sum(1 for k in keys if k % 5 == 0)
    assert rows[(False, True)].n == n_corr
    assert rows[(True, False)].n == len(keys) - n_corr
    assert rows[(False, True)].key_checksum == sum(
        k for k in keys if k % 5 == 0
    )


def test_pk_discovery_known_keys(spark, sf_dir):
    """Every candidate's verdict is recomputed from an independent
    DuckDB distinct count; the known true keys (o_orderkey, c_custkey)
    must verify, the known non-keys must not, and the fixture's
    surprising fact — (l_orderkey, l_linenumber) is NOT unique in this
    generator, unlike dbgen — must be surfaced, not assumed away."""
    import duckdb

    from cdc_pubsub_spark.operators.advanced import _PK_CANDIDATES
    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    rows = {r.candidate: r for r in
            REGISTRY["profile_pk_discovery"].fn(spark, sf_dir).collect()}
    assert set(rows) == {label for label, _t, _c in _PK_CANDIDATES}
    for label, tbl, cols in _PK_CANDIDATES:
        tup = "(" + ", ".join(cols) + ")"
        n, nd = con.sql(
            f"SELECT count(*), count(DISTINCT {tup})"
            f" FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        ).fetchone()
        r = rows[label]
        assert (r.n_rows, r.n_distinct) == (n, nd), label
        assert r.is_key == (n == nd)
        assert (r.uniqueness == 1.0) == r.is_key or nd != n
    assert rows["orders(o_orderkey)"].is_key
    assert rows["customer(c_custkey)"].is_key
    assert not rows["lineitem(l_orderkey)"].is_key
    assert not rows["orders(o_custkey)"].is_key
    assert not rows["lineitem(l_orderkey,l_linenumber)"].is_key, (
        "fixture generator draws linenumbers independently"
    )


def test_theil_sen_matches_python_and_is_robust(spark, sf_dir):
    """Replicate the pairwise-slope median in Python from an
    independent DuckDB daily rollup (exact order statistic, same tie
    order); also verify the estimator's defining property on a
    synthetic check: corrupting one point of a clean line leaves the
    Python Theil-Sen slope at 1 while OLS moves."""
    import math

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = sorted(
        con.sql(
            "SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
            " AS BIGINT),"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    slopes = []
    for ii in range(len(daily)):
        for jj in range(ii + 1, len(daily)):
            (di, ci), (dj, cj) = daily[ii], daily[jj]
            slopes.append(((cj - ci) / (dj - di), di, dj))
    slopes.sort()
    n = len(slopes)
    med = slopes[(n + 1) // 2 - 1][0]
    b0s = sorted((c - med * d, d) for d, c in daily)
    b0 = b0s[(len(b0s) + 1) // 2 - 1][0]
    r = REGISTRY["ts_theil_sen"].fn(spark, sf_dir).collect()[0]
    assert r.n_pairs == n
    assert r.theil_sen_slope == math.floor(med * 10000 + 0.5) / 10000
    assert r.intercept_cents == math.floor(b0 * 100 + 0.5) / 100
    # Robustness canonical check (pure python, defines the estimator):
    pts = [(x, float(x)) for x in range(1, 12)]
    pts[5] = (6, 1000.0)
    sl = sorted(
        (y2 - y1) / (x2 - x1)
        for i2, (x1, y1) in enumerate(pts)
        for x2, y2 in pts[i2 + 1:]
    )
    assert abs(sl[(len(sl) + 1) // 2 - 1] - 1.0) < 0.01


def test_receivables_aging_matches_python(spark, sf_dir):
    """Replicate the aging buckets and DSO in Python from the raw
    orders; bucket totals, shares, and DSO must match exactly, and
    every open order must land in exactly one bucket."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    orders = con.sql(
        "SELECT o_orderstatus,"
        " CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT),"
        " CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    as_of = max(d for _s, d, _c in orders)
    dmin = min(d for _s, d, _c in orders)
    total = sum(c for _s, _d, c in orders)
    span = as_of - dmin + 1
    agg = defaultdict(lambda: [0, 0])
    n_open = 0
    for s, d, c in orders:
        if s == "F":
            continue
        n_open += 1
        age = as_of - d
        b = ("0-030" if age <= 30 else "031-060" if age <= 60
             else "061-090" if age <= 90 else "090+")
        agg[b][0] += 1
        agg[b][1] += c
    rows = REGISTRY["orders_receivables_aging"].fn(spark, sf_dir).collect()
    assert {r.bucket for r in rows} == set(agg)
    assert sum(r.n_open for r in rows) == n_open
    for r in rows:
        n, cents = agg[r.bucket]
        assert (r.n_open, r.ar_cents) == (n, cents)
        assert r.share_of_sales == math.floor(
            cents / total * 10000 + 0.5
        ) / 10000
        assert r.dso_days == math.floor(
            cents / (total / span) * 100 + 0.5
        ) / 100


def test_counter_repair_matches_python(spark, sf_dir):
    """Replicate the reset-aware repair in Python from an independent
    DuckDB ordering of each user's readings; totals and reset counts
    must match exactly, and the repaired total must always exceed the
    raw last reading (resets guarantee lost mass)."""
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    seq = con.sql(
        "SELECT user_id, row_number() OVER ("
        " PARTITION BY user_id ORDER BY event_id) AS pos"
        f" FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by_user = defaultdict(list)
    for u, pos in seq:
        by_user[u].append(pos)
    exp = {}
    for u, poss in by_user.items():
        readings = [
            (p * 100 + (u + p) % 7) % 3000 for p in sorted(poss)
        ]
        resets, total, prev = 0, 0, None
        for c in readings:
            if prev is None:
                total += c
            elif c - prev < 0:
                resets += 1
                total += c
            else:
                total += c - prev
            prev = c
        if resets > 0:
            exp[u] = (len(readings), resets, total, max(readings))
    want = sorted(exp)[:50]
    rows = REGISTRY["events_counter_rollover_repair"].fn(
        spark, sf_dir
    ).collect()
    assert [r.user_id for r in rows] == want
    for r in rows:
        n, resets, total, mx = exp[r.user_id]
        assert (r.n_readings, r.n_resets, r.true_total, r.last_raw) == (
            n, resets, total, mx,
        )
        assert r.true_total >= mx


def test_revenue_bridge_residual_vanishes(spark, sf_dir):
    """The two-factor bridge identity r1−r0 = Δq·p0 + Δp·q1 is exact,
    so the residual column must be 0 for every brand and the rounded
    effects must reassemble the delta within the 1-cent rounding
    grain — anchoring either effect on the wrong year breaks both."""
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["orders_revenue_bridge"].fn(spark, sf_dir).collect()
    assert rows, "two-year overlap must exist at every sf"
    for r in rows:
        assert r.residual_cents == 0, r
        assert abs(
            r.delta_cents - r.volume_effect_cents - r.price_effect_cents
        ) <= 1, r


def test_fk_discovery_verdicts_and_recount(spark, sf_dir):
    """The five real FKs must verify at containment 1; the planted
    wrong pair must come out partial (neither 0 nor 1 — the
    false-signal case); every coefficient matches an independent
    DuckDB recount."""
    import math

    import duckdb

    from cdc_pubsub_spark.operators.advanced import _FK_CANDIDATES
    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    rows = {r.candidate: r for r in
            REGISTRY["profile_fk_discovery"].fn(spark, sf_dir).collect()}
    for label, ct, cc, pt, pc in _FK_CANDIDATES:
        nc, ncont = con.sql(
            f"SELECT count(DISTINCT c.{cc}),"
            f" count(DISTINCT CASE WHEN p.{pc} IS NOT NULL"
            f" THEN c.{cc} END)"
            f" FROM read_parquet('{sf_dir}/{ct}.parquet') c"
            f" LEFT JOIN read_parquet('{sf_dir}/{pt}.parquet') p"
            f" ON p.{pc} = c.{cc}"
        ).fetchone()
        r = rows[label]
        assert (r.n_child_values, r.n_contained) == (nc, ncont), label
        assert r.containment == math.floor(
            ncont / nc * 10000 + 0.5
        ) / 10000
        assert r.is_fk == (nc == ncont)
    wrong = rows["orders.o_custkey->supplier.s_suppkey"]
    assert not wrong.is_fk and 0.0 < wrong.containment < 1.0
    for label in (
        "lineitem.l_orderkey->orders.o_orderkey",
        "orders.o_custkey->customer.c_custkey",
        "customer.c_nationkey->nation.n_nationkey",
        "lineitem.l_partkey->part.p_partkey",
        "lineitem.l_suppkey->supplier.s_suppkey",
    ):
        assert rows[label].is_fk, label


def test_order_to_cash_matches_python(spark, sf_dir):
    """Replicate first-ship latency stats in Python from raw tables;
    exact equality per priority, and latencies must be non-negative
    (shipments cannot precede their order in the generator)."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    rows_raw = con.sql(
        "SELECT o.o_orderpriority,"
        " CAST(min(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01')"
        " AS BIGINT)"
        " - CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'"
        " AS BIGINT) AS days"
        f" FROM read_parquet('{sf_dir}/orders.parquet') o"
        f" JOIN read_parquet('{sf_dir}/lineitem.parquet') l"
        " ON l.l_orderkey = o.o_orderkey"
        " GROUP BY o.o_orderkey, o.o_orderpriority,"
        " CAST(o.o_orderdate AS DATE)"
    ).fetchall()
    agg = defaultdict(list)
    for pri, days in rows_raw:
        agg[pri].append(days)
    rows = REGISTRY["orders_order_to_cash"].fn(spark, sf_dir).collect()
    assert {r.priority for r in rows} == set(agg)
    for r in rows:
        ds = agg[r.priority]
        assert r.n_orders == len(ds)
        assert (r.min_days, r.max_days) == (min(ds), max(ds))
        assert r.avg_days == math.floor(
            sum(ds) / len(ds) * 100 + 0.5
        ) / 100
        assert r.n_within_week == sum(1 for d in ds if d <= 7)
        assert r.n_impossible == sum(1 for d in ds if d < 0)
    # The fixture draws shipdates independently of order dates, so the
    # temporal-integrity column must be decisively nonzero here — the
    # audit half of the op is exercised, not vacuous.
    assert sum(r.n_impossible for r in rows) > 0


def test_shard_balance_matches_hashlib(spark, sf_dir):
    """Replicate the assignment with hashlib md5 (same 8-hex prefix
    mod 16); per-shard totals and the fleet-wide skew ratio must match
    exactly, shares must sum to ~1, and the hash must actually spread
    (no shard empty, no shard above 3x ideal at fixture scale)."""
    import hashlib
    import math
    from collections import defaultdict

    from cdc_pubsub_spark.registry import REGISTRY
    from cdc_pubsub_spark.tables import load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    agg = defaultdict(lambda: [0, 0])
    for d in docs:
        h = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:8], 16) % 16
        agg[h][0] += 1
        agg[h][1] += d.n_chars
    tc = sum(c for _n, c in agg.values())
    mx = max(c for _n, c in agg.values())
    rows = REGISTRY["corpus_shard_balance"].fn(spark, sf_dir).collect()
    assert {r.shard for r in rows} == set(agg)
    skew = math.floor(mx / (tc / len(agg)) * 10000 + 0.5) / 10000
    for r in rows:
        n, c = agg[r.shard]
        assert (r.n_docs, r.chars) == (n, c)
        assert r.char_share == math.floor(c / tc * 10000 + 0.5) / 10000
        assert r.max_skew_ratio == skew
    assert abs(sum(r.char_share for r in rows) - 1.0) < 0.01
    assert skew < 3.0


def test_warc_parse_on_handcrafted_record(spark):
    """Pin the header walk and payload offset on a handcrafted WARC
    record: type/URI/declared-length extraction and the
    double-CRLF payload boundary must come out exactly."""
    warc = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://web.example.com/42\r\n"
        "WARC-Date: 2024-03-07T03:14:15Z\r\n"
        "Content-Length: 11\r\n\r\nhello world"
    )
    row = spark.sql(
        "SELECT"
        " element_at(split(substring(warc, 1, instr(warc,"
        " '\\r\\n\\r\\n') - 1), '\\r\\n'), 2) AS type_line,"
        " substring(warc, instr(warc, '\\r\\n\\r\\n') + 4) AS payload"
        f" FROM (SELECT '{warc}' AS warc)".replace("\r", "\\r").replace(
            "\n", "\\n"
        )
    ).collect()[0]
    assert row.type_line == "WARC-Type: response"
    assert row.payload == "hello world"
    from cdc_pubsub_spark.registry import REGISTRY

    rows = REGISTRY["scan_warc_records"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_length_ok == r.n_records, (
            "every record's Content-Length must match its payload"
        )
        assert r.rec_type in ("request", "response")


def test_shesd_matches_python_rounds(spark, sf_dir):
    """Replicate seasonal-median removal + 3 ESD rounds in Python from
    an independent DuckDB daily rollup — all extracted days, residuals
    and z-scores must match exactly."""
    import math
    from collections import defaultdict

    import duckdb

    from cdc_pubsub_spark.registry import REGISTRY

    con = duckdb.connect()
    daily = dict(
        con.sql(
            "SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
            " AS BIGINT),"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    groups = defaultdict(list)
    for d, c in daily.items():
        groups[d % 7].append(c)
    med = {
        dow: sorted(cs)[(len(cs) + 1) // 2 - 1] for dow, cs in groups.items()
    }
    cur = {d: c - med[d % 7] for d, c in daily.items()}
    exp = []
    for k in range(1, 4):
        n = len(cur)
        s1 = sum(cur.values())
        s2 = sum(v * v for v in cur.values())
        mu = s1 / n
        sd = math.sqrt(s2 / n - mu * mu)
        z, d = min((-abs(v - mu) / sd, dd) for dd, v in cur.items())
        z = -z
        exp.append(
            (k, d, daily[d], cur[d], math.floor(z * 10000 + 0.5) / 10000,
             z > 3.0)
        )
        del cur[d]
    rows = REGISTRY["events_anomaly_shesd"].fn(spark, sf_dir).collect()
    got = [
        (r.shesd_round, r.day_idx, r.cents, r.resid_cents, r.z,
         r.is_significant)
        for r in rows
    ]
    assert got == exp
