"""r12 staged operators: KMV epoch rollup, AR(2) Yule-Walker, polygon
overlay. See package docstring for why these are unregistered.

Each entry is the standard registry shape — ``fn(spark, sf_dir) ->
DataFrame`` plus exact DuckDB oracle SQL in ``ORACLES`` — so promotion
is mechanical. Determinism devices follow the house rules (SURVEY §2.B
preamble): integer-quantized algebra before any order-sensitive sum,
floor-formula rounding, total-ordered LIMITs, identical column aliases
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.llmops.dedup import _MINHASH_AB, _MINHASH_P
from cdc_pubsub_spark.tables import finalize_cached, load

# Portable 60-bit hash (the r11 dedup_minhash_banded bridge — md5 is
# the one hash family Spark and DuckDB share bit-for-bit).
_PORTABLE_HASH_SPARK = (
    "cast(conv(substr(md5(cast(user_id AS STRING)), 1, 15), 16, 10)"
    " as bigint)"
)
_PORTABLE_HASH_DUCK = (
    "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
)

_KMV_K = 64
# Hashes are uniform on [0, 2^60); the KMV estimate divides (k-1) by
# the k-th smallest. To keep the numerator in int64 the hash is
# order-preservingly reduced to [0, 2^40) (integer div by 2^20):
# (k-1) * 2^40 = 63 * 1.1e12 ≈ 6.9e13 — ANSI-safe at any scale.
_KMV_DOMAIN = 1 << 40
_KMV_SHIFT = 1 << 20


def agg_kmv_epoch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user estimation by KMV (k-minimum-values)
    sketch MERGE across 5-day epochs — the mergeable-sketch rollup a
    CDC pipeline runs when "distinct users to date" must be cheap at
    every epoch boundary without rescanning history.

    Per epoch the sketch is the k=64 smallest DISTINCT portable hashes
    (exact top-k-per-group: one distinct shuffle then a rank ≤ k
    window — WindowGroupLimit, bounded state, the 100 TB shape). The
    cumulative sketch for epoch e is the MERGE of epochs 0..e: union
    the (≤ #epochs × k)-row sketch relation, take the k smallest
    again — sketch merges never touch the data a second time, which
    is the entire point of KMV. Estimate = (k−1)·2^40 div h_k
    (integer division on the order-preservingly reduced hash: both
    engines produce the identical integer); when a prefix holds fewer
    than k distinct hashes the estimate is the exact sketch size
    (standard KMV small-cardinality rule — exercised at sf0.001 where
    only 15 users exist). The reduced divisor is clamped to ≥1 on both
    engines: hk div 2^20 = 0 needs the k-th smallest 60-bit hash below
    2^20 (~2^46 distinct users), astronomically unlikely but not a
    reason to leave a /0 on the estimating branch. ``exact_users`` rides along via the
    first-epoch-per-user trick (min(epoch) per user + running count —
    one distinct agg, no prefix re-scans), so the oracle certifies
    estimate AND truth.
    """
    ev = load(spark, sf_dir, "events").selectExpr(
        "int(dayofmonth(ts) - 1) div 5 AS epoch",
        f"{_PORTABLE_HASH_SPARK} AS h",
        "user_id",
    )
    hashes = ev.select("epoch", "h").distinct().persist()
    from pyspark.sql.window import Window

    w = Window.partitionBy("epoch").orderBy("h")
    sketch = (
        hashes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .select("epoch", "h")
    )
    # Merge: every epoch e sees every sketch row from f <= e; the
    # sketch relation is tiny (#epochs × k), so the theta-join is a
    # broadcast of sketch rows, never data.
    epochs = hashes.select("epoch").distinct().alias("e")
    merged = epochs.join(
        F.broadcast(sketch.alias("s")),
        F.col("s.epoch") <= F.col("e.epoch"),
    ).select(F.col("e.epoch").alias("epoch"), "h").distinct()
    wm = Window.partitionBy("epoch").orderBy("h")
    kth = (
        merged.withColumn("rk", F.row_number().over(wm))
        .groupBy("epoch")
        .agg(
            F.max("rk").cast("bigint").alias("sketch_size"),
            F.max(
                F.when(F.col("rk") == _KMV_K, F.col("h"))
            ).alias("hk"),
        )
        .selectExpr(
            "epoch",
            "sketch_size",
            # greatest(..., 1): the reduced k-th hash is zero only if
            # hk < 2^20 (≈ requires 2^46 distinct users — but an
            # unguarded /0 on the estimating branch is still a bug;
            # round-11 ADVICE). Clamp identically on both engines.
            f"CASE WHEN sketch_size < {_KMV_K} THEN sketch_size "
            f"ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN}L div "
            f"greatest(hk div {_KMV_SHIFT}, 1L) END AS est_users",
        )
    )
    first_epoch = (
        load(spark, sf_dir, "events")
        .selectExpr("int(dayofmonth(ts) - 1) div 5 AS epoch", "user_id")
        .groupBy("user_id")
        .agg(F.min("epoch").alias("fe"))
        .groupBy("fe")
        .agg(F.count(F.lit(1)).alias("nu"))
    )
    # Every rollup epoch needs its exact row even when no NEW user
    # appears in it (with a small user domain everyone is seen in
    # epoch 0): carry the cumulative count to all epochs via the same
    # tiny broadcast theta-join used for the sketch merge.
    exact = (
        epochs.join(
            F.broadcast(first_epoch), F.col("fe") <= F.col("e.epoch")
        )
        .groupBy(F.col("e.epoch").alias("epoch"))
        .agg(F.sum("nu").cast("bigint").alias("exact_users"))
    )
    out = (
        kth.join(exact, "epoch")
        .select("epoch", "sketch_size", "est_users", "exact_users")
        .orderBy("epoch")
    )
    return finalize_cached(out, hashes)


ORACLE_KMV = f"""
    WITH ev AS (
      SELECT (CAST(dayofmonth(ts) AS INT) - 1) // 5 AS epoch,
             {_PORTABLE_HASH_DUCK} AS h, user_id
      FROM events
    ),
    hashes AS (SELECT DISTINCT epoch, h FROM ev),
    sketch AS (
      SELECT epoch, h FROM (
        SELECT epoch, h,
               row_number() OVER (PARTITION BY epoch ORDER BY h) AS rk
        FROM hashes
      ) WHERE rk <= {_KMV_K}
    ),
    merged AS (
      SELECT DISTINCT e.epoch, s.h
      FROM (SELECT DISTINCT epoch FROM hashes) e
      JOIN sketch s ON s.epoch <= e.epoch
    ),
    kth AS (
      SELECT epoch,
             CAST(max(rk) AS BIGINT) AS sketch_size,
             max(CASE WHEN rk = {_KMV_K} THEN h END) AS hk
      FROM (
        SELECT epoch, h,
               row_number() OVER (PARTITION BY epoch ORDER BY h) AS rk
        FROM merged
      ) GROUP BY epoch
    ),
    fe AS (
      SELECT min((CAST(dayofmonth(ts) AS INT) - 1) // 5) AS fe
      FROM events GROUP BY user_id
    ),
    fec AS (SELECT fe, count(*) AS nu FROM fe GROUP BY fe),
    exact AS (
      SELECT e.epoch, CAST(sum(f.nu) AS BIGINT) AS exact_users
      FROM (SELECT DISTINCT epoch FROM hashes) e
      JOIN fec f ON f.fe <= e.epoch
      GROUP BY e.epoch
    )
    SELECT k.epoch, k.sketch_size,
           CASE WHEN k.sketch_size < {_KMV_K} THEN k.sketch_size
                ELSE ({_KMV_K} - 1) * {_KMV_DOMAIN}
                     // greatest(k.hk // {_KMV_SHIFT}, 1)
           END AS est_users,
           e.exact_users
    FROM kth k JOIN exact e ON e.epoch = k.epoch
    ORDER BY k.epoch
    """


def ts_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) coefficients per event_type via Yule-Walker over the
    daily value series — the first real model-fitting step of a
    forecasting pipeline (orders_forecast_* are smoothers; this is the
    autoregressive tier).

    Determinism: the daily series quantizes to integer cents, and the
    mean-centered autocovariances use the n-scaled integer identity
    (x_t−μ)(x_{t+k}−μ)·n² = (n·x_t−S)(n·x_{t+k}−S) — exact integers,
    but the products exceed int64 at bench scale (n·x ≈ 5e9, squared
    ≈ 2.5e19), so both engines compute them in their exact wide type
    (Spark DECIMAL(38,0), DuckDB HUGEINT — the ridge-moments pattern,
    llmops/ml.py). The YW solve uses micro-quantized integer ratios
    r_k = G_k·10^6 div G_0 (identical integers cross-engine), then
    φ1 = r1(1−r2)/(1−r1²), φ2 = (r2−r1²)/(1−r1²) in DOUBLE, rounded
    4dp. Lag alignment is by ROW sequence over the ordered existing
    days (missing fixture days shift the sequence identically on both
    engines). Scale: one data-sized groupBy to the daily grid, then
    per-type windows over ≤31 rows — partitioned, bounded, no global
    window.

    Degenerate-series rule: groups with zero variance (g0 = 0 —
    constant daily series) are dropped, and |r1| = 1 (zero Yule-Walker
    denominator) yields NULL phi1/phi2 — identical CASE on both
    engines, so the contract holds beyond the fixture distributions.
    """
    from pyspark.sql.window import Window

    daily = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(date_trunc('DAY', ts) AS DATE) AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(
            F.expr(
                "CAST(floor(sum(value) * 100 + 0.5) AS BIGINT)"
            ).alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
    )
    wide = "DECIMAL(38,0)"
    g = (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x").cast(wide) * F.col("x").cast(wide)).alias("sxx"),
            F.sum(F.col("x").cast(wide) * F.col("x1").cast(wide)).alias("sx1"),
            F.sum(F.col("x").cast(wide) * F.col("x2").cast(wide)).alias("sx2"),
            F.sum(F.when(F.col("x1").isNotNull(), F.col("x"))).alias("sa1"),
            F.sum(F.when(F.col("x1").isNotNull(), F.col("x1"))).alias("sb1"),
            F.sum(F.when(F.col("x2").isNotNull(), F.col("x"))).alias("sa2"),
            F.sum(F.when(F.col("x2").isNotNull(), F.col("x2"))).alias("sb2"),
            F.count("x1").alias("n1"),
            F.count("x2").alias("n2"),
        )
    )
    # n-scaled centered moments (exact integers in DECIMAL(38,0)):
    # G0 = n·Σx² − S², Gk = n·Σ(x_t·x_{t−k}) − S·Σx_t|pairs −
    #      S·Σx_{t−k}|pairs + m_k·S² scaled consistently — to keep the
    # algebra simple (and IDENTICAL on both engines) the covariances
    # use the per-lag pair means: Gk = n_k·Σ(x·x_k) − Σx|k·Σx_k|k,
    # G0 likewise with n and S. Ratios are micro-quantized integers.
    expr = (
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(s AS DECIMAL(38,0)) * s"
    )
    g1 = (
        "CAST(n1 AS DECIMAL(38,0)) * sx1 -"
        " CAST(sa1 AS DECIMAL(38,0)) * sb1"
    )
    g2 = (
        "CAST(n2 AS DECIMAL(38,0)) * sx2 -"
        " CAST(sa2 AS DECIMAL(38,0)) * sb2"
    )
    out = (
        g.selectExpr(
            "event_type",
            "n",
            f"({expr}) AS g0",
            f"({g1}) AS g1v",
            f"({g2}) AS g2v",
        )
        # Degenerate-series rule (round-11 ADVICE): a CONSTANT series
        # has g0 = 0 (no variance — autocorrelation undefined), and a
        # perfectly alternating/linear one can hit |r1| = 1 (zero YW
        # denominator). Neither occurs in the fixtures, but the op's
        # contract is cross-engine identity at ANY input: g0 = 0 rows
        # are dropped (Spark `div` NULLs where DuckDB `//` errors —
        # divergent), and |r1| = 1 emits NULL coefficients via the
        # same CASE on both engines.
        .filter("g0 <> 0")
        .selectExpr(
            "event_type",
            "n",
            "CAST(g1v * 1000000 div g0 AS BIGINT) AS r1m",
            "CAST(g2v * 1000000 div g0 AS BIGINT) AS r2m",
        )
        .selectExpr(
            "event_type",
            "n AS n_days",
            "floor(CAST(r1m AS DOUBLE) / 1e6 * 10000 + 0.5) / 10000 AS r1",
            "floor(CAST(r2m AS DOUBLE) / 1e6 * 10000 + 0.5) / 10000 AS r2",
            "CASE WHEN r1m * r1m = 1000000000000"
            " THEN CAST(NULL AS DOUBLE) ELSE"
            " floor((CAST(r1m AS DOUBLE) / 1e6)"
            " * (1e0 - CAST(r2m AS DOUBLE) / 1e6)"
            " / (1e0 - (CAST(r1m AS DOUBLE) / 1e6)"
            "         * (CAST(r1m AS DOUBLE) / 1e6))"
            " * 10000 + 0.5) / 10000 END AS phi1",
            "CASE WHEN r1m * r1m = 1000000000000"
            " THEN CAST(NULL AS DOUBLE) ELSE"
            " floor((CAST(r2m AS DOUBLE) / 1e6"
            "  - (CAST(r1m AS DOUBLE) / 1e6)"
            "    * (CAST(r1m AS DOUBLE) / 1e6))"
            " / (1e0 - (CAST(r1m AS DOUBLE) / 1e6)"
            "         * (CAST(r1m AS DOUBLE) / 1e6))"
            " * 10000 + 0.5) / 10000 END AS phi2",
        )
        .orderBy("event_type")
    )
    return out


ORACLE_AR2 = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, x,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY d) AS x1,
             lag(x, 2) OVER (PARTITION BY event_type ORDER BY d) AS x2
      FROM daily
    ),
    g AS (
      SELECT event_type,
             count(*) AS n,
             sum(x) AS s,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * x1) AS sx1,
             sum(CAST(x AS HUGEINT) * x2) AS sx2,
             sum(CASE WHEN x1 IS NOT NULL THEN x END) AS sa1,
             sum(CASE WHEN x1 IS NOT NULL THEN x1 END) AS sb1,
             sum(CASE WHEN x2 IS NOT NULL THEN x END) AS sa2,
             sum(CASE WHEN x2 IS NOT NULL THEN x2 END) AS sb2,
             count(x1) AS n1,
             count(x2) AS n2
      FROM lagged GROUP BY event_type
    ),
    mom AS (
      SELECT event_type, n,
             CAST(n AS HUGEINT) * sxx - CAST(s AS HUGEINT) * s AS g0,
             CAST(n1 AS HUGEINT) * sx1
               - CAST(sa1 AS HUGEINT) * sb1 AS g1v,
             CAST(n2 AS HUGEINT) * sx2
               - CAST(sa2 AS HUGEINT) * sb2 AS g2v
      FROM g
    ),
    ratios AS (
      SELECT event_type, n,
             CAST(g1v * 1000000 // g0 AS BIGINT) AS r1m,
             CAST(g2v * 1000000 // g0 AS BIGINT) AS r2m
      FROM mom
      WHERE g0 <> 0
    )
    SELECT event_type, n AS n_days,
           floor(CAST(r1m AS DOUBLE) / 1e6 * 10000 + 0.5) / 10000 AS r1,
           floor(CAST(r2m AS DOUBLE) / 1e6 * 10000 + 0.5) / 10000 AS r2,
           CASE WHEN r1m * r1m = 1000000000000
                THEN CAST(NULL AS DOUBLE) ELSE
           floor((CAST(r1m AS DOUBLE) / 1e6)
                 * (1e0 - CAST(r2m AS DOUBLE) / 1e6)
                 / (1e0 - (CAST(r1m AS DOUBLE) / 1e6)
                        * (CAST(r1m AS DOUBLE) / 1e6))
                 * 10000 + 0.5) / 10000 END AS phi1,
           CASE WHEN r1m * r1m = 1000000000000
                THEN CAST(NULL AS DOUBLE) ELSE
           floor((CAST(r2m AS DOUBLE) / 1e6
                  - (CAST(r1m AS DOUBLE) / 1e6)
                    * (CAST(r1m AS DOUBLE) / 1e6))
                 / (1e0 - (CAST(r1m AS DOUBLE) / 1e6)
                        * (CAST(r1m AS DOUBLE) / 1e6))
                 * 10000 + 0.5) / 10000 END AS phi2
    FROM ratios
    ORDER BY event_type
    """


# Deterministic rectangle fixtures derived from nation/supplier keys —
# two overlapping 5×5 layouts with different strides so intersections
# exist but are not total. Keys reduce `% 1048576` FIRST (identity at
# every shipped sf; the 10×-probe tree's replica-shifted keys ~2^40
# otherwise overflow the INT rectangle coordinates — this op was the
# probe's third catch of that class, at staging time).
_RECT_A_SPARK = (
    "SELECT n_nationkey AS rid_a,"
    " ((n_nationkey % 1048576) % 5) * 10 AS x0a,"
    " ((n_nationkey % 1048576) div 5) * 10 AS y0a,"
    " ((n_nationkey % 1048576) % 5) * 10 + 8 + (n_nationkey % 3) AS x1a,"
    " ((n_nationkey % 1048576) div 5) * 10 + 7 + (n_nationkey % 4) AS y1a"
)
_RECT_B_SPARK = (
    "SELECT s_suppkey AS rid_b,"
    " ((s_suppkey % 1048576) % 6) * 9 + 3 AS x0b,"
    " ((s_suppkey % 1048576) div 6) * 9 + 2 AS y0b,"
    " ((s_suppkey % 1048576) % 6) * 9 + 3 + 6 + (s_suppkey % 5) AS x1b,"
    " ((s_suppkey % 1048576) div 6) * 9 + 2 + 5 + (s_suppkey % 7) AS y1b"
)


def join_polygon_overlay_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise overlay AREAS between two axis-aligned rectangle sets
    (nation-derived layer A × supplier-derived layer B) — the spatial
    overlay join done the scale way: cover each rectangle with 10×10
    grid cells (explode of a bounded sequence), EQUI-join on the cell,
    dedup candidate pairs, then the exact row-local intersection test
    — never rectangle × rectangle. At 100 TB this is the standard
    spatial partitioning recipe (grid/quadtree bucket join); fan-out
    per rectangle is its cell cover, bounded by geometry size, not by
    layer cardinality. The oracle cross-checks with the direct
    quadratic overlay (fine at fixture scale — it is the declared
    ground-truth twin, same relationship as dedup_near to the minhash
    tiers).

    Output: one row per intersecting pair with the exact integer
    intersection area, total-ordered (area desc, rid_a, rid_b),
    top 20.
    """
    nation = load(spark, sf_dir, "nation")
    supplier = load(spark, sf_dir, "supplier")
    nation.createOrReplaceTempView("nation_tv")
    supplier.createOrReplaceTempView("supplier_tv")
    ra = spark.sql(_RECT_A_SPARK + " FROM nation_tv")
    rb = spark.sql(_RECT_B_SPARK + " FROM supplier_tv")
    # Cell id = cx·2^32 + cy in BIGINT — collision-free for any
    # in-range coordinate (an int32-packed id collides across columns
    # at probe-tree coordinates; collisions only cost extra verified
    # candidates, but free is free).
    ca = ra.select(
        "rid_a", "x0a", "y0a", "x1a", "y1a",
        F.explode(
            F.expr(
                "flatten(transform(sequence(y0a div 10,"
                " (y1a - 1) div 10), cy ->"
                " transform(sequence(x0a div 10,"
                " (x1a - 1) div 10), cx ->"
                " cast(cx as bigint) * 4294967296 + cy)))"
            )
        ).alias("cell"),
    )
    cb = rb.select(
        "rid_b", "x0b", "y0b", "x1b", "y1b",
        F.explode(
            F.expr(
                "flatten(transform(sequence(y0b div 10,"
                " (y1b - 1) div 10), cy ->"
                " transform(sequence(x0b div 10,"
                " (x1b - 1) div 10), cx ->"
                " cast(cx as bigint) * 4294967296 + cy)))"
            )
        ).alias("cell"),
    )
    ix = "greatest(0, least(x1a, x1b) - greatest(x0a, x0b))"
    iy = "greatest(0, least(y1a, y1b) - greatest(y0a, y0b))"
    out = (
        ca.join(cb, "cell")
        .select("rid_a", "rid_b", "x0a", "y0a", "x1a", "y1a",
                "x0b", "y0b", "x1b", "y1b")
        .distinct()
        .selectExpr(
            "rid_a", "rid_b",
            f"CAST(({ix}) * ({iy}) AS BIGINT) AS area",
        )
        .filter(F.col("area") > 0)
        .orderBy(F.desc("area"), "rid_a", "rid_b")
        .limit(20)
    )
    return out


ORACLE_OVERLAY = """
    WITH ra AS (
      SELECT n_nationkey AS rid_a,
             ((n_nationkey % 1048576) % 5) * 10 AS x0a,
             ((n_nationkey % 1048576) // 5) * 10 AS y0a,
             ((n_nationkey % 1048576) % 5) * 10 + 8
               + (n_nationkey % 3) AS x1a,
             ((n_nationkey % 1048576) // 5) * 10 + 7
               + (n_nationkey % 4) AS y1a
      FROM nation
    ),
    rb AS (
      SELECT s_suppkey AS rid_b,
             ((s_suppkey % 1048576) % 6) * 9 + 3 AS x0b,
             ((s_suppkey % 1048576) // 6) * 9 + 2 AS y0b,
             ((s_suppkey % 1048576) % 6) * 9 + 3 + 6
               + (s_suppkey % 5) AS x1b,
             ((s_suppkey % 1048576) // 6) * 9 + 2 + 5
               + (s_suppkey % 7) AS y1b
      FROM supplier
    )
    SELECT rid_a, rid_b,
           CAST(greatest(0, least(x1a, x1b) - greatest(x0a, x0b))
                * greatest(0, least(y1a, y1b) - greatest(y0a, y0b))
                AS BIGINT) AS area
    FROM ra CROSS JOIN rb
    WHERE greatest(0, least(x1a, x1b) - greatest(x0a, x0b))
          * greatest(0, least(y1a, y1b) - greatest(y0a, y0b)) > 0
    ORDER BY area DESC, rid_a, rid_b
    LIMIT 20
    """


def ts_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy spectrum per event_type over the first 16
    days of the daily-value series — the multi-resolution companion to
    ts_periodogram (Fourier asks "which frequency", Haar asks "which
    SCALE carries the variance"; level 1 = day-to-day noise, level 4 =
    week-scale drift). Four decomposition levels; per level the energy
    is Σ detail² over the pairwise-difference coefficients.

    Determinism: the series quantizes to integer cents, and all
    coefficients stay EXACT integers in the wide type (detail² reaches
    ~1e20 at bench scale — past int64, the ridge DECIMAL(38,0) /
    HUGEINT pattern again); the reported energy is the exact integer
    div 10^6 (micro-energy), never a float sum. Series assembly is
    sort_array(collect_list(struct(day, x))) — the struct sort pins
    the order, collect_list alone is shuffle-order-dependent. Scale:
    one data-sized groupBy to the daily grid, then one 16-element
    array fold per type — no windows, no second pass.
    """
    wide = "decimal(38,0)"
    daily = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(date_trunc('DAY', ts) AS DATE) AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(
            F.expr(
                "CAST(floor(sum(value) * 100 + 0.5) AS BIGINT)"
            ).alias("x")
        )
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "transform(slice(sort_array(collect_list(struct(d, x))),"
                f" 1, 16), s -> cast(s.x as {wide}))"
            ).alias("a0")
        )
        .filter(F.size("a0") == 16)
    )
    # Four unrolled Haar levels: details d_i = a[2i+1] − a[2i+2],
    # approximations a'_i = a[2i+1] + a[2i+2] (1-based element_at).
    cur = "a0"
    level_frames = []
    df = series
    for lvl in range(1, 5):
        half = 16 >> lvl
        det = (
            f"transform(sequence(0, {half - 1}), i ->"
            f" element_at({cur}, 2*i+1) - element_at({cur}, 2*i+2))"
        )
        nxt = (
            f"transform(sequence(0, {half - 1}), i ->"
            f" element_at({cur}, 2*i+1) + element_at({cur}, 2*i+2))"
        )
        carried = [c for c in df.columns if c != "event_type"]
        df = df.selectExpr(
            "event_type", *carried, f"{det} AS det{lvl}",
            f"{nxt} AS a{lvl}",
        )
        cur = f"a{lvl}"
        energy = (
            f"aggregate(det{lvl}, cast(0 as {wide}),"
            " (acc, v) -> acc + v * v)"
        )
        level_frames.append(
            (lvl, f"CAST(({energy}) div 1000000 AS BIGINT)")
        )
    outs = [
        df.selectExpr(
            "event_type",
            f"CAST({lvl} AS INT) AS level",
            f"{e} AS energy_micro",
        )
        for lvl, e in level_frames
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("event_type", "level")


ORACLE_HAAR = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type,
             list_transform(
               (list_sort(list({'d': d, 'x': x})))[1:16],
               s -> CAST(s.x AS HUGEINT)) AS a0
      FROM daily GROUP BY event_type
      HAVING count(*) >= 16
    ),
    l1 AS (
      SELECT event_type,
        list_transform(range(0, 8), i -> a0[2*i+1] - a0[2*i+2]) AS det1,
        list_transform(range(0, 8), i -> a0[2*i+1] + a0[2*i+2]) AS a1
      FROM series
    ),
    l2 AS (
      SELECT event_type, det1,
        list_transform(range(0, 4), i -> a1[2*i+1] - a1[2*i+2]) AS det2,
        list_transform(range(0, 4), i -> a1[2*i+1] + a1[2*i+2]) AS a2
      FROM l1
    ),
    l3 AS (
      SELECT event_type, det1, det2,
        list_transform(range(0, 2), i -> a2[2*i+1] - a2[2*i+2]) AS det3,
        list_transform(range(0, 2), i -> a2[2*i+1] + a2[2*i+2]) AS a3
      FROM l2
    ),
    l4 AS (
      SELECT event_type, det1, det2, det3,
        list_transform(range(0, 1), i -> a3[2*i+1] - a3[2*i+2]) AS det4
      FROM l3
    ),
    lv AS (
      SELECT event_type, 1 AS level,
             list_aggregate(list_transform(det1, v -> v * v), 'sum') AS e
      FROM l4
      UNION ALL
      SELECT event_type, 2,
             list_aggregate(list_transform(det2, v -> v * v), 'sum')
      FROM l4
      UNION ALL
      SELECT event_type, 3,
             list_aggregate(list_transform(det3, v -> v * v), 'sum')
      FROM l4
      UNION ALL
      SELECT event_type, 4,
             list_aggregate(list_transform(det4, v -> v * v), 'sum')
      FROM l4
    )
    SELECT event_type, CAST(level AS INT) AS level,
           CAST(e // 1000000 AS BIGINT) AS energy_micro
    FROM lv
    ORDER BY event_type, level
    """


def ml_quantile_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball-loss evaluation of the naive-1 (previous-day) forecast
    at q ∈ {0.1, 0.5, 0.9} per event_type — the standard scoring step
    of any quantile-forecast pipeline (the q=0.5 row is half the MAE;
    asymmetric rows price under/over-forecasting). A registered
    forecaster (orders_forecast_*) plus this evaluator is the complete
    train/score loop.

    Determinism: residuals are integer cents and the loss multiplies
    by 10q (integers 1/5/9), so every per-day loss is an EXACT integer
    in deci-cent units; the only division is the final mean, floored
    to 4dp via the house formula. Scale: one data-sized groupBy to the
    daily grid, one lag window per type (bounded partitions), one
    8-row output per 10 M input rows.
    """
    from pyspark.sql.window import Window

    daily = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "CAST(date_trunc('DAY', ts) AS DATE) AS d",
            "value",
        )
        .groupBy("event_type", "d")
        .agg(
            F.expr(
                "CAST(floor(sum(value) * 100 + 0.5) AS BIGINT)"
            ).alias("y")
        )
    )
    w = Window.partitionBy("event_type").orderBy("d")
    resid = daily.select(
        "event_type",
        (F.col("y") - F.lag("y", 1).over(w)).alias("r"),
    ).filter(F.col("r").isNotNull())
    qs = [(1, "q10"), (5, "q50"), (9, "q90")]
    aggs = []
    for tenq, label in qs:
        # pinball·10 = max(10q·r, (10q−10)·r) — exact integers.
        aggs.append(
            F.sum(
                F.greatest(
                    F.col("r") * tenq, F.col("r") * (tenq - 10)
                )
            ).alias(f"s_{label}")
        )
    g = resid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), *aggs
    )
    out = g.selectExpr(
        "event_type",
        "n AS n_days",
        *[
            # deci-cent integer sum → mean in currency units, 4dp:
            # sum / (n · 10 · 100), floor-quantized.
            f"floor(CAST(s_{label} AS DOUBLE)"
            f" / (CAST(n AS DOUBLE) * 1000e0)"
            f" * 10000 + 0.5) / 10000 AS pinball_{label}"
            for _tenq, label in qs
        ],
    ).orderBy("event_type")
    return out


ORACLE_PINBALL = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    resid AS (
      SELECT event_type,
             y - lag(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS r
      FROM daily
    ),
    g AS (
      SELECT event_type, count(*) AS n,
             sum(greatest(r * 1, r * (1 - 10))) AS s_q10,
             sum(greatest(r * 5, r * (5 - 10))) AS s_q50,
             sum(greatest(r * 9, r * (9 - 10))) AS s_q90
      FROM resid WHERE r IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           floor(CAST(s_q10 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000e0)
                 * 10000 + 0.5) / 10000 AS pinball_q10,
           floor(CAST(s_q50 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000e0)
                 * 10000 + 0.5) / 10000 AS pinball_q50,
           floor(CAST(s_q90 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000e0)
                 * 10000 + 0.5) / 10000 AS pinball_q90
    FROM g
    ORDER BY event_type
    """


_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # salts — the first three _MINHASH_AB affine maps


def corpus_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination over the dup-planted corpus — the
    fixed-size counterpart to text_contamination's exact broadcast
    join. The benchmark probe set is compressed to an M=4096-bit bloom
    (K=3 portable affine hashes of the md5 gram hash); corpus 8-grams
    test membership ROW-LOCALLY against the broadcast bit list —
    forall(bits) ∈ bloom. This is the shape a 100 TB decontamination
    pass takes when the benchmark may not ship verbatim (privacy) or
    when the needle set outgrows a broadcast hash relation: the filter
    is O(M) bytes regardless of probe count, the corpus is scanned
    once, and NOTHING shuffles.

    Bloom filters have no false negatives (every exact hit is flagged
    — asserted in tests) and deterministic false positives under the
    fixed hash family: the op reports flagged/exact/fp counts per doc
    so the FP rate is observable data, not a hidden property. The
    oracle replays the identical bits in DuckDB (list_has_all), so
    even the FP set is hash-certified — same bridge as
    dedup_minhash_banded.
    """
    from cdc_pubsub_spark.llmops.corpus import dup_corpus, shingle_rows

    P = _MINHASH_P
    docs = load(spark, sf_dir, "documents")
    sp = F.split(F.col("text"), " ")
    probes = (
        docs.filter((F.col("doc_id") % 50 == 0) & (F.size(sp) >= 8))
        .select(F.concat_ws(" ", F.slice(sp, 1, 8)).alias("gram"))
        .distinct()
    )
    hash_expr = (
        "cast(conv(substr(md5(gram), 1, 15), 16, 10) as bigint)"
    )
    bit_exprs = [
        f"(({a}L * (({hash_expr}) % {P}L) + {b}L) % {P}L) % {_BLOOM_M}"
        for a, b in _MINHASH_AB[:_BLOOM_K]
    ]
    bloom = (
        probes.selectExpr(f"array({', '.join(bit_exprs)}) AS bits")
        .select(F.explode("bits").alias("b"))
        .agg(F.expr("sort_array(collect_set(b))").alias("bloom_bits"))
    )
    grams = shingle_rows(dup_corpus(spark, sf_dir), 8).withColumnRenamed(
        "shingle", "gram"
    ).distinct()
    flagged = (
        grams.selectExpr(
            "doc_id",
            "gram",
            f"array({', '.join(bit_exprs)}) AS gbits",
        )
        .crossJoin(F.broadcast(bloom))
        .selectExpr(
            "doc_id",
            "gram",
            "forall(gbits, b -> array_contains(bloom_bits, b))"
            " AS bloom_hit",
        )
    )
    pg = probes.select(F.col("gram").alias("pgram"))
    out = (
        flagged.join(
            F.broadcast(pg), F.col("gram") == F.col("pgram"), "left"
        )
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.sum(F.when(F.col("pgram").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(
                F.when(
                    F.col("bloom_hit") & F.col("pgram").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_fp"),
        )
        .filter(F.col("n_flagged") > 0)
        .orderBy(F.desc("n_flagged"), "doc_id")
        .limit(20)
    )
    return out


_BLOOM_BIT_SQL = ", ".join(
    f"(({a} * (h % {_MINHASH_P}) + {b}) % {_MINHASH_P}) % {_BLOOM_M}"
    for a, b in _MINHASH_AB[:_BLOOM_K]
)

ORACLE_BLOOM = f"""
    WITH {{corpus_cte}},
    probes AS (
      SELECT DISTINCT
        array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
          AS gram
      FROM documents
      WHERE doc_id % 50 = 0 AND len(string_split(text, ' ')) >= 8
    ),
    ph AS (
      SELECT gram,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      FROM probes
    ),
    bloom AS (
      SELECT list_sort(list(DISTINCT b)) AS bloom_bits
      FROM (
        SELECT unnest([{_BLOOM_BIT_SQL}]) AS b FROM ph
      )
    ),
    corpus_grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(len(string_split(text, ' ')) - 7),
               i -> array_to_string(
                      list_slice(string_split(text, ' '), i + 1, i + 8),
                      ' ')))
               AS gram
      FROM corpus
      WHERE len(string_split(text, ' ')) >= 8
    ),
    gb AS (
      SELECT doc_id, gram,
             [{_BLOOM_BIT_SQL}] AS gbits
      FROM (
        SELECT doc_id, gram,
               ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
        FROM corpus_grams
      )
    ),
    fl AS (
      SELECT g.doc_id,
             list_has_all(bl.bloom_bits, g.gbits) AS bloom_hit,
             p.gram IS NOT NULL AS exact_hit
      FROM gb g
      CROSS JOIN bloom bl
      LEFT JOIN probes p ON p.gram = g.gram
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(sum(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN bloom_hit AND NOT exact_hit THEN 1
                         ELSE 0 END) AS BIGINT) AS n_fp
    FROM fl
    GROUP BY doc_id
    HAVING sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) > 0
    ORDER BY n_flagged DESC, doc_id
    LIMIT 20
    """

from cdc_pubsub_spark.llmops.corpus import CORPUS_CTE as _CORPUS_CTE  # noqa: E402

ORACLE_BLOOM = ORACLE_BLOOM.format(corpus_cte=_CORPUS_CTE.strip())


STAGED = {
    "agg_kmv_epoch_rollup": agg_kmv_epoch_rollup,
    "ts_ar2_yule_walker": ts_ar2_yule_walker,
    "join_polygon_overlay_area": join_polygon_overlay_area,
    "ts_haar_wavelet_energy": ts_haar_wavelet_energy,
    "ml_quantile_pinball_eval": ml_quantile_pinball_eval,
    "corpus_contamination_bloom": corpus_contamination_bloom,
}

ORACLES = {
    "agg_kmv_epoch_rollup": ORACLE_KMV,
    "ts_ar2_yule_walker": ORACLE_AR2,
    "join_polygon_overlay_area": ORACLE_OVERLAY,
    "ts_haar_wavelet_energy": ORACLE_HAAR,
    "ml_quantile_pinball_eval": ORACLE_PINBALL,
    "corpus_contamination_bloom": ORACLE_BLOOM,
}
