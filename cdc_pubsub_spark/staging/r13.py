"""r13 staged operators: matrix profile, exact 2-feature Shapley,
mergeable moment-sketch rollup. Unregistered (see package docstring):
registering now would displace r13 certification-window slots already
owed to the 36 deferred r12-extension ops; these are built to the full
gate standard so promotion is one ``register()`` line each.

Each entry is the standard registry shape — ``fn(spark, sf_dir) ->
DataFrame`` plus exact DuckDB oracle SQL in ``ORACLES``. Determinism
devices follow the house rules (SURVEY §2.B preamble): integer
quantization before any order-sensitive sum, floor-formula rounding,
total-ordered tie-breaks, identical aliases on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_pubsub_spark.tables import finalize_cached, load

# Shared daily relation (the ts_* calendar collapse).
_DAILY_DUCK = """
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                  AS BIGINT) AS day_idx,
             CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS x
      FROM events GROUP BY 1, 2, 3
"""

_MP_W = 4  # matrix-profile window length (days)


ORACLE_MATRIX_PROFILE = f"""
    WITH daily AS ({_DAILY_DUCK}),
    seq AS (
      SELECT event_type, x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY day_idx) AS BIGINT) AS t
      FROM daily
    ),
    windows AS (
      SELECT a.event_type, a.t AS w_start,
             list(b.x ORDER BY b.t) AS vec
      FROM seq a
      JOIN seq b ON b.event_type = a.event_type
                AND b.t BETWEEN a.t AND a.t + {_MP_W} - 1
      GROUP BY a.event_type, a.t
      HAVING count(*) = {_MP_W}
    ),
    dists AS (
      SELECT p.event_type, p.w_start,
             q.w_start AS other_start,
             CAST(list_sum(list_transform(range(1, {_MP_W} + 1),
               i -> CAST(p.vec[i] - q.vec[i] AS HUGEINT)
                    * (p.vec[i] - q.vec[i]))) AS HUGEINT) AS d2
      FROM windows p
      JOIN windows q ON q.event_type = p.event_type
                    AND abs(q.w_start - p.w_start) >= {_MP_W}
    ),
    profile AS (
      SELECT event_type, w_start,
             CAST(min(d2) AS BIGINT) AS mp_d2,
             CAST(min(other_start) FILTER (
               WHERE d2 = (SELECT min(d2) FROM dists dd
                           WHERE dd.event_type = dists.event_type
                             AND dd.w_start = dists.w_start))
               AS BIGINT) AS nn_start
      FROM dists
      GROUP BY event_type, w_start
    ),
    motif AS (
      SELECT event_type,
             CAST(min(mp_d2) AS BIGINT) AS motif_d2,
             CAST(min(w_start) FILTER (WHERE mp_d2 = (
               SELECT min(mp_d2) FROM profile p2
               WHERE p2.event_type = profile.event_type))
               AS BIGINT) AS motif_start,
             CAST(max(mp_d2) AS BIGINT) AS discord_d2,
             CAST(min(w_start) FILTER (WHERE mp_d2 = (
               SELECT max(mp_d2) FROM profile p2
               WHERE p2.event_type = profile.event_type))
               AS BIGINT) AS discord_start,
             CAST(count(*) AS BIGINT) AS n_windows
      FROM profile
      GROUP BY event_type
    )
    SELECT m.event_type, m.n_windows, m.motif_start, m.motif_d2,
           p.nn_start AS motif_nn_start,
           m.discord_start, m.discord_d2
    FROM motif m
    JOIN profile p ON p.event_type = m.event_type
                  AND p.w_start = m.motif_start
    ORDER BY m.event_type
    """


def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRIX PROFILE (STAMP family, Yeh et al. 2016) over the daily
    value series — for every length-4 day window, the squared
    euclidean distance to its nearest NON-OVERLAPPING neighbor window
    (exclusion zone |offset| >= window length, the standard trivial-
    match guard). The profile's minimum is the top MOTIF (the most
    repeated shape, with its matching window's position emitted too)
    and its maximum is the top DISCORD (the least repeated shape —
    the matrix-profile anomaly definition). Tie-breaks are total:
    earliest window start at the extremal distance, earliest neighbor
    at the motif's distance.

    Exactness: windows are exact integer-cent vectors; distances are
    exact integer sums of squares (wide type); there are NO floats in
    this op at all (z-normalization — the usual float hazard of STAMP
    — is deliberately out of scope for the staged cut; the raw-
    distance profile is the certifiable core and the normalized
    variant layers one quantized projection on top at promotion if
    wanted).

    Scale shape: the calendar collapse bounds the series at <= 31
    points per type, so windows (<= 28/type) and the all-pairs
    distance relation (<= 28^2/type) are DOMAIIN-bounded — the
    ts_pettitt argument; at production lengths the same plan applies
    per bounded segment with the documented banded-join extension.
    """
    daily = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS day_idx",
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(
            F.expr("CAST(floor(sum(value) * 100 + 0.5) AS BIGINT)").alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day_idx")
    seq = daily.select(
        "event_type",
        "x",
        F.row_number().over(w).cast("bigint").alias("t"),
    ).persist()
    a = seq.selectExpr("event_type", "t AS w_start")
    b = seq.selectExpr("event_type AS et_b", "t AS tb", "x AS xb")
    windows = (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("tb") >= F.col("w_start"))
            & (F.col("tb") <= F.col("w_start") + _MP_W - 1),
        )
        .groupBy("event_type", "w_start")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(tb, xb))),"
                " s -> s.xb) AS vec"
            ).alias("vec"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == _MP_W)
        .drop("n")
        .persist()
    )
    q = windows.selectExpr(
        "event_type AS et_q", "w_start AS other_start", "vec AS vec_q"
    )
    dists = windows.join(
        q,
        (F.col("event_type") == F.col("et_q"))
        & (
            F.abs(F.col("other_start") - F.col("w_start")) >= _MP_W
        ),
    ).selectExpr(
        "event_type",
        "w_start",
        "other_start",
        "aggregate(sequence(1, {w}), CAST(0 AS DECIMAL(38,0)),"
        " (acc, i) -> acc + CAST(element_at(vec, i)"
        " - element_at(vec_q, i) AS DECIMAL(38,0))"
        " * (element_at(vec, i) - element_at(vec_q, i))) AS d2".format(
            w=_MP_W
        ),
    )
    profile = dists.groupBy("event_type", "w_start").agg(
        F.min("d2").cast("bigint").alias("mp_d2"),
        F.expr(
            "CAST(min_by(other_start, struct(d2, other_start)) AS BIGINT)"
        ).alias("nn_start"),
    )
    motif = profile.groupBy("event_type").agg(
        F.min("mp_d2").cast("bigint").alias("motif_d2"),
        F.expr(
            "CAST(min_by(w_start, struct(mp_d2, w_start)) AS BIGINT)"
        ).alias("motif_start"),
        F.max("mp_d2").cast("bigint").alias("discord_d2"),
        F.expr(
            "CAST(min_by(w_start, struct(-mp_d2, w_start)) AS BIGINT)"
        ).alias("discord_start"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
    )
    out = (
        motif.join(
            profile.selectExpr(
                "event_type AS et_p", "w_start", "nn_start"
            ),
            (F.col("event_type") == F.col("et_p"))
            & (F.col("w_start") == F.col("motif_start")),
        )
        .selectExpr(
            "event_type",
            "n_windows",
            "motif_start",
            "motif_d2",
            "nn_start AS motif_nn_start",
            "discord_start",
            "discord_d2",
        )
        .orderBy("event_type")
    )
    return finalize_cached(out, seq, windows)


ORACLE_SHAPLEY = """
    WITH rows_in AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
             CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM rows_in
    ),
    g AS (
      SELECT n,
             CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS g11,
             CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2 AS g22,
             CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2 AS g12,
             CAST(n AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy AS g1y,
             CAST(n AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * sy AS g2y,
             CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS gyy
      FROM m
    ),
    r2 AS (
      SELECT n,
             CAST(g1y AS DOUBLE) * CAST(g1y AS DOUBLE)
               / (CAST(g11 AS DOUBLE) * CAST(gyy AS DOUBLE)) AS v1,
             CAST(g2y AS DOUBLE) * CAST(g2y AS DOUBLE)
               / (CAST(g22 AS DOUBLE) * CAST(gyy AS DOUBLE)) AS v2,
             (CAST(g11 AS DOUBLE) * (CAST(g2y AS DOUBLE)
                                     * CAST(g2y AS DOUBLE))
              + CAST(g22 AS DOUBLE) * (CAST(g1y AS DOUBLE)
                                       * CAST(g1y AS DOUBLE))
              - 2e0 * CAST(g12 AS DOUBLE) * CAST(g1y AS DOUBLE)
                    * CAST(g2y AS DOUBLE))
             / ((CAST(g11 AS DOUBLE) * CAST(g22 AS DOUBLE)
                 - CAST(g12 AS DOUBLE) * CAST(g12 AS DOUBLE))
                * CAST(gyy AS DOUBLE)) AS v12
      FROM g
    )
    SELECT f.feature,
           CAST(r2.n AS BIGINT) AS n_rows,
           floor(CASE f.feature WHEN 'quantity' THEN r2.v1
                 ELSE r2.v2 END * 1000000 + 0.5) / 1000000 AS r2_alone,
           floor(CASE f.feature
                 WHEN 'quantity' THEN
                   0.5e0 * (r2.v1 + (r2.v12 - r2.v2))
                 ELSE 0.5e0 * (r2.v2 + (r2.v12 - r2.v1)) END
                 * 1000000 + 0.5) / 1000000 AS shapley_r2,
           floor(r2.v12 * 1000000 + 0.5) / 1000000 AS r2_full
    FROM r2 CROSS JOIN (SELECT unnest(['quantity', 'discount'])
                        AS feature) f
    ORDER BY f.feature
    """


def ml_shapley_linear2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SHAPLEY ATTRIBUTION of R² between two features (quantity,
    discount) explaining net line price — the LMG / Shapley-
    regression-values decomposition (Lipovetsky & Conklin 2001), which
    is exactly computable with two features: phi_1 = ((v({1}) − v(∅))
    + (v({1,2}) − v({2})))/2 over the R² game, and symmetrically for
    phi_2. Every submodel R² comes in CLOSED FORM from one moment
    aggregate: v({i}) = g_iy²/(g_ii·g_yy) and the two-feature R² from
    the 2×2 normal-equation determinant identity — so the whole
    explanation costs ONE scan pass, no refits.

    Exactness: all moments are exact wide integers; the three R²
    values and both Shapley shares are pinned double expressions over
    them, r6-floored. The invariant test pins the EFFICIENCY axiom
    (phi_1 + phi_2 = R²_full, the Shapley property that makes this
    decomposition meaningful) and the dominance of discount (the
    generator's y literally multiplies by (1 − discount), while
    quantity only correlates through the price column).

    Scale shape: one map-side-combinable aggregate to a single moment
    row; the 2-row feature fan-out is a broadcast literal.
    """
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS x1",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2",
        "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT) AS y",
    )
    wide = "DECIMAL(38,0)"
    m = li.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr(f"CAST(x1 AS {wide}) * x1")).alias("s11"),
        F.sum(F.expr(f"CAST(x2 AS {wide}) * x2")).alias("s22"),
        F.sum(F.expr(f"CAST(x1 AS {wide}) * x2")).alias("s12"),
        F.sum(F.expr(f"CAST(x1 AS {wide}) * y")).alias("s1y"),
        F.sum(F.expr(f"CAST(x2 AS {wide}) * y")).alias("s2y"),
        F.sum(F.expr(f"CAST(y AS {wide}) * y")).alias("syy"),
    )
    g = m.selectExpr(
        "n",
        f"CAST(n AS {wide}) * s11 - CAST(s1 AS {wide}) * s1 AS g11",
        f"CAST(n AS {wide}) * s22 - CAST(s2 AS {wide}) * s2 AS g22",
        f"CAST(n AS {wide}) * s12 - CAST(s1 AS {wide}) * s2 AS g12",
        f"CAST(n AS {wide}) * s1y - CAST(s1 AS {wide}) * sy AS g1y",
        f"CAST(n AS {wide}) * s2y - CAST(s2 AS {wide}) * sy AS g2y",
        f"CAST(n AS {wide}) * syy - CAST(sy AS {wide}) * sy AS gyy",
    )
    r2 = g.selectExpr(
        "n",
        "CAST(g1y AS DOUBLE) * CAST(g1y AS DOUBLE)"
        " / (CAST(g11 AS DOUBLE) * CAST(gyy AS DOUBLE)) AS v1",
        "CAST(g2y AS DOUBLE) * CAST(g2y AS DOUBLE)"
        " / (CAST(g22 AS DOUBLE) * CAST(gyy AS DOUBLE)) AS v2",
        "(CAST(g11 AS DOUBLE) * (CAST(g2y AS DOUBLE)"
        " * CAST(g2y AS DOUBLE))"
        " + CAST(g22 AS DOUBLE) * (CAST(g1y AS DOUBLE)"
        " * CAST(g1y AS DOUBLE))"
        " - 2e0 * CAST(g12 AS DOUBLE) * CAST(g1y AS DOUBLE)"
        " * CAST(g2y AS DOUBLE))"
        " / ((CAST(g11 AS DOUBLE) * CAST(g22 AS DOUBLE)"
        " - CAST(g12 AS DOUBLE) * CAST(g12 AS DOUBLE))"
        " * CAST(gyy AS DOUBLE)) AS v12",
    )
    feats = spark.range(0, 2).selectExpr(
        "CASE id WHEN 0 THEN 'discount' ELSE 'quantity' END AS feature"
    )
    return (
        r2.crossJoin(F.broadcast(feats))
        .selectExpr(
            "feature",
            "CAST(n AS BIGINT) AS n_rows",
            "floor(CASE feature WHEN 'quantity' THEN v1 ELSE v2 END"
            " * 1000000 + 0.5) / 1000000 AS r2_alone",
            "floor(CASE feature"
            " WHEN 'quantity' THEN 0.5e0 * (v1 + (v12 - v2))"
            " ELSE 0.5e0 * (v2 + (v12 - v1)) END"
            " * 1000000 + 0.5) / 1000000 AS shapley_r2",
            "floor(v12 * 1000000 + 0.5) / 1000000 AS r2_full",
        )
        .orderBy("feature")
    )


ORACLE_MOMENT_ROLLUP = f"""
    WITH daily AS ({_DAILY_DUCK}),
    epochs AS (
      SELECT event_type, day_idx // 5 AS epoch,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM daily GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, epoch,
             CAST(sum(n) OVER w AS BIGINT) AS cn,
             CAST(sum(s) OVER w AS BIGINT) AS cs,
             CAST(sum(q) OVER w AS HUGEINT) AS cq
      FROM epochs
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(epoch AS BIGINT) AS epoch, cn AS n_days,
           floor(CAST(cs AS DOUBLE) / cn * 100 + 0.5) / 100
             AS mean_cents,
           CASE WHEN cn >= 2 THEN
             floor(sqrt(CAST(CAST(cn AS HUGEINT) * cq
                             - CAST(cs AS HUGEINT) * cs AS DOUBLE))
                   / cn * 100 + 0.5) / 100
           END AS pop_std_cents
    FROM cum
    ORDER BY event_type, epoch
    """


def agg_moment_rollup_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE MOMENT-SKETCH ROLLUP — running mean and population
    std of the daily series at every 5-day epoch boundary, computed by
    MERGING per-epoch moment triples (n, Σx, Σx²) instead of
    rescanning history: the (count, sum, sum-of-squares) triple is the
    simplest mergeable sketch there is, and this op is the exact-
    moments companion to agg_kmv_epoch_rollup (distinct counts) —
    together they demonstrate the epoch-rollup pattern for both sketch
    classes a CDC consumer needs. The merge is ONE window prefix sum
    over the per-epoch triples (epoch-domain-sized), after which every
    epoch's cumulative mean/std is closed-form.

    Exactness: the triples are exact integers (wide Σx²); mean and
    std are one pinned double expression each over the cumulative
    integers (n-scaled variance identity under the sqrt), r2-floored.
    The invariant test re-derives epoch 5's output from the RAW daily
    rows and pins merge-vs-rescan equality — the defining property of
    a mergeable sketch.

    Scale shape: calendar-collapse groupBy, a <= 6-row-per-type epoch
    aggregate, one bounded window. Nothing data-sized after the scan.
    """
    daily = (
        load(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('DAY', CAST(ts AS TIMESTAMP)))"
            " div 86400000000 AS day_idx",
            "value",
        )
        .groupBy("event_type", "day_idx")
        .agg(
            F.expr("CAST(floor(sum(value) * 100 + 0.5) AS BIGINT)").alias("x")
        )
    )
    wide = "DECIMAL(38,0)"
    epochs = daily.groupBy(
        "event_type", F.expr("day_idx div 5").alias("epoch")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.expr(f"CAST(x AS {wide}) * x")).alias("q"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = epochs.select(
        "event_type",
        "epoch",
        F.sum("n").over(w).cast("bigint").alias("cn"),
        F.sum("s").over(w).cast("bigint").alias("cs"),
        F.sum("q").over(w).cast(wide).alias("cq"),
    )
    return cum.selectExpr(
        "event_type",
        "CAST(epoch AS BIGINT) AS epoch",
        "cn AS n_days",
        "floor(CAST(cs AS DOUBLE) / cn * 100 + 0.5) / 100 AS mean_cents",
        "CASE WHEN cn >= 2 THEN"
        f" floor(sqrt(CAST(CAST(cn AS {wide}) * cq"
        f" - CAST(cs AS {wide}) * cs AS DOUBLE))"
        " / cn * 100 + 0.5) / 100"
        " END AS pop_std_cents",
    ).orderBy("event_type", "epoch")


STAGED = {
    "ts_matrix_profile": ts_matrix_profile,
    "ml_shapley_linear2": ml_shapley_linear2,
    "agg_moment_rollup_mergeable": agg_moment_rollup_mergeable,
}

ORACLES = {
    "ts_matrix_profile": ORACLE_MATRIX_PROFILE,
    "ml_shapley_linear2": ORACLE_SHAPLEY,
    "agg_moment_rollup_mergeable": ORACLE_MOMENT_ROLLUP,
}
