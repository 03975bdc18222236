"""Exactly-certifiable PCA: quantized power iteration with deflation.

``embed_pca_project`` was the repo's last eigensolve-shaped rows-only op
(numpy ``eigh`` has no DuckDB twin). This module replaces the eigensolve
with a DETERMINISTIC QUANTIZED POWER ITERATION whose every arithmetic
step is reproducible bit-for-bit on both engines, which upgrades the op
to a full hash-checked SQL oracle — the PCA analogue of the certified
k-means unroll (similarity.py `_KMEANS_CTE`).

The determinism devices, in order of appearance:

1. **Integer moments.** Embedding elements quantize to 1e-6
   (``floor(x*1e6 + 0.5)`` as BIGINT); the count / per-dim sums S / the
   64×64 cross-product matrix XX are then EXACT integer sums —
   order-independent, so Spark's shuffled Arrow-batch partials and
   DuckDB's sequential aggregate agree exactly. The scatter matrix
   ``M = n·XX − S·Sᵀ`` (the covariance times n², integer) converts to
   DOUBLE once, via the correctly-rounded int→double cast both engines
   share.
2. **Fixed-order float folds.** Power iteration needs real arithmetic.
   Every 64-term reduction (matvec row, norm, Rayleigh numerator) is
   emitted as an EXPLICIT left-associated expression — ``m[1]*v[1] +
   m[2]*v[2] + …`` — and the Python reference evaluates the identical
   chain, so the IEEE-754 results match bit-for-bit (same inputs, same
   ops, same order; no numpy pairwise summation anywhere).
3. **Integer iterates.** After each normalization the iterate
   re-quantizes to integer thousandths (``floor(u/‖u‖·1000 + 0.5)``),
   so each iteration STARTS from integers again — float state never
   accumulates across iterations on either engine.
4. **Deterministic seed.** ``v0[i] = 500 + (i·37) % 1000`` — a formula
   both sides compute, no RNG.
5. **Explicit Gram-Schmidt per component.** The synthetic embeddings
   have a near-flat spectrum, so deflation alone leaves O(0.1)
   cross-component leakage at T=6 (power iteration converges as
   (λ₂/λ₁)ᵀ). After each component's iterations, the iterate is
   orthogonalized against every previous component with the same
   fixed-order float folds, THEN quantized — basis orthogonality
   drops to quantization noise (~1e-3) and stays certifiable.

Scale shape: the data-sized work is one ``mapInPandas`` pass emitting
O(d²) integer partials per Arrow batch (the MLlib RowMatrix
computeCovariance pattern on the Arrow stack) plus one row-local
projection; the iteration itself is O(K·T·d²) on 64×64 — driver-side,
microscopic, scale-independent. Partial XX entries stay under int64
(|x_q| ≤ ~2e6 ⇒ per-batch |XX| ≤ 10k·4e12 = 4e16); the driver combine
is arbitrary-precision Python. Oracle arithmetic runs in HUGEINT.

Reference parity: the reference repo has no analytics surface at all
(bobvawter/cdc-pubsub publisher.go:50-214 forwards opaque payloads);
this op belongs to the SURVEY §2.B / LLM-pipeline embedding family.
"""

from __future__ import annotations

import math

D = 64  # embedding dimensionality
K = 8  # principal components
T = 6  # power iterations per component
VSCALE = 1000  # iterate quantization (thousandths)
XQ = 1_000_000  # element quantization (millionths)


def seed(i: int) -> int:
    """Deterministic iterate seed — same formula the oracle SQL uses."""
    return 500 + (i * 37) % 1000


def power_iteration_reference(
    n: int, S: list[int], XX: list[list[int]]
) -> tuple[list[list[int]], list[int]]:
    """Pure-Python quantized power iteration over exact integer moments.

    Returns (W, VV): per component the integer iterate vector w (scaled
    by VSCALE) and its exact squared norm vv = Σ w_i². Every float
    reduction is an explicit left-associated chain mirroring the
    generated SQL term-for-term — do NOT 'optimize' this into sum()/
    numpy, that changes the accumulation order and breaks cross-engine
    bit equality.
    """
    M = [[float(n * XX[i][j] - S[i] * S[j]) for j in range(D)] for i in range(D)]
    W: list[list[int]] = []
    VV: list[int] = []
    for c in range(K):
        v = [seed(i) for i in range(D)]
        for _t in range(T):
            u = []
            for i in range(D):
                acc = M[i][0] * float(v[0])
                for j in range(1, D):
                    acc = acc + M[i][j] * float(v[j])
                u.append(acc)
            nacc = u[0] * u[0]
            for i in range(1, D):
                nacc = nacc + u[i] * u[i]
            nrm = math.sqrt(nacc)
            if nrm == 0.0:
                v = [seed(i) for i in range(D)]
            else:
                v = [
                    int(math.floor(u[i] / nrm * 1000.0 + 0.5)) for i in range(D)
                ]
        # Gram-Schmidt against every previous component (fixed order),
        # then re-normalize and re-quantize the orthogonalized iterate.
        g = [float(v[i]) for i in range(D)]
        for p in range(c):
            wp = W[p]
            dot = g[0] * float(wp[0])
            for i in range(1, D):
                dot = dot + g[i] * float(wp[i])
            cf = dot / float(VV[p])
            g = [g[i] - cf * float(wp[i]) for i in range(D)]
        gacc = g[0] * g[0]
        for i in range(1, D):
            gacc = gacc + g[i] * g[i]
        gn = math.sqrt(gacc)
        if gn == 0.0:
            v = [seed(i) for i in range(D)]
        else:
            v = [int(math.floor(g[i] / gn * 1000.0 + 0.5)) for i in range(D)]
        # Rayleigh quotient on the final iterate, then deflation.
        u = []
        for i in range(D):
            acc = M[i][0] * float(v[0])
            for j in range(1, D):
                acc = acc + M[i][j] * float(v[j])
            u.append(acc)
        num = float(v[0]) * u[0]
        for i in range(1, D):
            num = num + float(v[i]) * u[i]
        vv = 0
        for i in range(D):
            vv += v[i] * v[i]  # exact integer — order-free
        vvd = float(vv)
        lam = num / vvd
        for i in range(D):
            for j in range(D):
                M[i][j] = M[i][j] - lam * float(v[i] * v[j]) / vvd
        W.append(v)
        VV.append(vv)
    return W, VV


def _matvec_lambda(m: str, v: str, var: str) -> str:
    """64-element matvec as one list_transform lambda: element i is the
    explicit left-associated chain m[i][1]*v[1] + … + m[i][64]*v[64]."""
    terms = " + ".join(f"{m}[{var}][{j + 1}]*{v}[{j + 1}]" for j in range(D))
    return f"list_transform(range(1, {D + 1}), {var} -> {terms})"


def _dot_expr(a: str, b: str) -> str:
    """Left-associated 64-term dot product over two list columns."""
    return " + ".join(f"{a}[{j + 1}]*{b}[{j + 1}]" for j in range(D))


_SEED_LIST = (
    f"list_transform(range(0, {D}),"
    " sdi -> CAST(500 + (sdi * 37) % 1000 AS BIGINT))"
)


def oracle_sql() -> str:
    """Generate the full DuckDB oracle: integer moments → K×T unrolled
    quantized power iterations → deflation → relational projection.

    Each iteration is ONE single-row CTE (the whole iterate is a
    64-list column; the matvec is a list_transform lambda whose body is
    the explicit ordered chain) — the planner sees ~80 small CTEs
    instead of ~240, which keeps optimizer time sane. MATERIALIZED
    throughout: iterates/M are referenced more than once and DuckDB
    inlines plain CTEs per reference."""
    parts: list[str] = []
    parts.append(
        f"""
    qx AS MATERIALIZED (
      SELECT vec_id, label, embedding,
             list_transform(embedding,
               e -> CAST(floor(CAST(e AS DOUBLE) * {XQ}e0 + 0.5e0) AS BIGINT))
               AS xq
      FROM embeddings
    ),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM qx),
    s AS MATERIALIZED (
      SELECT t.i AS i, CAST(sum(CAST(xq[t.i + 1] AS HUGEINT)) AS HUGEINT) AS s
      FROM qx, LATERAL unnest(range(0, {D})) AS t(i)
      GROUP BY t.i
    ),
    xx AS MATERIALIZED (
      SELECT t.i AS i, u.j AS j,
             CAST(sum(CAST(xq[t.i + 1] AS HUGEINT) * CAST(xq[u.j + 1] AS HUGEINT))
                  AS HUGEINT) AS xx
      FROM qx,
           LATERAL unnest(range(0, {D})) AS t(i),
           LATERAL unnest(range(0, {D})) AS u(j)
      GROUP BY t.i, u.j
    ),
    m_0 AS MATERIALIZED (
      SELECT xx.i AS i, xx.j AS j,
             CAST(nn.n * xx.xx - sa.s * sb.s AS DOUBLE) AS m
      FROM xx
      JOIN s sa ON sa.i = xx.i
      JOIN s sb ON sb.i = xx.j
      CROSS JOIN nn
    )"""
    )
    for c in range(K):
        # M row-major as ONE list-of-lists row; iterates as one-list rows.
        parts.append(
            f"""
    mll_{c} AS MATERIALIZED (
      SELECT list(ml ORDER BY i) AS m
      FROM (SELECT i, list(m ORDER BY j) AS ml FROM m_{c} GROUP BY i) t
    ),
    vl_{c}_0 AS MATERIALIZED (SELECT {_SEED_LIST} AS vl)"""
        )
        for t in range(1, T + 1):
            mv = _matvec_lambda("m.m", "v.vl", "mvi")
            parts.append(
                f"""
    vl_{c}_{t} AS MATERIALIZED (
      SELECT CASE WHEN nrm = 0e0 THEN {_SEED_LIST}
                  ELSE list_transform(ul,
                         uv -> CAST(floor(uv / nrm * {VSCALE}e0 + 0.5e0)
                                    AS BIGINT))
             END AS vl
      FROM (SELECT ul, sqrt({_dot_expr("ul", "ul")}) AS nrm
            FROM (SELECT {mv} AS ul
                  FROM mll_{c} m CROSS JOIN vl_{c}_{t - 1} v) iu) inr
    )"""
            )
        # Gram-Schmidt against every previous (final) component, then
        # re-normalize + re-quantize into the component's final wf_{c}.
        parts.append(
            f"""
    gl_{c}_0 AS MATERIALIZED (
      SELECT list_transform(vl, gv -> CAST(gv AS DOUBLE)) AS gl
      FROM vl_{c}_{T}
    )"""
        )
        for p in range(c):
            parts.append(
                f"""
    gl_{c}_{p + 1} AS MATERIALIZED (
      SELECT list_transform(range(1, {D + 1}),
               ggi -> gl[ggi] - cf * wl[ggi]) AS gl
      FROM (SELECT g.gl AS gl, w.vl AS wl,
                   ({_dot_expr("g.gl", "w.vl")}) / l.vvd AS cf
            FROM gl_{c}_{p} g CROSS JOIN wf_{p} w
            CROSS JOIN lam_{p} l) gsub
    )"""
            )
        parts.append(
            f"""
    wf_{c} AS MATERIALIZED (
      SELECT CASE WHEN gn = 0e0 THEN {_SEED_LIST}
                  ELSE list_transform(gl,
                         gq -> CAST(floor(gq / gn * {VSCALE}e0 + 0.5e0)
                                    AS BIGINT))
             END AS vl
      FROM (SELECT gl, sqrt({_dot_expr("gl", "gl")}) AS gn
            FROM gl_{c}_{c}) gfin
    )"""
        )
        # Rayleigh quotient on the final iterate, then deflation.
        mvf = _matvec_lambda("m.m", "v.vl", "mfi")
        parts.append(
            f"""
    lam_{c} AS MATERIALIZED (
      SELECT ({_dot_expr("vl", "ul")}) / vvd AS lam, vvd
      FROM (SELECT v.vl AS vl, {mvf} AS ul,
                   CAST(({_dot_expr("v.vl", "v.vl")}) AS DOUBLE) AS vvd
            FROM mll_{c} m CROSS JOIN wf_{c} v) fu
    ),
    m_{c + 1} AS MATERIALIZED (
      SELECT a.i AS i, a.j AS j,
             a.m - l.lam * CAST(v.vl[a.i + 1] * v.vl[a.j + 1] AS DOUBLE)
                   / l.vvd AS m
      FROM m_{c} a
      CROSS JOIN lam_{c} l
      CROSS JOIN wf_{c} v
    )"""
        )
    wall_union = "\n      UNION ALL\n      ".join(
        f"SELECT {c} AS c, t.i AS i, v.vl[t.i + 1] AS v"
        f" FROM wf_{c} v, LATERAL unnest(range(0, {D})) AS t(i)"
        for c in range(K)
    )
    vv_union = "\n      UNION ALL\n      ".join(
        f"SELECT {c} AS c, vvd FROM lam_{c}" for c in range(K)
    )
    pcols = ",\n           ".join(
        f"max(CASE WHEN c = {c} THEN p END) AS p{c}" for c in range(K)
    )
    parts.append(
        f"""
    wall AS MATERIALIZED (
      {wall_union}
    ),
    vvtab AS MATERIALIZED (
      {vv_union}
    ),
    cq AS MATERIALIZED (
      SELECT qx.vec_id, t.j AS j,
             CAST(floor(CAST(embedding[t.j + 1] AS DOUBLE) * {XQ}e0
                        - CAST(s.s AS DOUBLE) / CAST(nn.n AS DOUBLE)
                        + 0.5e0) AS BIGINT) AS cqv
      FROM qx, LATERAL unnest(range(0, {D})) AS t(j)
      JOIN s ON s.i = t.j
      CROSS JOIN nn
    ),
    pr AS MATERIALIZED (
      SELECT cq.vec_id, w.c AS c,
             CAST(sum(cq.cqv * w.v) AS BIGINT) AS pint
      FROM cq JOIN wall w ON w.i = cq.j
      GROUP BY cq.vec_id, w.c
    ),
    pv AS MATERIALIZED (
      SELECT vec_id, c,
             floor(CAST(pint AS DOUBLE) / ({XQ}e0 * sqrt(vvd))
                   * 10000e0 + 0.5e0) / 10000e0 AS p
      FROM pr JOIN vvtab USING (c)
    )
    SELECT qx.vec_id, qx.label,
           {pcols}
    FROM qx JOIN pv ON pv.vec_id = qx.vec_id
    GROUP BY qx.vec_id, qx.label"""
    )
    return "WITH" + ",".join(parts)


def spark_projection_exprs(
    n: int, S: list[int], W: list[list[int]], VV: list[int]
) -> tuple[str, list[str]]:
    """Spark-SQL expression strings for the relational projection.

    Returns (cq_array_expr, [p0_expr … p7_expr]): the centered-quantized
    element array (BIGINT, exact) and per-component projections — the
    SAME ops as the oracle's cq/pr/pv chain, with integer dot products
    so no accumulation order matters. HOF (zip_with/aggregate) form,
    not a 512-term flat expression: the flat form exceeds Janino's
    64 KB method limit and drops the whole projection to interpreted
    mode with an error splat. All embedded constants are INTEGERS (no
    float-literal round-trip concerns); double literals carry the D
    suffix (a bare decimal parses as DECIMAL — the repo-wide ANSI
    pitfall). SQL-text lambdas with distinct variable names per nesting
    level (STATUS.md HOF pitfall).
    """
    s_arr = "array(" + ", ".join(f"{S[j]}L" for j in range(D)) + ")"
    cq = (
        f"zip_with(embedding, {s_arr},"
        f" (ecq, scq) -> CAST(floor(CAST(ecq AS DOUBLE) * {XQ}.0D"
        f" - CAST(scq AS DOUBLE) / CAST({n} AS DOUBLE)"
        f" + 0.5D) AS BIGINT))"
    )
    pexprs = []
    for c in range(K):
        w_arr = "array(" + ", ".join(f"{W[c][j]}L" for j in range(D)) + ")"
        pint = (
            f"aggregate(zip_with(cq, {w_arr}, (aq{c}, bw{c}) -> aq{c} * bw{c}),"
            f" 0L, (acc{c}, xp{c}) -> acc{c} + xp{c})"
        )
        pexprs.append(
            f"floor(CAST(({pint}) AS DOUBLE)"
            f" / ({XQ}.0D * sqrt(CAST({VV[c]} AS DOUBLE)))"
            f" * 10000.0D + 0.5D) / 10000.0D"
        )
    return cq, pexprs
