"""Semantic checks for the graph operators beyond oracle parity."""

from __future__ import annotations

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY


def test_pagerank_teleport_floor_and_shape(spark, sf_dir):
    """Every returned rank must sit at or above the teleport floor
    0.15/N (mass is NOT conserved at small sf: the modular edge maps
    point partly outside the small fixture's vertex set, and both the
    engine and the oracle drop that mass identically — parity, not
    conservation, is the contract)."""
    rows = REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 25  # top-25, fewer if the sf has fewer users
    # rank_ppb = pr * 1e9; N <= 1000 users, so floor >= 0.15e9/1000
    # minus rounding slack.
    for r in rows:
        assert r["rank_ppb"] >= 0.15 * 1e9 / 1000 - 1, r


def test_triangle_count_nonempty_and_ring_triples(spark, sf_dir):
    """The ring (u,u+1) + skip (u,u+2) edges close a triangle at every
    consecutive triple — the result must be non-empty with every listed
    node in >= 2 triangles (each node belongs to up to 3 ring triples)."""
    rows = REGISTRY["graph_triangle_count"].fn(spark, sf_dir).collect()
    assert rows, "triangle-free graph would make the op vacuous"
    assert rows[0]["n_triangles"] >= 3
    for r in rows:
        assert r["n_triangles"] >= 2, r


def test_cc_converged_equals_unrolled(spark, sf_dir):
    """The fixpoint-iterated CC twin must produce EXACTLY the unrolled
    sibling's components — iterate-to-convergence and static log-round
    unrolling are two executions of the same algorithm."""
    unrolled = {
        tuple(r)
        for r in REGISTRY["graph_connected_components"].fn(spark, sf_dir).collect()
    }
    converged = {
        tuple(r) for r in REGISTRY["graph_cc_converged"].fn(spark, sf_dir).collect()
    }
    assert converged == unrolled
    # 7 chains over nodes folded mod 1000 -> exactly 7 components.
    assert len(converged) == 7


def test_user_set_algebra_inclusion_exclusion(spark, sf_dir):
    """Set-algebra counts must satisfy inclusion-exclusion and the
    partition identity |A| = |A∩B| + |A\\B| — internal consistency the
    oracle hash can't distinguish from coincidence."""
    r = REGISTRY["events_user_set_algebra"].fn(spark, sf_dir).collect()[0]
    assert (
        r["click_or_purchase"]
        == r["clicked"] + r["purchased"] - r["click_and_purchase"]
    )
    assert r["clicked"] == r["click_and_purchase"] + r["click_no_purchase"]
    assert r["purchased"] == r["click_and_purchase"] + r["purchase_no_click"]
    assert r["n_users"] >= r["click_or_purchase"]


def test_survival_curve_km_invariants(spark, sf_dir):
    """Kaplan-Meier invariants: survival is monotone non-increasing in
    (0, 1]; risk sets shrink by exactly the prior departures; hazards
    stay within [0, 1); censored mass exists (the right-censoring the
    naive gap histogram drops)."""
    rows = REGISTRY["orders_survival_curve"].fn(spark, sf_dir).collect()
    assert rows
    surv = [r["survival"] for r in rows]
    assert all(0 < s <= 1 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0 <= r["hazard"] < 1 for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        assert (
            cur["n_at_risk"]
            == prev["n_at_risk"] - prev["n_events"] - prev["n_censored"]
        )
    assert sum(r["n_censored"] for r in rows) > 0


def test_degree_assortativity_bounds(spark, sf_dir):
    """Assortativity is a Pearson correlation (∈ [-1, 1]); the edge
    relation is exactly 2 edges per user, and the edge-end-weighted
    mean degree is ≥ the plain mean degree (size-biased sampling)."""
    from cdc_pubsub_spark.registry import REGISTRY

    r = (
        REGISTRY["graph_degree_assortativity"]
        .fn(spark, sf_dir)
        .collect()[0]
    )
    assert -1.0 <= r.assortativity <= 1.0, r
    assert r.n_edges % 2 == 0 and r.n_edges > 0
    assert r.avg_end_degree >= 2.0 * r.n_edges / max(r.n_nodes, 1) - 1e-9


def test_kcore_peeling_is_monotone_and_fixpoint_valid(spark, sf_dir):
    """Peeling invariants: surviving node/edge counts are monotone
    non-increasing; if two consecutive rounds agree the cascade has
    converged and later rounds must not move; a survivor set at a
    fixpoint genuinely IS a 3-core (2·edges ≥ 3·nodes is the degree
    lower bound a valid core must satisfy when nonempty)."""
    rows = REGISTRY["graph_kcore"].fn(spark, sf_dir).collect()
    assert [r.round for r in rows] == [1, 2, 3, 4, 5]
    nodes = [r.nodes_alive for r in rows]
    edges = [r.edges_alive for r in rows]
    assert all(a >= b for a, b in zip(nodes, nodes[1:]))
    assert all(a >= b for a, b in zip(edges, edges[1:]))
    for i in range(1, 5):
        if nodes[i] == nodes[i - 1] and edges[i] == edges[i - 1]:
            assert nodes[i:] == [nodes[i]] * (5 - i)
            assert edges[i:] == [edges[i]] * (5 - i)
            if nodes[i] > 0:
                assert 2 * edges[i] >= 3 * nodes[i]
            break


def test_reciprocity_bounds_and_dyad_pairing(spark, sf_dir):
    """Reciprocal edges come in pairs (even count, dyads = half), the
    rate is a fraction of the distinct edge set, and the affine edge
    maps guarantee a nonempty graph."""
    r = REGISTRY["graph_reciprocity"].fn(spark, sf_dir).collect()[0]
    assert r.n_edges > 0
    assert 0 <= r.n_reciprocal_edges <= r.n_edges
    assert r.n_reciprocal_edges % 2 == 0
    assert r.n_mutual_dyads * 2 == r.n_reciprocal_edges
    assert 0.0 <= r.reciprocity <= 1.0


def test_clustering_coefficient_consistency(spark, sf_dir):
    """Both coefficients are fractions in [0, 1]; 3·triangles can never
    exceed the wedge count (every closed triple uses 3 wedges); the
    ring+skip construction guarantees triangles exist, so both are
    strictly positive."""
    r = (
        REGISTRY["graph_clustering_coefficient"]
        .fn(spark, sf_dir)
        .collect()[0]
    )
    assert 0 < r.n_triangles
    assert 3 * r.n_triangles <= r.n_wedges
    assert 0.0 < r.global_cc <= 1.0
    assert 0.0 < r.avg_local_cc <= 1.0


def test_hits_matches_pure_python_replication(spark, sf_dir):
    """Independent reimplementation: run the identical integer HITS
    (micro-unit scores, exact sums, max floor-division normalization)
    in pure Python over the same synthetic edge set and require the
    top-20 to match the engine EXACTLY — integer discipline means there
    is no tolerance to hide behind."""
    from cdc_pubsub_spark.tables import load

    users = sorted(
        r.user_id
        for r in load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    )
    uset = set(users)
    edges = [(u, (u * 7 + 3) % 1000) for u in users] + [
        (u, (u * 13 + 11) % 1000) for u in users
    ]
    h = {u: 1000000 for u in users}
    a = {}
    for _ in range(4):
        araw = {u: 0 for u in users}
        for s, d in edges:
            if d in uset:
                araw[d] += h[s]
        m = max(araw.values())
        a = {u: araw[u] * 1000000 // m for u in users}
        hraw = {u: 0 for u in users}
        for s, d in edges:
            if d in uset:
                hraw[s] += a[d]
        m = max(hraw.values())
        h = {u: hraw[u] * 1000000 // m for u in users}
    exp = sorted(
        ((u, h[u], a[u]) for u in users), key=lambda t: (-t[2], -t[1], t[0])
    )[:20]
    rows = REGISTRY["graph_hits"].fn(spark, sf_dir).collect()
    got = [(r.user_id, r.hub_micro, r.auth_micro) for r in rows]
    assert got == exp
    assert any(r.auth_micro == 1000000 for r in rows), (
        "max-normalization must pin the top authority at exactly 1e6"
    )


def test_adamic_adar_matches_pure_python_replication(spark, sf_dir):
    """Independent reimplementation: enumerate non-edge wedge pairs
    and their Σ 1/ln(deg) scores in pure Python with the identical
    quantized inverse-log table — the integer discipline means the
    engine's top-25 must match EXACTLY, including tie order."""
    import math

    from cdc_pubsub_spark.tables import load

    users = sorted(
        r.user_id
        for r in load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    )
    uset = set(users)
    adj = set()
    for u in users:
        for d in ((u * 7 + 3) % 1000, (u * 13 + 11) % 1000):
            if d != u:
                adj.add((min(u, d), max(u, d)))
    nbrs: dict[int, set[int]] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    invq = {k: int(math.floor(1000000.0 / math.log(k) + 0.5)) for k in range(2, 65)}
    scores: dict[tuple[int, int], list[int]] = {}
    for w, ns in nbrs.items():
        for u in ns:
            for v in ns:
                if u < v and (u, v) not in adj:
                    sc = scores.setdefault((u, v), [0, 0])
                    sc[0] += 1
                    sc[1] += invq[len(nbrs[w])]
    exp = sorted(
        ((u, v, c, q) for (u, v), (c, q) in scores.items()),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:25]
    rows = REGISTRY["graph_adamic_adar"].fn(spark, sf_dir).collect()
    got = [(r.u, r.v, r.common_neighbors, r.aa_micro) for r in rows]
    assert got == exp


def test_katz_matches_pure_python_replication(spark, sf_dir):
    """Independent replication: exact integer path counting with
    beta = 1/2 binary attenuation — the top-20 must match exactly."""
    from cdc_pubsub_spark.tables import load

    users = sorted(
        r.user_id
        for r in load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    )
    uset = set(users)
    edges = [(u, (u * 7 + 3) % 1000) for u in users] + [
        (u, (u * 13 + 11) % 1000) for u in users
    ]
    p = {u: 1 for u in users}
    paths = {}
    for k in range(1, 5):
        nxt = {u: 0 for u in users}
        for s, d in edges:
            if d in uset:
                nxt[d] += p[s]
        paths[k] = nxt
        p = nxt
    exp = sorted(
        (
            (
                u,
                sum(paths[k][u] * (1000000 >> k) for k in range(1, 5)),
                paths[1][u],
                paths[2][u],
                paths[3][u],
                paths[4][u],
            )
            for u in users
        ),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    rows = REGISTRY["graph_katz_centrality"].fn(spark, sf_dir).collect()
    got = [
        (r.user_id, r.katz_micro, r.paths_1, r.paths_2, r.paths_3, r.paths_4)
        for r in rows
    ]
    assert got == exp


def test_ppr_matches_pure_python_replication(spark, sf_dir):
    """Independent replication of the integer PPR path: quantized
    parts-per-billion state, half-up integer teleport, floor(0.85·m/2)
    propagation — the top-25 must match exactly, and the top score
    must belong to a seed (teleport dominates at 3 rounds)."""
    from cdc_pubsub_spark.tables import load

    users = sorted(
        r.user_id
        for r in load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .collect()
    )
    uset = set(users)
    edges = [(u, (u * 7 + 3) % 1000) for u in users] + [
        (u, (u * 13 + 11) % 1000) for u in users
    ]
    seeds = [u for u in users if u % 50 == 0]
    assert seeds, "seed set must be non-empty at every sf"
    n = len(seeds)
    pr = {u: (1000000000 // n if u % 50 == 0 else 0) for u in users}
    teleport = (300000000 + n) // (2 * n)
    import math

    for _r in range(3):
        nxt = {u: 0 for u in users}
        for s, d in edges:
            if d in uset:
                nxt[d] += pr[s]
        pr = {
            u: (teleport if u % 50 == 0 else 0)
            + int(math.floor(0.85 * float(nxt[u]) / 2.0 + 0.5))
            for u in users
        }
    exp = sorted(
        ((u, p, u % 50 == 0) for u, p in pr.items() if p > 0),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    rows = REGISTRY["graph_ppr_seeded"].fn(spark, sf_dir).collect()
    got = [(r.user_id, r.ppr_ppb, r.is_seed) for r in rows]
    assert got == exp
    assert rows[0].is_seed
