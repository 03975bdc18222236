"""Round-14 extension ops: invariant tests beyond oracle parity."""

from __future__ import annotations

from collections import defaultdict

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.tables import load

SF = "/root/testdata/sf0.001"


def _python_stress(users: list[int], h: int, seed_mod: int):
    """Independent reference: textbook BFS + DAG path counting, no
    Brandes recursion — sigma by per-level relaxation, downstream
    (path, target) pairs counted by explicit DAG-path enumeration."""
    edges = set()
    for u in users:
        for a, b in ((7, 3), (13, 11)):
            v = (u * a + b) % 1000
            if v != u:
                edges.add((u, v))
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    stress = defaultdict(int)
    seeds_thru = defaultdict(set)
    for s in [u for u in users if u % seed_mod == 0]:
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        for k in range(1, h + 1):
            reached = defaultdict(int)
            for v in frontier:
                for w in adj[v]:
                    reached[w] += sigma[v]
            frontier = []
            for w, sg in reached.items():
                if w not in dist:
                    dist[w] = k
                    sigma[w] = sg
                    frontier.append(w)
        # g(v): number of (shortest-path, target) pairs strictly
        # downstream, via reverse-level accumulation.
        g = {v: 0 for v, d in dist.items() if d == h}
        for k in range(h - 1, -1, -1):
            for v, dv in dist.items():
                if dv != k:
                    continue
                tot = 0
                for w in adj[v]:
                    if dist.get(w) == k + 1:
                        tot += 1 + g[w]
                g[v] = tot
        for v, dv in dist.items():
            if dv >= 1 and g.get(v, 0) > 0:
                stress[v] += sigma[v] * g[v]
                seeds_thru[v].add(s)
    rows = [
        (v, stress[v], len(seeds_thru[v]))
        for v in stress
        if stress[v] > 0
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:20]


def test_stress_sample_matches_python_replay(spark):
    users = [
        r["user_id"]
        for r in load(spark, SF, "events").select("user_id").distinct().collect()
    ]
    expected = _python_stress(users, h=4, seed_mod=4)
    got = [
        (r["node"], r["stress"], r["n_seeds"])
        for r in REGISTRY["graph_stress_sample"].fn(spark, SF).collect()
    ]
    assert got == expected, (got, expected)
    assert got, "fixture must produce interior nodes"


def test_stress_sample_structure(spark):
    rows = REGISTRY["graph_stress_sample"].fn(spark, SF).collect()
    # total order: stress desc, node asc; all positive integers
    for a, b in zip(rows, rows[1:]):
        assert (a["stress"], -a["node"]) >= (b["stress"], -b["node"]) or (
            a["stress"] > b["stress"]
            or (a["stress"] == b["stress"] and a["node"] < b["node"])
        )
    for r in rows:
        assert r["stress"] > 0 and r["n_seeds"] >= 1
        # a node's stress is at least its seed coverage (sigma,g >= 1)
        assert r["stress"] >= r["n_seeds"]
