#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan evidence for the headline operators.

For each audited op the doc records the scale-relevant plan facts —
exchange (shuffle) count, broadcast joins, pushed filters / pruned scan
schemas, whole-stage-codegen coverage, and the specialized nodes
(TakeOrdered, WindowGroupLimit, ObjectHashAggregate...) — extracted from
`explain(formatted)` at sf0.01. tests/test_plans.py PINS the critical
properties; this doc makes the full evidence reviewable without a Spark
session. Run: `python scripts/gen_plans_audit.py`.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.session import get_spark

# Headline set: the bench tail + one representative per plan family.
AUDIT = [
    ("agg_hash_groupby", "flagship TPC-H-Q1 aggregate"),
    ("join_multiway", "5-way star join"),
    ("join_broadcast", "small-dim broadcast join"),
    ("topk_per_group", "per-group top-k (WindowGroupLimit)"),
    ("topk_global", "global top-k (TakeOrdered)"),
    ("join_skew_salted", "salted skew join"),
    ("join_bucketed_colocated", "bucketed zero-shuffle SMJ"),
    ("dedup_minhash_lsh", "minhash LSH dedup (banded candidates)"),
    ("dedup_containment", "prefix-filter containment dedup"),
    ("dedup_embed_cosine", "hyperplane-LSH embedding dedup"),
    ("sim_ann_ivf", "IVF ANN assign/probe/rescore"),
    ("text_lm_perplexity", "char-bigram LM perplexity"),
    ("text_tfidf_topk", "TF-IDF top-k terms"),
    ("text_boilerplate_spans", "cross-doc boilerplate spans"),
    ("tpch_q18_big_orders", "aggregate-derived predicate (Q18)"),
    ("tpch_q5_local_volume", "6-way snowflake join (Q5)"),
    ("tpch_q19_disjunctive_bands", "OR-of-bands pushdown (Q19)"),
    ("tpch_q21_sole_late_supplier", "self semi+anti joins (Q21)"),
    ("events_sessionize", "gap sessionization (lag + running sum)"),
    ("graph_connected_components", "8-round pointer-doubling CC"),
    ("corpus_sequence_pack", "sequence packing prefix-sum"),
    ("join_fuzzy_symspell", "symmetric-delete fuzzy match"),
    ("pipeline_embedding_e2e", "quantize->centroid->classify e2e"),
    ("graph_pagerank", "3 unrolled PageRank rounds"),
    ("graph_triangle_count", "wedge-join triangle counting"),
    ("events_anomaly_zscore", "broadcast-stats z-score flags"),
    ("corpus_split_leakage", "split-leakage audit"),
    ("pipeline_training_data_e2e", "quality->dedup->chunk->rollup, one plan"),
    ("sim_ann_pq", "product-quantization ANN (encode/ADC/rescore)"),
    ("profile_drift_psi", "PSI drift monitor (one 10-group scan)"),
    ("events_attribution", "3-model attribution in one window pass"),
    ("tpch_q9_product_profit", "partsupp pair-join product profit (Q9)"),
    ("tpch_q2_min_cost_supplier", "aggregate-first correlated MIN (Q2)"),
    ("sim_ann_binary_hamming", "1-bit signatures + Hamming preselect"),
    ("dedup_minhash_banded", "band-only MinHash (bench variant)"),
    ("graph_bfs_layers", "4-round min-plus BFS relaxation"),
    ("ml_kfold_cv", "5-fold CV by moment subtraction (2 scans)"),
    ("text_collocations_pmi", "bigram PMI collocations (pair-relation marginals)"),
    ("graph_clustering_coefficient", "transitivity + avg-local CC (3-join triangles)"),
    ("scan_txn_log_changefeed", "commit-log CDF (per-commit file diff)"),
    ("ml_roc_auc", "binned Mann-Whitney AUC (bounded-bin window)"),
    ("dedup_levenshtein_block", "blocked edit-distance pairs (star cap >8/block)"),
    ("orders_rfm_atscale", "RFM via broadcast histogram cutoffs (no data-sized window)"),
    ("join_spatial_grid", "epsilon-grid L-inf distance join (3x3 cell replicate)"),
    ("ml_ridge_path", "ridge path from one moment scan (wide-int centered moments)"),
    # r12 growth representatives — one per new plan shape
    ("ml_spearman_rho", "binned average-rank Spearman (domain windows, wide-int moments)"),
    ("events_peak_concurrency", "sweep-line peak concurrency (minute-delta cumsum)"),
    ("join_knn_spatial_grid", "grid 1-NN assignment (9-cell dim replicate, BHJ)"),
    ("ml_bootstrap_poisson_ci", "40-resample Poisson bootstrap (one scan, spine cross)"),
    ("ml_winsorized_trimmed_mean", "robust means on binned domain (tie-split trim)"),
    ("events_velocity_flags", "lag(4) velocity rule (per-user window, no self-join)"),
    ("ts_hurst_rescaled_range", "R/S blocks (calendar relation, ppm-quantized means)"),
    # r14 rewrites — the bounded-group pair-enumeration family
    ("basket_brand_pairs", "bounded-group brand pairs (one shuffle, no self-join)"),
    ("orders_duplicate_payments", "bounded-group payment pairs (one shuffle, no self-join)"),
    ("orders_assoc_rules", "bounded-group directed rules (one shuffle, no self-join)"),
]

SF = "/root/testdata/sf0.01"


def summarize(executed: str, formatted: str) -> dict:
    # `executed` is the final AQE-resolved plan AFTER exchange reuse:
    # a subplan referenced N times in the tree (e.g. the users scan in
    # every PageRank round) counts its shuffle ONCE plus ReusedExchange
    # markers, matching what actually runs. `formatted` carries the scan
    # details (PushedFilters / ReadSchema).
    reused = len(re.findall(r"ReusedExchange", executed))
    return {
        "shuffles": len(re.findall(r"\bExchange hashpartitioning", executed))
        + len(re.findall(r"\bExchange rangepartitioning", executed))
        + len(re.findall(r"\bExchange SinglePartition", executed)),
        "reused": reused,
        "broadcasts": len(re.findall(r"BroadcastExchange", executed)),
        "bhj": len(re.findall(r"BroadcastHashJoin", executed)),
        "smj": len(re.findall(r"SortMergeJoin", executed)),
        "shj": len(re.findall(r"ShuffledHashJoin", executed)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", executed)),
        "takeordered": "TakeOrderedAndProject" in executed,
        "wgl": "WindowGroupLimit" in executed,
        "pushed": sorted(
            set(
                f
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
                for f in m.split(", ")
                if f and f != "..."
            )
        )[:6],
        "scans": re.findall(r"ReadSchema: struct<([^>]*)", formatted),
    }


def main() -> None:
    from cdc_pubsub_spark import tables

    # finalize_cached ops must yield their LAZY plan here (same hook as
    # tests/test_plans.py) or the audit would see a checkpoint scan leaf.
    tables.LAZY_PLAN_MODE = True
    spark = get_spark("plans-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan audit of the headline operators",
        "",
        "Auto-generated by `scripts/gen_plans_audit.py` from "
        "`explain(formatted)` at sf0.01 (plan SHAPE is sf-independent; "
        "AQE may further coalesce at runtime). The hard guarantees are "
        "pinned in tests/test_plans.py — this doc is the reviewable "
        "evidence. `Exchanges` counts EXECUTED shuffle boundaries after "
        "AQE and exchange reuse (broadcast "
        "exchanges listed separately). Codegen span coverage is not "
        "visible in a pre-execution AQE plan; the WholeStageCodegen "
        "pins live in tests/test_plans.py.",
        "",
        "| Op | What | Exchanges | Broadcast | Joins (BHJ/SMJ/SHJ/BNLJ) | top-k nodes | Pushed filters (sample) |",
        "|---|---|---|---|---|---|---|",
    ]
    details = []
    for name, what in AUDIT:
        if name not in REGISTRY:
            continue
        df = REGISTRY[name].fn(spark, SF)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        df.collect()  # resolve AQE so the executed plan is final
        executed = df._jdf.queryExecution().executedPlan().toString()
        # AdaptiveSparkPlan.toString appends "== Initial Plan ==" — keep
        # only the final plan or every node counts twice.
        executed = executed.split("== Initial Plan ==")[0]
        s = summarize(executed, formatted)
        topk = []
        if s["takeordered"]:
            topk.append("TakeOrdered")
        if s["wgl"]:
            topk.append("WindowGroupLimit")
        out.append(
            "| `{n}` | {w} | {ex} | {bc} | {j} | {tk} | {pf} |".format(
                n=name,
                w=what,
                ex=f"{s['shuffles']} (+{s['reused']} reused)" if s["reused"] else s["shuffles"],
                bc=s["broadcasts"],
                j=f"{s['bhj']}/{s['smj']}/{s['shj']}/{s['bnlj']}",
                tk=", ".join(topk) or "—",
                pf=("`" + "; ".join(s["pushed"]) + "`") if s["pushed"] else "—",
            )
        )
        pruned = [c[:90] for c in s["scans"][:4]]
        details.append(
            f"## {name}\n\n{what}. Scan schemas (column pruning evidence):\n"
            + "\n".join(f"- `struct<{c}...>`" for c in pruned)
        )
    out.append("")
    out.append(
        "BroadcastNestedLoopJoin appears ONLY where one side is a 1-row "
        "broadcast scalar (attaching a probe vector / corpus-level "
        "constant — the standard scalar-join plan); never corpus×corpus. "
        "The LSH/banded rewrites exist precisely to keep data-sized BNLJ "
        "out of the dedup/ANN paths (pinned in tests/test_plans.py)."
    )
    out.append("")
    out.extend(details)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
