"""Invariants of the driver-contract module itself: the certification
window ordering (__spark_entry__._ordered_names) steers which ops the
round driver verifies — a bug here silently misdirects certification,
so the ordering rules are pinned against the REAL accumulated
CORRECTNESS files, and finalize_cached's two modes are pinned against
a live session."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
entry = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(entry)


def test_ordering_partitions_and_priorities():
    """The window order must be: changed-certified (recertify) first,
    then never-certified, then already-certified stalest-first — and
    must cover the whole registry exactly once."""
    names = entry._ordered_names()
    done, _attempts, cert_round = entry._certification_state()
    assert sorted(names) == sorted(entry.REGISTRY), "must cover registry 1:1"

    lead = [
        n
        for n in entry._SURVEY_PRIORITY
        if n in entry.REGISTRY and n not in done
    ]
    recert = [n for n in entry._RECERTIFY if n in done and n not in lead]
    phase = {n: 0 for n in lead}
    phase.update({n: 1 for n in recert})
    for n in names:
        if n in phase:
            continue
        if n not in done:
            # This round's own additions defer to the END so they don't
            # displace stale-recertification slots; they lead next round.
            phase[n] = 4 if n in entry._DEFER_TO_NEXT_ROUND else 2
        else:
            phase[n] = 3
    seen_phase = [phase[n] for n in names]
    assert seen_phase == sorted(seen_phase), (
        "ordering must be lead -> recertify -> never-certified -> "
        "certified tail -> deferred-new"
    )

    tail = [n for n in names if phase[n] == 3]
    rounds = [cert_round.get(n, 0) for n in tail]
    assert rounds == sorted(rounds), "certified tail must be stalest-first"


def test_oracle_map_is_subset_with_same_order_keys():
    """oracle_sql() must expose exactly the SQL-expressible subset of
    queries(), keyed identically (the driver zips them by name)."""
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())
    # the declared rows-only ops are the ONLY missing oracles
    missing = set(q) - set(o)
    assert missing == {
        n for n in entry.REGISTRY if entry.REGISTRY[n].oracle is None
    }


def test_finalize_cached_modes(spark):
    """Eager mode returns a materialized checkpoint and releases the
    cached input; lazy mode returns the original lazy plan."""
    from pyspark.storagelevel import StorageLevel

    from cdc_pubsub_spark import tables

    base = spark.range(100).toDF("x").persist()
    out = base.groupBy((base.x % 3).alias("k")).count()
    got = tables.finalize_cached(out, base)
    assert got.count() == 3
    assert base.storageLevel == StorageLevel.NONE, "input must be unpersisted"
    assert "LogicalRDD" in got._jdf.queryExecution().optimizedPlan().toString()

    base2 = spark.range(100).toDF("x").persist()
    out2 = base2.groupBy((base2.x % 3).alias("k")).count()
    tables.LAZY_PLAN_MODE = True
    try:
        got2 = tables.finalize_cached(out2, base2)
    finally:
        tables.LAZY_PLAN_MODE = False
    assert "LogicalRDD" not in got2._jdf.queryExecution().optimizedPlan().toString()
    assert got2.count() == 3


def test_no_unreduced_multiplicative_key_hashes():
    """Source lint for the ANSI-overflow class the 10x scale sweeps
    keep catching (14 ops across r09/r10): any `<key> * 2654435761`
    hash must reduce the key first (`% 1048576` / `% 100000`), because
    the probe tree's replica-shifted keys (~2^40) overflow int64 in the
    raw product. Scans every non-test source file for the Knuth
    multiplier applied directly to an unreduced column name."""
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "cdc_pubsub_spark")
    # Every OCCURRENCE of the constant must be adjacent to a safe
    # operand on its multiplication side — a parenthesized `% m`
    # key reduction, or `l_linenumber` (<= 7 by fixture, the one raw
    # column small enough to multiply directly). Checking occurrence
    # context (not just identifier-times-constant) also catches the
    # multiplier-first form `2654435761 * o_orderkey` and wrapped keys
    # like `CAST(o_orderkey AS BIGINT) * 2654435761`.
    safe_left = re.compile(r"(%\s*\d+\s*\)|l_linenumber)\s*\*\s*$")
    safe_right = re.compile(
        r"^\s*\*\s*(\(\s*[A-Za-z_][A-Za-z0-9_.]*\s*%\s*\d+\s*\)|l_linenumber)"
    )
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        if "__pycache__" in dirpath:
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            for i, line in enumerate(open(path), 1):
                for m in re.finditer(r"2654435761", line):
                    left = line[: m.start()]
                    right = line[m.end() :]
                    mult_left = left.rstrip().endswith("*")
                    mult_right = right.lstrip().startswith("*")
                    if not mult_left and not mult_right:
                        continue  # not a multiplication (comment, doc)
                    ok = (mult_left and safe_left.search(left)) or (
                        mult_right and safe_right.search(right)
                    )
                    if not ok:
                        offenders.append(f"{path}:{i}: {line.strip()[:90]}")
    assert not offenders, (
        "unreduced key multiplied by 2654435761 — overflows int64 at "
        "replica-shifted probe keys; reduce the key (% 1048576) first:\n"
        + "\n".join(offenders)
    )


def test_bench_global_window_detector():
    """Unit pin for bench.py's probe-selection window classifier: Spark
    omits EMPTY argument lists when rendering a Window node, so the
    shapes are 3 groups = partitioned, 1 group = global-unordered, and
    the ambiguous 2-group case is global exactly when the tail group is
    an ORDER spec. The first version of this detector got BOTH ambiguous
    directions wrong (r10 self-review finding #1)."""
    import bench

    # partitioned + ordered: never flagged
    assert not bench._is_global_window(
        "Window [rank() windowspecdefinition(a#1L, b#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, x, y)) AS r#3], [a#1L], "
        "[b#2 ASC NULLS FIRST]"
    )
    # partitioned, NO order (count over partition): 2 groups, bare
    # partition exprs in the tail — NOT global (the false positive that
    # put dedup_levenshtein_block in the probe set)
    assert not bench._is_global_window(
        "Window [count(1) windowspecdefinition(blk#5, specifiedwindowframe"
        "(RowFrame, x, y)) AS n_blk#9L], [blk#5]"
    )
    # global + ordered (ntile over everything): 2 groups, ordering
    # markers in the tail — flagged
    assert bench._is_global_window(
        "Window [ntile(5) windowspecdefinition(m#9L DESC NULLS LAST, "
        "specifiedwindowframe(RowFrame, x, y)) AS q#12], "
        "[m#9L DESC NULLS LAST, k#6L ASC NULLS FIRST]"
    )
    # global, NO order (sum over Window.partitionBy()): 1 group —
    # flagged (the false negative that escaped probing)
    assert bench._is_global_window(
        "Window [sum(n#2L) windowspecdefinition(specifiedwindowframe("
        "RowFrame, x, y)) AS t#7L]"
    )
