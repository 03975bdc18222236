"""Lakehouse table-format primitives: transaction-log reads + Z-order layout.

The reference lands change events as append-only NDJSON behind a topic
(reference server.go:82-92 — files accumulate, consumers see whatever is
on disk).  A 100 TB lake replacing that needs the three table-format
capabilities the append-only model lacks, each modeled here the way
Delta/Iceberg model them (from their public specs, re-expressed on plain
parquet + a JSON commit log — no external library):

- **Snapshot isolation** (``scan_txn_log_snapshot``): readers resolve a
  versioned commit log (add/remove file actions) to a live-file set, so
  concurrent writers/compactors never tear a read.
- **Time travel** (``scan_txn_log_time_travel``): replaying the log only
  up to version N reproduces any historical snapshot from the same files.
- **Multi-dimensional clustering** (``sink_zorder_cluster``): interleaved
  bit (Z-order) sort keys co-locate rows that are close in BOTH of two
  dimensions, so per-file min/max stats prune multi-predicate scans that
  a single-column sort cannot.

Scale notes: the commit log is METADATA — KBs per commit while the data
is TBs — so replaying it on the driver (like Delta's Snapshot or
Iceberg's manifest resolution) is the correct asymmetric shape; the data
itself is always read as one distributed parquet scan over the resolved
file list.  Log replay here is O(#commits); production adds periodic
checkpoint compaction of the log, which changes nothing about the data
path.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.paths import work_dir
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load

_TXN_LOCK = threading.Lock()


def _build_txn_table(spark: SparkSession, sf_dir: str, tag: str = "") -> str:
    """Idempotently materialize the versioned fixture table.

    Three commits over ``orders``, the canonical lakehouse lifecycle:

    - v0: initial load as two files (``add-000`` = o_orderkey%4==0,
      ``add-001`` = %4==1).
    - v1: an append (``add-002`` = %4==2).
    - v2: a copy-on-write DELETE — ``add-001`` is rewritten as
      ``add-003`` with its ``1-URGENT`` rows dropped, the old file
      removed in the same atomic commit (remove+add pair, exactly how
      Delta/Iceberg express row-level deletes on immutable files).

    Every split is a pure function of key columns, so the oracle SQL can
    restate each snapshot as a predicate over the source table.
    """
    root = work_dir(
        "txnlog_orders_" + tag + os.path.basename(os.path.normpath(sf_dir))
    )
    log_dir = os.path.join(root, "_log")
    marker = os.path.join(log_dir, "_COMPLETE")
    with _TXN_LOCK:
        if os.path.exists(marker):
            return root
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(log_dir)
        orders = load(spark, sf_dir, "orders")
        key = F.col("o_orderkey") % 4

        def write_file(name: str, df: DataFrame) -> None:
            df.write.parquet(os.path.join(root, "data", name))

        write_file("add-000", orders.filter(key == 0))
        write_file("add-001", orders.filter(key == 1))
        write_file("add-002", orders.filter(key == 2))
        write_file(
            "add-003",
            orders.filter(
                (key == 1) & (F.col("o_orderpriority") != "1-URGENT")
            ),
        )
        commits = [
            [{"add": "data/add-000"}, {"add": "data/add-001"}],
            [{"add": "data/add-002"}],
            [{"remove": "data/add-001"}, {"add": "data/add-003"}],
        ]
        for v, actions in enumerate(commits):
            # tmp+rename: a half-written commit file must never be
            # visible to a concurrent reader (same atomicity discipline
            # as the streaming sinks' manifest writes).
            path = os.path.join(log_dir, f"{v:08d}.json")
            with open(path + ".tmp", "w") as fh:
                for act in actions:
                    fh.write(json.dumps(act) + "\n")
            os.rename(path + ".tmp", path)
        with open(marker, "w") as fh:
            fh.write("ok")
    return root


def _resolve_live_files(root: str, as_of: int | None = None) -> list[str]:
    """Replay the commit log into the live-file list (driver-side metadata).

    ``as_of`` bounds the replay at a version for time travel; ``None``
    reads the latest snapshot.  Commit files are processed in version
    order; within a commit, removes and adds commute because a path is
    never removed and re-added in one commit.
    """
    live: set[str] = set()
    for path in sorted(_glob.glob(os.path.join(root, "_log", "*.json"))):
        version = int(os.path.basename(path).split(".")[0])
        if as_of is not None and version > as_of:
            break
        with open(path) as fh:
            for line in fh:
                act = json.loads(line)
                if "add" in act:
                    live.add(act["add"])
                if "remove" in act:
                    live.discard(act["remove"])
    return [os.path.join(root, rel) for rel in sorted(live)]


def _snapshot_summary(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One distributed scan over the resolved file list → per-priority agg.

    Revenue accumulates in integer CENTS (floor(x*100+0.5) per row,
    BIGINT sum, one division back to dollars) — a double sum is
    accumulation-order dependent between Spark's shuffled partials and
    DuckDB's sequential fold, the exact cross-engine flake class the
    repo's integer-cents discipline exists to kill.
    """
    snap = spark.read.parquet(*paths)
    return (
        snap.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(
                    F.floor(
                        F.col("o_totalprice") * 100 + F.lit(0.5)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scan_txn_log_snapshot",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM orders
    WHERE o_orderkey % 4 IN (0, 2)
       OR (o_orderkey % 4 = 1 AND o_orderpriority <> '1-URGENT')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scan_txn_log_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot read through the commit log (v2: post-delete).

    The reader sees exactly the files live after the copy-on-write
    DELETE commit — the removed file's urgent rows are gone, every other
    row survives — proving readers resolve the log, not the directory
    listing (the directory still physically contains ``add-001``).
    """
    root = _build_txn_table(spark, sf_dir)
    return _snapshot_summary(spark, _resolve_live_files(root))


@register(
    "scan_txn_log_time_travel",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1, 2)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scan_txn_log_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF 1 read: the pre-delete snapshot, from the same files.

    Replaying the log only through v1 restores the appended-but-not-yet-
    deleted state (all %4∈{0,1,2} rows, urgent included) without any
    copy of the data — time travel is purely a metadata operation over
    immutable files.
    """
    root = _build_txn_table(spark, sf_dir)
    return _snapshot_summary(spark, _resolve_live_files(root, as_of=1))


# ── Z-order clustering ──────────────────────────────────────────────────

_Z_BITS = 10  # 10 bits per dimension → 20-bit interleaved key
_N_BUCKETS = 16
# Probe box for the pruning audit: a selective conjunctive predicate on
# BOTH dimensions, the workload single-column sorting cannot prune.
_PROBE = {"x_lo": 100, "x_hi": 200, "y_lo": 300, "y_hi": 500}


def _interleave_sql(x: str, y: str) -> str:
    """Bit-interleave SQL valid on BOTH engines (only ``<<``/``&``/``|``).

    z = … y₂x₂y₁x₁y₀x₀ — x occupies even bits, y odd.  The 2·_Z_BITS
    OR-terms constant-fold into one projection expression; identical
    text runs under Spark SQL and DuckDB so the cluster assignment is
    bit-identical cross-engine.
    """
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZORDER_ORACLE = f"""
    WITH pts AS (
      SELECT o_orderkey,
             o_custkey % 1024                                AS x,
             CAST(floor(o_totalprice) AS BIGINT) % 1024      AS y
      FROM orders
    ),
    zed AS (
      SELECT o_orderkey, x, y,
             {_interleave_sql("x", "y")} AS zval
      FROM pts
    ),
    bucketed AS (
      SELECT x, y,
             ntile({_N_BUCKETS}) OVER (ORDER BY zval, o_orderkey) AS bucket
      FROM zed
    )
    SELECT bucket,
           count(*) AS n_rows,
           min(x)   AS x_min,
           max(x)   AS x_max,
           min(y)   AS y_min,
           max(y)   AS y_max,
           CASE WHEN min(x) <= {_PROBE["x_hi"]} AND max(x) >= {_PROBE["x_lo"]}
                 AND min(y) <= {_PROBE["y_hi"]} AND max(y) >= {_PROBE["y_lo"]}
                THEN 1 ELSE 0 END AS probe_scans_file
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
"""


@register(
    "sink_zorder_cluster",
    category="scans",
    bench=False,
    oracle=_ZORDER_ORACLE,
)
def sink_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) file clustering + min/max pruning audit.

    Rows are sorted by the bit-interleaved key of two dimensions
    (customer bucket, price bucket), cut into 16 file-sized buckets, and
    PHYSICALLY WRITTEN one file per bucket; the output is read back from
    those files — one row per file with its footer stats (count, per-dim
    min/max) and whether a 2-D probe box must scan it.  Because the
    Z-curve keeps both coordinates locally dense, most files' bounding
    boxes miss the probe box — the multi-dimensional file-skipping that
    linear sort orders cannot provide (a single-dim sort leaves the
    other dim's min/max spanning the full domain in every file; the
    pruning win is pinned in tests/test_lakehouse.py).

    At 100 TB this is exactly Delta/Iceberg ``OPTIMIZE ZORDER BY``: the
    z-key projection is embarrassingly parallel, the sort is one
    ``repartitionByRange`` shuffle (range exchange ≈ ntile cut points),
    and the audit reads only footer statistics.  The ntile formulation
    is used here because its cut points are exact and reproducible in
    the oracle; a production rewrite would accept range-exchange's
    sampled cuts.
    """
    pts = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_custkey % 1024 AS x",
        "CAST(floor(o_totalprice) AS BIGINT) % 1024 AS y",
    )
    zed = pts.selectExpr(
        "o_orderkey", "x", "y", _interleave_sql("x", "y") + " AS zval"
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("zval", "o_orderkey")
    bucketed = zed.withColumn("bucket", F.ntile(_N_BUCKETS).over(w))
    out = work_dir(
        "zorder_orders_" + os.path.basename(os.path.normpath(sf_dir))
    )
    (
        bucketed.select("bucket", "x", "y")
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    files = spark.read.parquet(out)
    probe_hit = (
        (F.min("x") <= _PROBE["x_hi"])
        & (F.max("x") >= _PROBE["x_lo"])
        & (F.min("y") <= _PROBE["y_hi"])
        & (F.max("y") >= _PROBE["y_lo"])
    )
    return (
        files.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            F.when(probe_hit, 1).otherwise(0).alias("probe_scans_file"),
        )
        .orderBy("bucket")
    )


_OCC_SEQ = [0]


@register(
    "sink_txn_log_occ",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue,
           3 AS n_commits,
           1 AS n_conflicts_retried
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1, 2)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sink_txn_log_occ(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency WRITES to the commit log: two concurrent
    appenders race for the same version slot; the loser detects the
    conflict, re-resolves the snapshot, and retries at the next version
    — the Delta/Iceberg commit protocol (putIfAbsent on the version
    file), exercised for real with a forced collision.

    The atomic claim is ``os.link(tmp, version-file)`` — POSIX link(2)
    fails with EEXIST if the slot is taken, the same primitive Delta
    uses on HDFS/ABFS (and emulates with DynamoDB on S3). A
    ``threading.Barrier`` releases both writers into the claim at once,
    so EXACTLY one loses v1 and retries at v2 every run — making the
    commit count (3) and retry count (1) deterministic outputs, not
    race lottery. Both writers are APPENDS, which commute under
    Delta's conflict rules, so the retry needs no abort; a
    remove-conflict would instead fail validation on re-resolve (the
    read-set check), which scan_txn_log_snapshot's resolver would
    surface. Data files are written BEFORE the race — the contended
    path is pure metadata, exactly the asymmetry that makes OCC cheap
    at 100 TB (KB commit files guarding TB data).

    The certified output is the post-race snapshot itself (resolved
    through the standard log replay), proving no lost update: both
    appends land exactly once regardless of who won.
    """
    import threading

    with _TXN_LOCK:
        _OCC_SEQ[0] += 1
        seq = _OCC_SEQ[0]
    root = work_dir(
        "txnocc_%s_%d" % (os.path.basename(os.path.normpath(sf_dir)), seq)
    )
    log_dir = os.path.join(root, "_log")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(log_dir)
    orders = load(spark, sf_dir, "orders")
    key = F.col("o_orderkey") % 4
    orders.filter(key == 0).write.parquet(os.path.join(root, "data", "base"))
    orders.filter(key == 1).write.parquet(os.path.join(root, "data", "wa"))
    orders.filter(key == 2).write.parquet(os.path.join(root, "data", "wb"))

    def commit(version: int, actions: list[dict], tag: str) -> bool:
        """putIfAbsent: True if this writer owns the version slot."""
        tmp = os.path.join(log_dir, f".{tag}-{version}.tmp")
        with open(tmp, "w") as fh:
            for act in actions:
                fh.write(json.dumps(act) + "\n")
        try:
            os.link(tmp, os.path.join(log_dir, f"{version:08d}.json"))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # Statement first, assert second: under `python -O` asserts are
    # stripped, and the base-snapshot commit is a SIDE EFFECT that must
    # survive optimization.
    base_ok = commit(0, [{"add": "data/base"}], "init")
    assert base_ok, "v0 base commit lost the empty-log race"

    barrier = threading.Barrier(2)
    retries = {"wa": 0, "wb": 0}

    def writer(tag: str, rel: str) -> None:
        barrier.wait()  # both claim v1 simultaneously — one MUST lose
        version = 1
        while not commit(version, [{"add": rel}], tag):
            retries[tag] += 1
            version += 1  # re-resolve: appends commute, retry next slot

    ta = threading.Thread(target=writer, args=("wa", "data/wa"))
    tb = threading.Thread(target=writer, args=("wb", "data/wb"))
    ta.start(); tb.start(); ta.join(); tb.join()

    n_commits = len(_glob.glob(os.path.join(log_dir, "*.json")))
    n_retried = retries["wa"] + retries["wb"]
    snap = _snapshot_summary(spark, _resolve_live_files(root))
    return snap.select(
        "o_orderpriority",
        "n_orders",
        "revenue",
        F.lit(n_commits).alias("n_commits"),
        F.lit(n_retried).alias("n_conflicts_retried"),
    )


@register(
    "scan_txn_log_vacuum",
    category="scans",
    bench=False,
    oracle="""
    WITH files AS (
      SELECT 'data/add-000' AS file, 'live' AS status,
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderkey % 4 = 0) AS n_rows
      UNION ALL
      SELECT 'data/add-001', 'vacuumed',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderkey % 4 = 1)
      UNION ALL
      SELECT 'data/add-002', 'live',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderkey % 4 = 2)
      UNION ALL
      SELECT 'data/add-003', 'live',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderkey % 4 = 1 AND o_orderpriority <> '1-URGENT')
    ),
    snap AS (
      SELECT CAST(count(*) AS BIGINT) AS snapshot_rows
      FROM orders
      WHERE o_orderkey % 4 IN (0, 2)
         OR (o_orderkey % 4 = 1 AND o_orderpriority <> '1-URGENT')
    )
    SELECT f.file, f.status, f.n_rows, s.snapshot_rows
    FROM files f CROSS JOIN snap s
    ORDER BY f.file
    """,
)
def scan_txn_log_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM of the transaction-log table: physically delete data
    files no retained snapshot references — the GC half of the
    lakehouse lifecycle (snapshot read, time travel, OCC commit, and
    now storage reclamation). The copy-on-write DELETE at v2 removed
    ``add-001`` from the LOG but, by design, not from storage (time
    travel to v1 still needs it); once the retention window drops v1,
    the file is an orphan and vacuum may reclaim it.

    Runs against a PRIVATE copy of the fixture table (its own commit
    log) so the shared snapshot/time-travel fixtures keep their
    history: (1) resolve live files at the retained (latest) version
    by replaying the log — metadata only; (2) diff against the
    physical ``data/`` listing → orphan set; (3) count each file's
    rows with a distributed scan BEFORE deletion (the audit record a
    real VACUUM logs); (4) delete orphans; (5) re-read the latest
    snapshot through the log to prove liveness is untouched. The
    oracle restates every file's row count and the surviving snapshot
    as predicates over ``orders`` — the same pure-function-of-keys
    device as the sibling txn-log ops. At 100 TB the orphan diff is a
    listing anti-join (file metadata, never data), and the row counts
    ride parquet footer statistics rather than scans.
    """
    import shutil as _shutil

    root = _build_txn_table(spark, sf_dir, tag="vacuum_")
    data_dir = os.path.join(root, "data")
    live = {
        os.path.relpath(p, root) for p in _resolve_live_files(root)
    }
    on_disk = sorted(
        os.path.join("data", d) for d in os.listdir(data_dir)
    )
    rows = []
    for rel in on_disk:
        n = spark.read.parquet(os.path.join(root, rel)).count()
        rows.append((rel, "live" if rel in live else "vacuumed", n))
    for rel, status, _ in rows:
        if status == "vacuumed":
            _shutil.rmtree(os.path.join(root, rel))
    snap_rows = (
        spark.read.parquet(*_resolve_live_files(root)).count()
    )
    # Fixture is single-use once vacuumed: drop the completion marker so
    # the next run rebuilds the full history instead of re-vacuuming a
    # half-empty table.
    os.remove(os.path.join(root, "_log", "_COMPLETE"))
    out = spark.createDataFrame(
        [(r, s, n, snap_rows) for r, s, n in rows],
        "file string, status string, n_rows bigint, snapshot_rows bigint",
    )
    return out.orderBy("file")


def _build_cdf_table(spark: SparkSession, sf_dir: str) -> str:
    """Fixture table for the change-data-feed reader: the shared
    3-commit lifecycle plus a v3 copy-on-write UPDATE (``add-002``
    rewritten as ``add-004`` with 5-LOW prices doubled). Private root —
    the shared fixture's latest version must stay v2 for the
    snapshot/vacuum ops. Every file is a pure function of key columns
    so the oracle restates each change class as a predicate over
    ``orders``."""
    root = work_dir(
        "txnlog_cdf_" + os.path.basename(os.path.normpath(sf_dir))
    )
    log_dir = os.path.join(root, "_log")
    marker = os.path.join(log_dir, "_COMPLETE")
    with _TXN_LOCK:
        if os.path.exists(marker):
            return root
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(log_dir)
        orders = load(spark, sf_dir, "orders")
        key = F.col("o_orderkey") % 4

        def write_file(name: str, df: DataFrame) -> None:
            df.write.parquet(os.path.join(root, "data", name))

        write_file("add-000", orders.filter(key == 0))
        write_file("add-001", orders.filter(key == 1))
        write_file("add-002", orders.filter(key == 2))
        write_file(
            "add-003",
            orders.filter(
                (key == 1) & (F.col("o_orderpriority") != "1-URGENT")
            ),
        )
        write_file(
            "add-004",
            orders.filter(key == 2).withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderpriority") == "5-LOW",
                    F.col("o_totalprice") * 2,
                ).otherwise(F.col("o_totalprice")),
            ),
        )
        commits = [
            [{"add": "data/add-000"}, {"add": "data/add-001"}],
            [{"add": "data/add-002"}],
            [{"remove": "data/add-001"}, {"add": "data/add-003"}],
            [{"remove": "data/add-002"}, {"add": "data/add-004"}],
        ]
        for v, actions in enumerate(commits):
            path = os.path.join(log_dir, f"{v:08d}.json")
            with open(path + ".tmp", "w") as fh:
                for act in actions:
                    fh.write(json.dumps(act) + "\n")
            os.rename(path + ".tmp", path)
        with open(marker, "w") as fh:
            fh.write("ok")
    return root


@register(
    "scan_txn_log_changefeed",
    category="scans",
    bench=False,
    oracle="""
    WITH ch AS (
      SELECT 2 AS version, 'delete' AS change_type, o_totalprice AS p
      FROM orders
      WHERE o_orderkey % 4 = 1 AND o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT 3, 'update_preimage', o_totalprice
      FROM orders
      WHERE o_orderkey % 4 = 2 AND o_orderpriority = '5-LOW'
      UNION ALL
      SELECT 3, 'update_postimage', o_totalprice * 2
      FROM orders
      WHERE o_orderkey % 4 = 2 AND o_orderpriority = '5-LOW'
    )
    SELECT version, change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM ch GROUP BY version, change_type
    ORDER BY version, change_type
    """,
)
def scan_txn_log_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED between table versions, derived from the commit
    log alone — the lakehouse half of the reference's whole purpose
    (cdc-pubsub transports CockroachDB changefeeds; a Delta/Iceberg
    lake EMITS them the way this op does: README.md:14-15's consumer
    side). For every commit after the reader's last-seen version, the
    copy-on-write file pairs are diffed row-wise on the table key:
    rows only in removed files are deletes, rows only in added files
    are inserts, key-matched rows with changed payload emit
    update_preimage/update_postimage pairs (Delta CDF's exact row
    vocabulary), and unchanged copied rows are suppressed — the
    subtlety that makes naive file-diff CDC wrong.

    Scale shape: the log replay is driver-side METADATA (KBs); each
    commit's diff reads ONLY the files that commit touched — cost
    proportional to the rewritten data, never the table — and the
    pre/post comparison is one equi-join per commit on the table key,
    co-partitioned by construction. Revenue aggregates in integer
    cents (the fixture-wide discipline); the doubled postimage price
    is exact (×2 is a power-of-two float op), so the oracle's
    predicate restatement is bit-identical.
    """
    root = _build_cdf_table(spark, sf_dir)
    from_version = 1
    cmp_cols = ["o_totalprice", "o_orderstatus", "o_orderpriority"]
    tagged: list[DataFrame] = []
    for path in sorted(_glob.glob(os.path.join(root, "_log", "*.json"))):
        version = int(os.path.basename(path).split(".")[0])
        if version <= from_version:
            continue
        removed, added = [], []
        with open(path) as fh:
            for line in fh:
                act = json.loads(line)
                if "remove" in act:
                    removed.append(os.path.join(root, act["remove"]))
                if "add" in act:
                    added.append(os.path.join(root, act["add"]))
        pre = spark.read.parquet(*removed) if removed else None
        post = spark.read.parquet(*added) if added else None

        def img(df: DataFrame, kind: str, v: int = version) -> DataFrame:
            return df.select(
                F.lit(v).alias("version"),
                F.lit(kind).alias("change_type"),
                F.col("o_totalprice").alias("p"),
            )

        if pre is None and post is not None:
            tagged.append(img(post, "insert"))
            continue
        if post is None and pre is not None:
            tagged.append(img(pre, "delete"))
            continue
        if pre is None or post is None:
            continue
        keys_post = post.select("o_orderkey")
        keys_pre = pre.select("o_orderkey")
        tagged.append(
            img(pre.join(keys_post, "o_orderkey", "left_anti"), "delete")
        )
        tagged.append(
            img(post.join(keys_pre, "o_orderkey", "left_anti"), "insert")
        )
        changed = pre.alias("a").join(
            post.alias("b"), "o_orderkey"
        ).filter(
            " OR ".join(f"NOT (a.{c} <=> b.{c})" for c in cmp_cols)
        )
        tagged.append(
            changed.select(
                F.lit(version).alias("version"),
                F.lit("update_preimage").alias("change_type"),
                F.col("a.o_totalprice").alias("p"),
            )
        )
        tagged.append(
            changed.select(
                F.lit(version).alias("version"),
                F.lit("update_postimage").alias("change_type"),
                F.col("b.o_totalprice").alias("p"),
            )
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionAll(t)
    return (
        out.groupBy("version", "change_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (
                F.sum(
                    F.floor(F.col("p") * 100 + F.lit(0.5)).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            ).alias("revenue"),
        )
        .orderBy("version", "change_type")
    )


# --- sink_merge_into: three-clause MERGE semantics ------------------------

# Shared relational definition of target, source, and clause routing —
# identical SQL text on both engines. Target: the steady-state table
# (three quarters of orders); source: one CDC batch carrying deletes
# (%8==1), updates (other even keys), and brand-new rows (%4==3).
_MERGE_TARGET_SQL = """
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 4 <> 3
"""
_MERGE_SOURCE_SQL = """
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 8 IN (1, 3) THEN 'D' ELSE 'U' END AS op,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 500
               AS new_cents
      FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 3
         OR o_orderkey % 8 = 1
"""
_MERGE_ACTION_SQL = """
      CASE
        WHEN s.k IS NULL THEN 'untouched'
        WHEN t.k IS NULL AND s.op <> 'D' THEN 'inserted'
        WHEN t.k IS NULL THEN 'ignored_delete'
        WHEN s.op = 'D' THEN 'deleted'
        ELSE 'updated' END
"""


@register(
    "sink_merge_into",
    category="scans",
    oracle=f"""
    WITH target AS MATERIALIZED ({_MERGE_TARGET_SQL}),
    source AS MATERIALIZED ({_MERGE_SOURCE_SQL}),
    merged AS MATERIALIZED (
      SELECT coalesce(t.k, s.k) AS k,
             {_MERGE_ACTION_SQL} AS action,
             CASE
               WHEN s.k IS NULL THEN t.cents
               WHEN t.k IS NULL AND s.op <> 'D' THEN s.new_cents
               WHEN t.k IS NOT NULL AND s.op = 'U' THEN s.new_cents
               ELSE NULL END AS cents_after
      FROM target t FULL OUTER JOIN source s ON s.k = t.k
    )
    SELECT action,
           CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(cents_after), 0) AS BIGINT) AS cents_sum,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM merged
    GROUP BY action
    ORDER BY action
    """,
)
def sink_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-clause MERGE INTO semantics — WHEN MATCHED AND op='D'
    THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
    INSERT — executed as ONE full-outer join over target and CDC
    source, the copy-on-write plan every lakehouse MERGE lowers to
    (Delta/Iceberg rewrite exactly the matched files this join
    identifies). cdc_upsert_materialize covers the upsert two-clause
    subset; this adds the delete clause and the not-matched-delete
    edge case (a delete arriving for a never-seen key must be IGNORED,
    not inserted — the classic MERGE bug, pinned by the
    'ignored_delete' bucket being counted but contributing no rows).

    Output is the per-action audit (counts, surviving-cents checksum,
    key checksum) a MERGE commits to its transaction log as operation
    metrics. Exactness: pure integer arithmetic end to end. Scale:
    one equi-shuffle on the merge key — at 100 TB you bucket both
    sides on k (join_bucketed_colocated shows the shape) and the
    full-outer join is co-partitioned with zero extra movement.
    """
    orders = load(spark, sf_dir, "orders")
    target = orders.filter(F.expr("o_orderkey % 4 <> 3")).selectExpr(
        "o_orderkey AS k",
        "o_orderstatus AS status",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    )
    source = orders.filter(
        F.expr(
            "o_orderkey % 2 = 0 OR o_orderkey % 4 = 3 OR o_orderkey % 8 = 1"
        )
    ).selectExpr(
        "o_orderkey AS k",
        "CASE WHEN o_orderkey % 8 IN (1, 3) THEN 'D' ELSE 'U' END AS op",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 500"
        " AS new_cents",
    )
    t, s = target.alias("t"), source.alias("s")
    merged = t.join(s, F.col("s.k") == F.col("t.k"), "full_outer").selectExpr(
        "coalesce(t.k, s.k) AS k",
        f"{_MERGE_ACTION_SQL} AS action",
        "CASE"
        " WHEN s.k IS NULL THEN t.cents"
        " WHEN t.k IS NULL AND s.op <> 'D' THEN s.new_cents"
        " WHEN t.k IS NOT NULL AND s.op = 'U' THEN s.new_cents"
        " ELSE NULL END AS cents_after",
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum("cents_after"), F.lit(0))
            .cast("bigint")
            .alias("cents_sum"),
            F.sum("k").cast("bigint").alias("key_checksum"),
        )
        .orderBy("action")
    )
