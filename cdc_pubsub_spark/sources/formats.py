"""Columnar/row source-format round-trips (ORC, CSV).

The reference ingests exactly one wire format (NDJSON over HTTP); an
engine replacing it must speak the formats a lakehouse actually stores.
Each operator round-trips driver data through the format and aggregates
the read-back — the oracle runs on the original table, so the round-trip
itself is what's being verified (schema + value fidelity through the
format's writer/reader pair).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.paths import work_dir
from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "scan_orc_roundtrip",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → read back → aggregate (must equal the parquet truth).

    ORC is the other vectorized columnar format with predicate pushdown;
    identical aggregate results through the round-trip prove writer/
    reader fidelity (timestamps, doubles, strings).
    """
    out = work_dir("orc_orders")
    load(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "sink_dynamic_partition_overwrite",
    category="scans",
    bench=False,
    oracle="""
    SELECT o_orderstatus, count(*) AS n_rows
    FROM orders
    WHERE o_orderstatus <> 'F' OR o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: rewrite ONLY the partitions present
    in the incoming batch, leaving siblings untouched.

    The CDC reprocessing primitive: re-deliver one day/topic (reference
    changefeeds re-emit whole daily files on retry) and overwrite just
    that partition — static overwrite mode would wipe the entire table.
    Demonstrated by rewriting the 'F' partition with flagged rows and
    proving 'O'/'P' partitions survive byte-identical row counts.
    """
    out = work_dir("dyn_overwrite")
    import shutil as _shutil

    _shutil.rmtree(out, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").parquet(out)

    # Re-deliver ONLY the 'F' partition, halving its rows (simulating a
    # corrected reprocess), in dynamic overwrite mode.
    redo = (
        orders.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 2 == 0))
    )
    (
        redo.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_rows"))
@register(
    "sink_compaction",
    category="scans",
    bench=False,
    oracle="""
    SELECT 64 AS files_before, 2 AS files_after,
           count(*) AS rows_in, count(*) AS rows_out, true AS conserved
    FROM orders
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a fragmented landing zone (64 files) is
    rewritten into a handful of right-sized files.

    The operational follow-up to every streaming sink: per-micro-batch
    writes fragment the lake (the reference's per-request publishes have
    the same effect on topic backlogs), and scan cost at 100 TB is
    dominated by file-open overhead once files are small. Compaction =
    read → repartition to target size → atomic-dir rewrite. Returns
    before/after file counts + row conservation proof.
    """
    import shutil as _shutil

    frag = work_dir("fragmented")
    compact = work_dir("compacted")
    _shutil.rmtree(frag, ignore_errors=True)
    _shutil.rmtree(compact, ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(frag)  # simulate fragmented sink
    spark.read.parquet(frag).repartition(2).write.parquet(compact)

    def n_files(d: str) -> int:
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    n_before, n_after = n_files(frag), n_files(compact)
    n_rows_src = orders.count()
    n_rows_out = spark.read.parquet(compact).count()
    return spark.createDataFrame(
        [(n_before, n_after, n_rows_src, n_rows_out, n_rows_src == n_rows_out)],
        "files_before int, files_after int, rows_in bigint, rows_out bigint, conserved boolean",
    )


@register(
    "scan_csv_roundtrip",
    category="scans",
    bench=False,
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (header, explicit schema on read) → aggregate.

    CSV is schema-less text: the read declares the schema explicitly
    (never inferSchema in production — a second full scan and
    type-guessing nondeterminism). Doubles survive via Spark's
    round-trippable default formatting.
    """
    out = work_dir("csv_customer")
    load(spark, sf_dir, "customer").write.mode("overwrite").option(
        "header", True
    ).csv(out)
    back = spark.read.schema(
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string"
    ).option("header", True).csv(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register("scan_schema_evolution", category="scans", bench=False, oracle="""
    SELECT
      CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS epoch,
      count(*)                                        AS n,
      count(CASE WHEN o_orderkey % 2 = 1
                 THEN o_orderpriority END)            AS n_with_priority,
      round(sum(o_totalprice), 2)                     AS total
    FROM orders
    GROUP BY 1
    """)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution at rest: files written before a column
    add (epoch=1) and after it (epoch=2) read back as ONE table via
    mergeSchema, old files null-filling the new column.

    The storage-side twin of cdc_schema_epoch_routing: a 100 TB lake is
    never rewritten when a column lands, so the reader must reconcile
    heterogeneous file schemas. `mergeSchema=true` unions the footer
    schemas at planning time (per-file footer reads — pay it only on
    schema-change boundaries, not per query; production pins the merged
    schema in a catalog). The epoch partition column comes free from
    directory layout. Oracle recomputes the expected union straight
    from the source table — any mis-merge shows as count/sum drift.
    """
    orders = load(spark, sf_dir, "orders")
    out = work_dir("schema_evolution")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "epoch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "epoch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return merged.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- Minimal Avro 1.x container-file codec (public spec) -----------------
# The sandbox ships neither the spark-avro datasource nor a Python avro
# package, so the round-trip implements the container format directly
# from the published spec (avro.apache.org/docs/current/specification):
# header = magic 'Obj\x01' + metadata map (avro.schema JSON, null codec)
# + 16-byte sync marker; each data block = record count (zigzag-varint
# long), byte size, record bodies, sync marker. Longs/ints are zigzag
# varints, strings are length-prefixed UTF-8, doubles are 8-byte LE
# IEEE — a flat record schema needs nothing else. Same discipline as the
# multimodal P6/RIFF kernels: a REAL byte-level codec, not a stub.

_AVRO_MAGIC = b"Obj\x01"
_AVRO_SYNC = bytes(range(16))  # fixed marker: deterministic fixtures
_AVRO_SUPPLIER_SCHEMA = (
    '{"type":"record","name":"supplier","fields":['
    '{"name":"s_suppkey","type":"long"},'
    '{"name":"s_name","type":"string"},'
    '{"name":"s_nationkey","type":"int"},'
    '{"name":"s_acctbal","type":"double"}]}'
)


def _avro_zigzag(n: int) -> bytes:
    """Zigzag varint (spec: int/long encoding)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _avro_encode_supplier_file(rows: list[tuple]) -> bytes:
    """rows of (s_suppkey, s_name, s_nationkey, s_acctbal) → one
    container file with two data blocks (block iteration exercised)."""
    import struct

    header = bytearray(_AVRO_MAGIC)
    meta = {
        b"avro.schema": _AVRO_SUPPLIER_SCHEMA.encode(),
        b"avro.codec": b"null",
    }
    header += _avro_zigzag(len(meta))
    for k, v in sorted(meta.items()):
        header += _avro_zigzag(len(k)) + k + _avro_zigzag(len(v)) + v
    header += _avro_zigzag(0)  # map terminator
    header += _AVRO_SYNC

    def block(chunk: list[tuple]) -> bytes:
        body = bytearray()
        for suppkey, name, nationkey, acctbal in chunk:
            nb = name.encode()
            body += _avro_zigzag(int(suppkey))
            body += _avro_zigzag(len(nb)) + nb
            body += _avro_zigzag(int(nationkey))
            body += struct.pack("<d", float(acctbal))
        return (
            _avro_zigzag(len(chunk))
            + _avro_zigzag(len(body))
            + bytes(body)
            + _AVRO_SYNC
        )

    half = max(1, len(rows) // 2)
    return bytes(header) + block(rows[:half]) + block(rows[half:])


def _avro_decode_supplier(blob: bytes) -> list[tuple]:
    """Parse one container file back to rows; validates magic, schema
    metadata, per-block sizes, and every sync marker."""
    import struct

    if blob[:4] != _AVRO_MAGIC:
        raise ValueError("bad avro magic")
    pos = 4
    n_meta, pos = _avro_read_long(blob, pos)
    meta = {}
    while n_meta:
        for _ in range(n_meta):
            klen, pos = _avro_read_long(blob, pos)
            k = blob[pos : pos + klen]
            pos += klen
            vlen, pos = _avro_read_long(blob, pos)
            meta[k] = blob[pos : pos + vlen]
            pos += vlen
        n_meta, pos = _avro_read_long(blob, pos)
    if b'"name":"supplier"' not in meta.get(b"avro.schema", b""):
        raise ValueError("unexpected avro schema")
    sync = blob[pos : pos + 16]
    pos += 16
    rows = []
    while pos < len(blob):
        n_rec, pos = _avro_read_long(blob, pos)
        size, pos = _avro_read_long(blob, pos)
        end = pos + size
        for _ in range(n_rec):
            suppkey, pos = _avro_read_long(blob, pos)
            nlen, pos = _avro_read_long(blob, pos)
            name = blob[pos : pos + nlen].decode()
            pos += nlen
            nationkey, pos = _avro_read_long(blob, pos)
            (acctbal,) = struct.unpack_from("<d", blob, pos)
            pos += 8
            rows.append((suppkey, name, nationkey, acctbal))
        if pos != end or blob[pos : pos + 16] != sync:
            raise ValueError("avro block corrupt")
        pos += 16
    return rows


@register(
    "scan_avro_roundtrip",
    category="scans",
    bench=False,
    oracle="""
    SELECT s_nationkey, count(*) AS n,
           round(sum(s_acctbal), 2) AS total_acctbal
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def scan_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → Avro container files → distributed decode → aggregate
    (must equal the parquet truth).

    Write side: the supplier table is encoded into 4 genuine Avro 1.x
    container files (two data blocks each) by the spec-faithful codec
    above — driver-side, fixture-sized. Read side is the 100 TB shape:
    a `binaryFile` scan parallelizes over files and an Arrow-batched
    mapInPandas decodes each container — parallelism = number of files,
    the same unit Avro splits on (sync-marker block boundaries within a
    file are a refinement the native reader adds). With the spark-avro
    module deployed the scan collapses to `spark.read.format("avro")`;
    this op proves byte-level format fidelity and keeps the decode
    plumbing (schema, batching, validation) real in a sandbox without
    it.
    """
    import pandas as pd

    rows = [
        (r["s_suppkey"], r["s_name"], r["s_nationkey"], r["s_acctbal"])
        for r in load(spark, sf_dir, "supplier")
        .orderBy("s_suppkey")
        .collect()
    ]
    out = work_dir("avro_supplier")
    # Clear stale part files first (sibling round-trips do the same):
    # file count is ceil(n/ceil(n/4)), so a smaller fixture after a
    # larger one would leave a stale part-0003.avro to be decoded and
    # double-counted.
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    n_files = 4
    per = max(1, -(-len(rows) // n_files))
    for i in range(0, len(rows), per):
        with open(os.path.join(out, f"part-{i // per:04d}.avro"), "wb") as fh:
            fh.write(_avro_encode_supplier_file(rows[i : i + per]))

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                decoded = _avro_decode_supplier(bytes(blob))
                yield pd.DataFrame(
                    decoded,
                    columns=[
                        "s_suppkey",
                        "s_name",
                        "s_nationkey",
                        "s_acctbal",
                    ],
                )

    back = (
        spark.read.format("binaryFile")
        .load(out)
        .select("content")
        .mapInPandas(
            decode,
            "s_suppkey bigint, s_name string, s_nationkey int, "
            "s_acctbal double",
        )
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
    )


# --- Protobuf wire-format codec (from the public encoding spec) ----------
# Like the Avro codec above: no protobuf library ships in this sandbox, so
# the wire format is implemented from the published spec — varint
# base-128 ints (10-byte two's-complement for negatives), little-endian
# fixed64 doubles, (field_number << 3 | wire_type) tags, unknown-field
# skipping — and messages are framed with the standard length-delimited
# stream convention (each message preceded by its varint byte length,
# the writeDelimitedTo interop format).
#
#   message Supplier {            // field tags in the encoder/decoder
#     int64  s_suppkey   = 1;     // wire type 0 (varint)
#     string s_name      = 2;     // wire type 2 (len-delimited)
#     int32  s_nationkey = 3;     // wire type 0 (varint)
#     double s_acctbal   = 4;     // wire type 1 (fixed64)
#   }

def _pb_varint(n: int) -> bytes:
    """Unsigned base-128 varint; negative ints go through the 64-bit
    two's complement exactly like proto int32/int64 fields."""
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            # Mask to 64 bits FIRST: a malformed 10th byte > 0x01 would
            # otherwise push acc outside the int64 domain entirely.
            acc &= (1 << 64) - 1
            if acc >= 1 << 63:  # two's complement back to signed
                acc -= 1 << 64
            return acc, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _pb_encode_supplier_stream(rows: list[tuple]) -> bytes:
    """rows of (s_suppkey, s_name, s_nationkey, s_acctbal) → one
    length-delimited protobuf stream."""
    import struct

    out = bytearray()
    for suppkey, name, nationkey, acctbal in rows:
        nb = name.encode()
        msg = bytearray()
        msg += b"\x08" + _pb_varint(int(suppkey))  # 1<<3|0
        msg += b"\x12" + _pb_varint(len(nb)) + nb  # 2<<3|2
        msg += b"\x18" + _pb_varint(int(nationkey))  # 3<<3|0
        msg += b"\x21" + struct.pack("<d", float(acctbal))  # 4<<3|1
        out += _pb_varint(len(msg)) + msg
    return bytes(out)


def _pb_decode_supplier_stream(blob: bytes) -> list[tuple]:
    """Parse a length-delimited stream back to rows. Spec-faithful:
    fields may arrive in any order, unknown fields are skipped by wire
    type, truncation/overrun raises."""
    import struct

    rows = []
    pos = 0
    while pos < len(blob):
        mlen, pos = _pb_read_varint(blob, pos)
        if mlen < 0 or pos + mlen > len(blob):
            raise ValueError("message length overruns stream")
        end = pos + mlen
        suppkey = nationkey = 0
        name = ""
        acctbal = 0.0
        while pos < end:
            tag, pos = _pb_read_varint(blob, pos)
            field, wire = tag >> 3, tag & 7
            if wire == 0:
                val, pos = _pb_read_varint(blob, pos)
                if field == 1:
                    suppkey = val
                elif field == 3:
                    nationkey = val
            elif wire == 1:
                if field == 4:
                    (acctbal,) = struct.unpack_from("<d", blob, pos)
                pos += 8
            elif wire == 2:
                ln, pos = _pb_read_varint(blob, pos)
                # Guard the INNER length like the outer message length:
                # a crafted negative/oversized varint here would march
                # the cursor backward and loop forever (found by review;
                # regression-tested in tests/test_fidelity.py).
                if ln < 0 or pos + ln > end:
                    raise ValueError("field length overruns message")
                if field == 2:
                    name = blob[pos : pos + ln].decode()
                pos += ln
            else:
                raise ValueError(f"unsupported wire type {wire}")
        if pos != end:
            raise ValueError("message fields overran declared length")
        rows.append((suppkey, name, nationkey, acctbal))
    return rows


@register(
    "scan_protobuf_roundtrip",
    category="scans",
    bench=False,
    oracle="""
    SELECT s_nationkey, count(*) AS n,
           CAST(max(s_suppkey) AS BIGINT) AS max_suppkey,
           round(sum(s_acctbal), 2) AS total_acctbal
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def scan_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → length-delimited protobuf streams → distributed decode
    → aggregate (must equal the parquet truth).

    Sibling of scan_avro_roundtrip: the write side encodes the supplier
    table into 4 genuine protobuf streams with the from-spec codec
    above; the read side is the 100 TB shape — binaryFile scan
    parallelizing over files, Arrow-batched mapInPandas decoding each
    stream (parallelism = file count, the unit protobuf streams split
    on, since messages are not self-synchronizing within a file). With
    a protobuf runtime deployed the decode body would call the
    generated class; the Spark-side plumbing (schema, batching,
    validation, aggregate) is identical and oracle-certified here.
    """
    import pandas as pd
    import shutil

    rows = [
        (r["s_suppkey"], r["s_name"], r["s_nationkey"], r["s_acctbal"])
        for r in load(spark, sf_dir, "supplier")
        .orderBy("s_suppkey")
        .collect()
    ]
    out = work_dir("pb_supplier")
    shutil.rmtree(out, ignore_errors=True)  # stale-part guard (see avro)
    os.makedirs(out)
    n_files = 4
    per = max(1, -(-len(rows) // n_files))
    for i in range(0, len(rows), per):
        with open(os.path.join(out, f"part-{i // per:04d}.pb"), "wb") as fh:
            fh.write(_pb_encode_supplier_stream(rows[i : i + per]))

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                decoded = _pb_decode_supplier_stream(bytes(blob))
                yield pd.DataFrame(
                    decoded,
                    columns=[
                        "s_suppkey",
                        "s_name",
                        "s_nationkey",
                        "s_acctbal",
                    ],
                )

    back = (
        spark.read.format("binaryFile")
        .load(out)
        .select("content")
        .mapInPandas(
            decode,
            "s_suppkey bigint, s_name string, s_nationkey int, "
            "s_acctbal double",
        )
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("s_suppkey").alias("max_suppkey"),
        F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
    )


@register(
    "scan_csv_permissive_recovery",
    category="scans",
    bench=False,
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows_total,
           CAST(sum(CASE WHEN o_orderkey % 7 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN o_orderkey % 7 = 3 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_good,
           CAST(sum(CASE WHEN o_orderkey % 7 = 3 THEN 0
                    ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    END) AS DOUBLE) / 100.0 AS good_revenue
    FROM orders WHERE o_orderkey <= 4000
    """,
)
def scan_csv_permissive_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-CSV RECOVERY through PERMISSIVE mode — the error path
    every real text-format ingest needs (the reference's own framing
    bug class: publisher.go:182-202 silently drops what it can't
    frame; a lake ingest must instead land bad rows in a quarantine
    column and keep a byte-accurate record). Rows whose orderkey ≡ 3
    (mod 7) carry a non-numeric price field; the reader must (a) not
    abort, (b) null the typed column, (c) capture the ORIGINAL raw
    line in columnNameOfCorruptRecord so reprocessing is possible, and
    (d) leave every well-formed row's value bit-exact.

    The oracle restates good/corrupt populations and the surviving
    cents total as predicates over orders — so the hash certifies the
    quarantine split, not just counts. Scale: corrupt-record capture
    is row-local inside the distributed CSV parse (no extra pass, no
    driver involvement); the quarantine column prunes away unless
    selected.
    """
    out = work_dir("csv_permissive")
    src = (
        load(spark, sf_dir, "orders")
        .filter("o_orderkey <= 4000")
        .selectExpr(
            "CAST(o_orderkey AS STRING) AS k",
            "CASE WHEN o_orderkey % 7 = 3 THEN 'NOT_A_NUMBER'"
            " ELSE CAST(o_totalprice AS STRING) END AS p",
        )
        .selectExpr("concat(k, ',', p) AS line")
    )
    src.coalesce(4).write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "o_orderkey BIGINT, o_totalprice DOUBLE, _bad STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(out)
    )
    return back.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_total"),
        F.sum(F.expr("CASE WHEN _bad IS NOT NULL THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.expr("CASE WHEN _bad IS NULL THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_good"),
        (
            F.sum(
                F.expr(
                    "CASE WHEN _bad IS NULL THEN"
                    " CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
                    " ELSE CAST(0 AS BIGINT) END"
                )
            ).cast("double")
            / F.lit(100.0)
        ).alias("good_revenue"),
    )
