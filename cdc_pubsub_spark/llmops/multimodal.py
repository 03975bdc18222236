"""Multimodal-column operators: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
`binary` column (exactly the reference's opaque `[]byte` payload stance,
publisher.go:193-196), metadata travels in typed columns, and decoding
happens in Arrow-batched `mapInPandas` — executors stream record batches,
nothing ever materializes a partition in memory.

The actual media codecs (PIL/librosa/ffmpeg) are NOT in this container,
so the decode kernel is gated behind an import-try and falls back to a
DETERMINISTIC FAKE decoder (first bytes → fake dimensions). The Spark
plumbing — binary schema, batch iteration, output schema, partitioning —
is real and is what these operators test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load


@register(
    "multimodal_meta",
    category="multimodal",
    oracle="""
    SELECT
      doc_id,
      CASE
        WHEN source = 'src0' THEN 'image/png'
        WHEN source = 'src1' THEN 'audio/wav'
        ELSE 'application/octet-stream'
      END                           AS mime,
      octet_length(encode(text))    AS n_bytes,
      octet_length(encode(text)) > 0 AS is_valid
    FROM documents
    WHERE doc_id <= 2000
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata (mime, byte length).

    Payloads are synthesized from document text (utf-8 encode) since the
    container ships no media files; the schema is the real contract:
    `payload BINARY, mime STRING, n_bytes BIGINT`. Parquet stores the
    binary column with its own encoding and the metadata columns remain
    min/max-prunable — scans filtering on mime never touch payload bytes.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 2000)
    payload = F.encode("text", "utf-8")
    mime = (
        F.when(F.col("source") == "src0", "image/png")
        .when(F.col("source") == "src1", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return docs.select(
        "doc_id",
        mime.alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        (F.octet_length(payload) > 0).alias("is_valid"),
    )


def _decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decoder — requires PIL, which this container does not ship.

    Raises NotImplementedError so callers fall back to the deterministic
    fake; on a cluster with codecs installed, replace the body with
    `img = PIL.Image.open(io.BytesIO(payload)); return img.size`.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError("media codecs not available in this environment")
    raise NotImplementedError("real decode path reserved for codec-enabled clusters")


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions from the first payload bytes."""
    w = (payload[0] if payload else 0) % 64 + 1
    h = (payload[1] if len(payload) > 1 else 0) % 64 + 1
    return w, h


@register("multimodal_decode_stub", category="multimodal", oracle=None, bench=False)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode kernel over binary payloads (stubbed codec).

    Arrow streams record batches into Python; the kernel decodes each
    payload and emits typed features. Batch shape, schema declaration,
    and executor-side iteration are production-real; only the codec call
    is faked (deterministically) because the container has no media libs.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 500)
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, ok = [], [], []
            for raw in pdf["payload"]:
                data = bytes(raw)
                try:
                    w, h = _decode_image_real(data)
                except NotImplementedError:
                    w, h = _decode_fake(data)
                widths.append(w)
                heights.append(h)
                ok.append(True)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths,
                    "height": heights,
                    "decoded_ok": ok,
                }
            )

    return payloads.mapInPandas(
        decode_batches, schema="doc_id bigint, width int, height int, decoded_ok boolean"
    )


@register("multimodal_frame_sample", category="multimodal", oracle=None, bench=False)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame index.

    Fake frame count derived from payload length; every 5th frame is
    sampled via sequence+explode (JVM-side expansion — the frame *index*
    plan never touches Python; only the per-frame decode would, via the
    same mapInPandas kernel as multimodal_decode_stub).
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    n_frames = (F.octet_length(F.encode("text", "utf-8")) % 50 + 10).alias("n_frames")
    frames = docs.select("doc_id", n_frames)
    return frames.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))).alias(
            "frame_idx"
        ),
    )


def _audio_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic fake audio probe: (duration_ms, sample_rate)."""
    dur = (len(payload) * 7) % 60_000 + 1_000
    rate = 8_000 * (2 ** ((payload[0] if payload else 0) % 3))  # 8/16/32 kHz
    return dur, rate


def _video_fake(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake video probe: (n_frames, width, height)."""
    n = (len(payload) % 240) + 24
    w, h = _decode_fake(payload)
    return n, w * 16, h * 9


@register("multimodal_av_features", category="multimodal", oracle=None, bench=False)
def multimodal_av_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mime kernel dispatch over mixed media payloads: one
    mapInPandas pass, a kernel registry keyed by mime type, unified
    wide-nullable output schema.

    The production shape for a mixed-media lake: media type is a DATA
    property (mime column), not a table property, so one operator must
    route each row to the right decoder — audio rows get
    (duration_ms, sample_rate), video rows (n_frames, width, height),
    image rows (width, height), unknown mimes pass through with nulls
    and decoded_ok=false (dead-letter stance: never dropped, unlike the
    reference's silent 64 KiB truncation, publisher.go:182-202).

    Memory contract for payload-heavy rows: Arrow batch size is bounded
    via `spark.sql.execution.arrow.maxRecordsPerBatch` before the plan
    runs — with multi-MB binaries the default 10k-row batch is a
    multi-GB allocation per task; 512 keeps peak executor memory
    independent of payload count. Kernels are stubs behind the same
    import-try gate as _decode_image_real (no codecs in this
    container); the dispatch, schema, and batch-bounding are the real
    artifact.
    """
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 600)
    mime = (
        F.when(F.col("source").isin("src0", "src3"), "image/png")
        .when(F.col("source").isin("src1", "src4"), "audio/wav")
        .when(F.col("source").isin("src2", "src5"), "video/mp4")
        .otherwise("application/octet-stream")
    )
    payloads = docs.select(
        "doc_id", mime.alias("mime"), F.encode("text", "utf-8").alias("payload")
    )

    def dispatch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def image_row(data: bytes) -> dict:
            try:
                w, h = _decode_image_real(data)
            except NotImplementedError:
                w, h = _decode_fake(data)
            return {"width": w, "height": h, "decoded_ok": True}

        def audio_row(data: bytes) -> dict:
            dur, rate = _audio_fake(data)
            return {"duration_ms": dur, "sample_rate": rate, "decoded_ok": True}

        def video_row(data: bytes) -> dict:
            n, w, h = _video_fake(data)
            return {
                "n_frames": n,
                "width": w,
                "height": h,
                "decoded_ok": True,
            }

        kernels = {
            "image/png": image_row,
            "audio/wav": audio_row,
            "video/mp4": video_row,
        }
        cols = [
            "width", "height", "duration_ms", "sample_rate", "n_frames",
        ]
        for pdf in batches:
            out = []
            for doc_id, m, raw in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                kernel = kernels.get(m)
                row = kernel(bytes(raw)) if kernel else {"decoded_ok": False}
                rec = {"doc_id": doc_id, "mime": m, "decoded_ok": row.pop("decoded_ok")}
                for c in cols:
                    rec[c] = row.get(c)
                out.append(rec)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        dispatch,
        schema=(
            "doc_id bigint, mime string, decoded_ok boolean, width int,"
            " height int, duration_ms int, sample_rate int, n_frames int"
        ),
    )


@register("multimodal_binary_ingest", category="multimodal", oracle=None, bench=False)
def multimodal_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-file ingestion via the binaryFile source: every file under
    the scale-factor directory becomes one row of (path, length,
    content) — the front door a media lake uses to land image/audio
    files before any decode.

    `spark.read.format("binaryFile")` lists and reads files
    executor-side (distributed listing + read, nothing driver-local),
    carries modification time for incremental loads, and feeds the same
    mapInPandas decode kernels as multimodal_decode_stub. Content bytes
    are projected away here — the aggregate only needs lengths, and
    column pruning means payloads are never even read (the binaryFile
    reader skips `content` when unprojected)."""
    files = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    return files.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.parquet$", 1).alias("table"),
        F.col("length").alias("n_bytes"),
    ).orderBy("table")
