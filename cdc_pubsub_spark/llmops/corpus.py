"""Deterministic dup-planted corpora for the dedup operators.

The driver's `documents`/`embeddings` tables contain no duplicates, so —
exactly like the CDC fixtures (FIXTURES.md §3) — each dedup operator
synthesizes its corpus as a pure function of the source table: planted
exact copies (doc_id+1_000_000, same text) and near copies
(doc_id+2_000_000, three words appended). The identical CTE runs in the
DuckDB oracle, so dedup results stay hash-checkable.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_pubsub_spark.tables import load

# Fragment memo: dup_corpus / shingle fragments are rebuilt by every
# dedup/text consumer (7+ call sites), each paying ~50-100 ms of py4j
# plan construction for an IDENTICAL logical plan. DataFrames are
# immutable, so one fragment per (anchor object, kind, n) serves all
# consumers. The anchor (SparkSession for dup_corpus, corpus DataFrame
# for shingle fragments) is held strongly so id() can't be recycled.
_FRAG: dict[tuple, tuple[object, DataFrame]] = {}
_FRAG_LOCK = threading.Lock()


def _memo(anchor: object, key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    with _FRAG_LOCK:
        hit = _FRAG.get(key)
        if hit is not None and hit[0] is anchor:
            return hit[1]
    df = build()
    with _FRAG_LOCK:
        if len(_FRAG) >= 256:
            # Anchors are held strongly (so id() keys stay valid), which
            # also pins the JVM-side plans — bound the cache so ad-hoc
            # corpora (tests build thousands) can't accumulate. The hot
            # entries (one per session × sf_dir × fragment kind) repopulate
            # in one build each.
            _FRAG.clear()
        _FRAG[key] = (anchor, df)
    return df


# Appended to near-dup copies: shrinks Jaccard to ~0.9 on a ~60-word doc.
NEAR_SUFFIX = " zq extra tail"

# The ONE train/val/test membership rule (~90/5/5 by md5(doc_id) first
# byte): every op that tags or audits splits MUST use these twins —
# corpus_train_val_split defines the split, corpus_split_leakage audits
# it, and a threshold change in one place must change both.
SPLIT_CASE_SQL = """
      CASE
        WHEN CAST(concat('0x',
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 230
          THEN 'train'
        WHEN CAST(concat('0x',
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 243
          THEN 'val'
        ELSE 'test' END
"""


def split_col() -> Column:
    """Spark twin of SPLIT_CASE_SQL (reads a `doc_id` column)."""
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return (
        F.when(bucket < 230, "train").when(bucket < 243, "val").otherwise("test")
    )

CORPUS_CTE = f"""
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, concat(text, '{NEAR_SUFFIX}')
      FROM documents WHERE doc_id % 7 = 0
    )
"""


def dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies (÷10) ∪ near copies (÷7, suffix appended)."""

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        exact = docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
        near = docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
        )
        return docs.unionByName(exact).unionByName(near)

    if not os.path.abspath(sf_dir).startswith("/root/testdata/"):
        # Mirror tables.load's cacheability rule: tmp fixture dirs may be
        # rewritten between calls, and a memoized scan's file index would
        # go stale.
        return build()
    return _memo(spark, (id(spark), "corpus", sf_dir), build)


def shingle_array(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Per-doc word n-gram shingle array: (doc_id, grams array<string>).

    Built entirely JVM-side (transform over sequence) — one narrow map
    pass, no explode, no shuffle. Docs shorter than n words are dropped
    (guard against Spark's descending `sequence`).

    The text splits into a word array ONCE in its own projection; the
    shingle lambda then reads it with O(1) element_at. `split(text)`
    written inline inside the lambda is NOT hoisted by Catalyst — it
    re-splits the whole document once per shingle, turning each doc
    O(words²) (measured 4.5× slower on the shingle pass at sf0.1; same
    pitfall as text_lm_perplexity's bigram extraction). The extra
    projection survives CollapseProject because the split has multiple
    consumers.
    """
    def build() -> DataFrame:
        # Join words with single spaces: concat(w1, ' ', w2, ' ', w3).
        parts = [f"element_at(ws, i + {j})" for j in range(n)]
        joined = ", ' ', ".join(parts)
        grams = F.expr(
            f"transform(sequence(1, size(ws) - {n - 1}), i -> concat({joined}))"
        )
        return (
            corpus.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
            .filter(F.size("ws") >= n)
            .select("doc_id", grams.alias("grams"))
        )

    return _memo(corpus, (id(corpus), "shingle_array", n), build)


def shingle_rows(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Per-doc word n-gram shingles as (doc_id, shingle) ROWS, built
    from bulk array ops: n shifted slice()s of the word array zipped
    and exploded, the join into a string running post-explode inside
    codegen. For explode-consumers this beats exploding
    shingle_array's lambda-built array ~4× (the lambda allocates each
    shingle under interpreted HOF evaluation — same finding as
    text_lm_perplexity's bigram extraction). shingle_array stays for
    consumers that need the per-doc ARRAY (minhash's zero-shuffle
    signature folds)."""
    def build() -> DataFrame:
        slices = [
            F.expr(f"slice(ws, {j + 1}, size(ws) - {n - 1})") for j in range(n)
        ]
        return (
            corpus.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
            .filter(F.size("ws") >= n)
            .select("doc_id", F.explode(F.arrays_zip(*slices)).alias("p"))
            .select(
                "doc_id",
                F.concat_ws(
                    " ", *[F.col(f"p.{j}") for j in range(n)]
                ).alias("shingle"),
            )
        )

    return _memo(corpus, (id(corpus), "shingle_rows", n), build)


def shingles(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle) rows."""
    return shingle_rows(corpus, n).distinct()


SHINGLES_CTE = """
    shingles AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(len(string_split(text, ' ')) - 2),
               i -> concat_ws(' ', string_split(text, ' ')[i + 1],
                              string_split(text, ' ')[i + 2],
                              string_split(text, ' ')[i + 3]))) AS shingle
      FROM corpus
      WHERE len(string_split(text, ' ')) >= 3
    )
"""


from cdc_pubsub_spark.functions.rounding import r4  # noqa: E402
from cdc_pubsub_spark.registry import register  # noqa: E402


@register(
    "corpus_train_val_split",
    category="corpus",
    oracle=f"""
    WITH tagged AS (
      SELECT *, {SPLIT_CASE_SQL.strip()} AS split
      FROM documents
    )
    SELECT
      split,
      count(*)                    AS n_docs,
      count(DISTINCT lang)        AS n_langs,
      CAST(sum(n_chars) AS BIGINT) AS total_chars,
      min(doc_id)                 AS first_doc
    FROM tagged
    GROUP BY 1
    """,
)
def corpus_train_val_split(spark, sf_dir):
    """Deterministic train/val/test split (~90/5/5) by content hash —
    the reproducible-split staple of every training pipeline.

    Membership is a pure function of doc_id (md5 first byte: <230
    train, <243 val, else test), so it survives reruns, engine swaps,
    cluster resizes, and incremental ingestion — a doc NEVER migrates
    between splits, which is the property that keeps eval sets
    uncontaminated as the corpus grows (rand()-based splits silently
    leak). Zero shuffle for the tagging itself (per-row hash in the
    scan); the only exchange is the stats aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(split_col().alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "corpus_batch_assembly",
    category="corpus",
    oracle="""
    WITH shuffled AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) - 1 AS pos
      FROM documents
    )
    SELECT
      CAST(floor(pos / 32) AS BIGINT) AS batch_id,
      count(*)                        AS batch_size,
      count(DISTINCT lang)            AS n_langs,
      CAST(sum(n_chars) AS BIGINT)    AS total_chars
    FROM shuffled
    GROUP BY 1
    HAVING count(*) = 32
    """,
)
def corpus_batch_assembly(spark, sf_dir):
    """Training-batch assembly: a deterministic global shuffle (order by
    content hash, NOT rand()) sliced into fixed-size batches of 32,
    with per-batch composition stats; the ragged final batch is
    dropped, as a fixed-shape trainer would.

    The hash ordering is the reproducible equivalent of dataset
    shuffling — the same corpus always yields the same batches, so a
    training run is bit-replayable from the batch_id. The global
    position is computed DISTRIBUTED (the classic two-level scan, no
    single-partition total-order pass): the md5's first byte pair is a
    deterministic hash-range bucket (256 uniform ranges — the
    repartitionByRange equivalent with static boundaries), each bucket
    ranks its own rows in one balanced window, and bucket offsets come
    from an exclusive prefix sum over the 256-row bucket-count frame
    (driver-tiny; broadcast back). Because the bucket is a PREFIX of
    the hash, (bkt, h, doc_id) order IS (h, doc_id) order, so the
    distributed positions equal the serial ones bit-for-bit — same
    oracle. At 100 TB widen the prefix (2 bytes → 65k buckets); the
    corpus-sized side never passes through one partition.
    """
    docs = load(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bkt", F.substring("h", 1, 2))
    wloc = Window.partitionBy("bkt").orderBy("h", "doc_id")
    local = hashed.withColumn("rn", F.row_number().over(wloc))
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        local.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("bkt", (F.sum("cnt").over(woff) - F.col("cnt")).alias("off"))
    )
    shuffled = local.join(F.broadcast(offsets), "bkt").select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("off") + F.col("rn") - 1).alias("pos"),
    )
    return (
        shuffled.groupBy(F.floor(F.col("pos") / 32).cast("bigint").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("batch_size"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .filter(F.col("batch_size") == 32)
    )


@register(
    "corpus_stratified_sample",
    category="corpus",
    oracle="""
    WITH tagged AS (
      SELECT lang, n_chars,
        CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 3, 2)) AS INT)
          AS bucket,
        CASE WHEN lang = 'en' THEN 64 ELSE 224 END AS keep_below
      FROM documents
    )
    SELECT lang,
           count(*)                                       AS n_docs,
           CAST(count(*) FILTER (bucket < keep_below) AS BIGINT) AS n_sampled,
           round(CAST(count(*) FILTER (bucket < keep_below) AS DOUBLE)
                 / count(*), 2)                            AS achieved_rate,
           CAST(sum(n_chars) FILTER (bucket < keep_below) AS BIGINT)
                                                           AS sampled_chars
    FROM tagged
    GROUP BY lang
    """,
)
def corpus_stratified_sample(spark, sf_dir):
    """Stratified corpus sampling for data mixing: per-language target
    rates (down-weight the dominant 'en' stratum to 25%, keep the rest
    at ~87.5%) applied by deterministic content hash, with achieved
    rates reported per stratum.

    The data-mixing primitive of every training pipeline: rebalancing
    sources/languages WITHOUT rand() — membership is a pure function of
    doc_id (md5 byte 2, disjoint from the split byte used by
    corpus_train_val_split, so sampling and splitting are independent
    events), which makes mixes reproducible, incrementally extendable,
    and consistent across engines. Zero shuffle for the tagging (hash
    in the scan); one aggregate for the audit stats — the same plan at
    100 TB. The FILTER-aggregate form keeps kept/total in ONE pass
    instead of sampling into a separate scan.
    """
    docs = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 3, 2), 16, 10
    ).cast("int")
    keep_below = F.when(F.col("lang") == "en", 64).otherwise(224)
    kept = bucket < keep_below
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_sampled"),
        F.round(
            F.count(F.when(kept, 1)).cast("double") / F.count(F.lit(1)), 2
        ).alias("achieved_rate"),
        F.sum(F.when(kept, F.col("n_chars"))).cast("bigint").alias("sampled_chars"),
    )


@register(
    "corpus_split_leakage",
    category="corpus",
    oracle=f"""
    WITH {CORPUS_CTE.strip()},
    tagged AS (
      SELECT doc_id, md5(text) AS h, {SPLIT_CASE_SQL.strip()} AS split
      FROM corpus
    ),
    spans AS (
      SELECT h,
             count(DISTINCT split)  AS n_splits,
             count(*)               AS n_docs,
             min(doc_id)            AS canonical_id
      FROM tagged
      GROUP BY h
      HAVING count(DISTINCT split) > 1
    )
    SELECT
      count(*)                      AS leaked_groups,
      CAST(sum(n_docs) AS BIGINT)   AS leaked_docs,
      min(canonical_id)             AS first_canonical
    FROM spans
    """,
)
def corpus_split_leakage(spark, sf_dir):
    """Train/val/test LEAKAGE detection: exact-duplicate text groups that
    span more than one split — the eval-contamination check every
    training pipeline must run, because membership hashes the doc_id
    (stable under re-ingestion) while duplicates arrive under NEW ids
    and land in arbitrary splits. The planted corpus makes this real:
    every ÷10 doc has an exact copy at doc_id+1,000,000 whose split is
    an independent hash draw, so ~10% of copy pairs straddle splits.

    One shuffle on md5(text) (the dedup_exact key), a distinct-split
    count per group, and a single audit row: groups leaking, documents
    involved, first canonical id (for triage). At 100 TB this composes
    with dedup_minhash_lsh for NEAR-dup leakage: same group-by with the
    band signature in place of the exact hash. The fix it motivates is
    upstream: dedup BEFORE splitting, or split by content hash
    (md5(text)) instead of id — this op is the regression test that
    proves you did.
    """
    corpus = dup_corpus(spark, sf_dir)
    spans = (
        corpus.select("doc_id", F.md5("text").alias("h"), split_col().alias("split"))
        .groupBy("h")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
        .filter(F.col("n_splits") > 1)
    )
    return spans.agg(
        F.count(F.lit(1)).alias("leaked_groups"),
        F.sum("n_docs").cast("bigint").alias("leaked_docs"),
        F.min("canonical_id").alias("first_canonical"),
    )


@register(
    "corpus_sequence_pack",
    category="corpus",
    oracle="""
    WITH toks AS (
      SELECT doc_id, (n_chars + 3) // 4 AS tok,
             row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS pos
      FROM documents
    ),
    packed AS (
      SELECT doc_id, tok,
             CAST(sum(tok) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) - tok
                  AS BIGINT) AS start_tok
      FROM toks
    )
    SELECT
      start_tok // 2048                                   AS seq_id,
      count(*)                                            AS n_docs,
      CAST(sum(tok) AS BIGINT)                            AS tokens_begun,
      CAST(sum(CASE WHEN (start_tok + tok - 1) // 2048 > start_tok // 2048
               THEN 1 ELSE 0 END) AS BIGINT)              AS n_straddle,
      arg_min(doc_id, start_tok)                          AS first_doc
    FROM packed
    GROUP BY 1
    ORDER BY 1
    """,
)
def corpus_sequence_pack(spark, sf_dir):
    """Training-sequence packing: concatenate the corpus in deterministic
    hash order and chunk it into fixed 2048-token sequences — the LLM
    pretraining layout (docs are concatenated and split at sequence
    boundaries; a doc may straddle two sequences).

    Token counts use the ~4-chars/token heuristic ((n_chars+3) div 4 —
    all-integer, so every cumulative position is exact across engines).
    Each doc's sequence is floor(cumulative-start / 2048); per sequence
    the op reports docs begun, tokens contributed, boundary straddles,
    and the first doc id — the manifest a dataloader needs to seek into
    the packed stream. The cumulative token position is computed as a
    DISTRIBUTED exclusive prefix sum (the classic two-level scan, no
    global single-partition window): the md5's first byte pair is a
    deterministic hash-range bucket (256 uniform ranges), each bucket
    runs its own balanced cumulative-sum window, and bucket base
    offsets come from an exclusive prefix sum over the 256-row
    bucket-total frame (broadcast back). The bucket is a PREFIX of the
    hash, so (bkt, h, doc_id) order IS (h, doc_id) order and every
    start_tok equals the serial value exactly — same oracle. At 100 TB
    widen the prefix (2 bytes → 65k buckets); the corpus-sized side
    never passes through one partition.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("(n_chars + 3) div 4").alias("tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bkt", F.substring("h", 1, 2))
    wloc = (
        Window.partitionBy("bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("cum", F.sum("tok").over(wloc))
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        local.groupBy("bkt")
        .agg(F.sum("tok").alias("btot"))
        .select(
            "bkt", (F.sum("btot").over(woff) - F.col("btot")).alias("off")
        )
    )
    packed = local.join(F.broadcast(offsets), "bkt").select(
        "doc_id",
        "tok",
        (F.col("off") + F.col("cum") - F.col("tok")).alias("start_tok"),
    )
    return (
        packed.groupBy(F.expr("start_tok div 2048").alias("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("bigint").alias("tokens_begun"),
            F.sum(
                F.when(
                    F.expr("(start_tok + tok - 1) div 2048") > F.expr("start_tok div 2048"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddle"),
            # The doc whose start OPENS the sequence in pack order (the
            # dataloader's seek target) — min_by on the unique exact
            # cumulative start, NOT min(doc_id): docs pack in hash
            # order, so the numerically smallest id is generally mid-
            # sequence.
            F.min_by("doc_id", F.col("start_tok")).alias("first_doc"),
        )
        .orderBy("seq_id")
    )


@register(
    "corpus_domain_mix",
    category="corpus",
    oracle="""
    WITH per_source AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum((n_chars + 3) // 4) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    total AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total_tokens FROM per_source)
    SELECT
      source, n_docs, tokens,
      floor(tokens / total_tokens * 10000 + 0.5) / 10000             AS share,
      floor(least(3.0, 0.05 * total_tokens / tokens) * 10000 + 0.5) / 10000
                                                                     AS sample_weight
    FROM per_source CROSS JOIN total
    ORDER BY source
    """,
)
def corpus_domain_mix(spark, sf_dir):
    """Domain-mixture weighting: per-source token shares and the sampling
    weights that re-balance the corpus to a uniform 1/20-per-source
    target — the data-mixing step every pretraining run tunes (upweight
    scarce domains, downweight dominant ones, cap repetition at 3
    epochs per the data-constrained-scaling rule of thumb).

    weight_s = min(3.0, target_share / actual_share): a source already
    at target gets 1.0, a scarce one is repeated (capped at 3x), an
    over-represented one is subsampled. One aggregate per source plus a
    broadcast 1-row total — two shuffles total regardless of corpus
    size; shares and weights are division-created doubles, so both
    engines use the floor-formula r4.
    """
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr("(n_chars + 3) div 4")).cast("bigint").alias("tokens"),
    )
    total = F.broadcast(
        per_source.agg(F.sum("tokens").cast("double").alias("total_tokens"))
    )
    return (
        per_source.crossJoin(total)
        .select(
            "source",
            "n_docs",
            "tokens",
            r4(F.col("tokens") / F.col("total_tokens")).alias("share"),
            r4(
                F.least(
                    F.lit(3.0),
                    F.lit(0.05) * F.col("total_tokens") / F.col("tokens"),
                )
            ).alias("sample_weight"),
        )
        .orderBy("source")
    )


@register(
    "corpus_resample_to_mix",
    category="corpus",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, (n_chars + 3) // 4 AS tok,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 5, 2)) AS INT)
               AS rbyte
      FROM documents
    ),
    per_source AS (
      SELECT source, CAST(sum(tok) AS BIGINT) AS tokens FROM toks GROUP BY source
    ),
    total AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total_tokens FROM per_source),
    weighted AS (
      SELECT source, least(3.0, 0.05 * total_tokens / tokens) AS w
      FROM per_source CROSS JOIN total
    ),
    copies AS (
      SELECT t.doc_id, t.source, t.tok,
             CAST(floor(w) AS BIGINT)
             + CASE WHEN t.rbyte < CAST(floor((w - floor(w)) * 256) AS INT)
                    THEN 1 ELSE 0 END AS n_copies
      FROM toks t JOIN weighted USING (source)
    ),
    resampled AS (
      SELECT doc_id, source, tok
      FROM copies, LATERAL unnest(range(0, n_copies)) AS r(i)
    )
    SELECT
      source,
      count(DISTINCT doc_id)          AS n_docs_in,
      count(*)                        AS n_rows_out,
      CAST(sum(tok) AS BIGINT)        AS tokens_out,
      floor(sum(tok)
            / (SELECT sum(tok) FROM resampled) * 10000 + 0.5) / 10000
                                      AS achieved_share
    FROM resampled
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_resample_to_mix(spark, sf_dir):
    """Apply the domain-mix weights: materialize the re-balanced corpus
    by deterministic repetition/subsampling and report the mix actually
    achieved — the execution half of ``corpus_domain_mix``'s plan.

    Each doc replicates floor(w) times plus one more when its hash byte
    (md5 byte 3 — disjoint from the split byte 1 and the stratified-
    sample byte 2, so resampling is independent of split membership)
    falls below the fractional remainder scaled to 256 — stochastic
    rounding made deterministic and content-stable: re-running, or
    growing OTHER sources, never changes whether THIS doc repeats.
    Replication is a row-local generate (explode of a per-row repeat —
    zero shuffle) executed exactly once: the per-source aggregate runs
    directly on the replicated rows and the grand-total denominator is
    a second aggregate over that 20-row result, never a second pass
    over the pipeline. The achieved share converges to the target as corpus
    size grows (256-quantization error ≤ 1/256 per source). The
    weights themselves are division-created doubles computed from
    exact integer token counts, hence bit-identical cross-engine.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.expr("(n_chars + 3) div 4").alias("tok"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 5, 2), 16, 10
        ).cast("int").alias("rbyte"),
    )
    per_source = toks.groupBy("source").agg(F.sum("tok").cast("bigint").alias("tokens"))
    total = F.broadcast(
        per_source.agg(F.sum("tokens").cast("double").alias("total_tokens"))
    )
    weighted = F.broadcast(
        per_source.crossJoin(total).select(
            "source",
            F.least(
                F.lit(3.0), F.lit(0.05) * F.col("total_tokens") / F.col("tokens")
            ).alias("w"),
        )
    )
    copies = toks.join(weighted, "source").select(
        "doc_id",
        "source",
        "tok",
        (
            F.floor("w").cast("bigint")
            + F.when(
                F.col("rbyte")
                < F.floor((F.col("w") - F.floor("w")) * 256).cast("int"),
                1,
            ).otherwise(0)
        ).alias("n_copies"),
    )
    # array_repeat, NOT sequence(1, n): Spark's sequence is descending
    # for n=0 (sequence(1,0) = [1,0]) — a subsampled doc (0 copies) must
    # explode into ZERO rows, which array_repeat's empty array gives.
    resampled = copies.select(
        "doc_id",
        "source",
        "tok",
        F.explode(F.expr("array_repeat(1, int(n_copies))")).alias("i"),
    )
    # Aggregate per source FIRST, then take the grand total over the
    # 20-row grouped result — the replication pipeline (scan, weight
    # join, explode) runs exactly once. A grand-total aggregate over
    # `resampled` itself would re-execute the whole pipeline for the
    # 1-row denominator: the Generate sits below any exchange, so
    # there is no shuffle boundary for ReusedExchange to collapse.
    per_out = resampled.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs_in"),
        F.count(F.lit(1)).alias("n_rows_out"),
        F.sum("tok").cast("bigint").alias("tokens_out"),
    )
    grand_total = F.broadcast(
        per_out.agg(F.sum("tokens_out").cast("double").alias("gt"))
    )
    return (
        per_out.crossJoin(grand_total)
        .select(
            "source",
            "n_docs_in",
            "n_rows_out",
            "tokens_out",
            r4(F.col("tokens_out") / F.col("gt")).alias("achieved_share"),
        )
        .orderBy("source")
    )


@register(
    "corpus_shard_balance",
    category="corpus",
    oracle="""
    WITH assigned AS MATERIALIZED (
      SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 16 AS shard,
             n_chars
      FROM documents
    ),
    per AS MATERIALIZED (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars
      FROM assigned GROUP BY 1
    ),
    tot AS MATERIALIZED (
      SELECT CAST(sum(n_docs) AS BIGINT) AS td,
             CAST(sum(chars) AS BIGINT) AS tc,
             CAST(max(chars) AS BIGINT) AS mx,
             CAST(count(*) AS BIGINT) AS n_shards
      FROM per
    )
    SELECT p.shard, p.n_docs, p.chars,
           floor(CAST(p.chars AS DOUBLE) / CAST(t.tc AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS char_share,
           floor(CAST(t.mx AS DOUBLE)
                 / (CAST(t.tc AS DOUBLE) / CAST(t.n_shards AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS max_skew_ratio
    FROM per p CROSS JOIN tot t
    ORDER BY p.shard
    """,
)
def corpus_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARD-ASSIGNMENT BALANCE AUDIT — hash documents onto 16 shards
    (md5 prefix mod, the split-twin device) and measure byte-weight
    balance: per-shard doc/char totals, each shard's share, and the
    fleet-wide max-skew ratio (heaviest shard ÷ ideal). This is the
    pre-flight check before any 100 TB repartition: hash sharding
    balances COUNTS by construction, but byte-weighted balance is
    data-dependent (a few huge documents skew a shard), and the skew
    ratio is exactly the number that predicts straggler executors —
    the planning twin of profile_data_skew (which measures skew the
    data already HAS; this measures skew an assignment WOULD create).

    Exactness: md5 is bit-identical cross-engine; totals are exact
    integers; shares are pinned divisions. Shape: one map-side
    groupBy onto 16 keys plus a broadcast total.
    """
    docs = load(spark, sf_dir, "documents")
    assigned = docs.selectExpr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT) % 16 AS shard",
        "n_chars",
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("td"),
        F.sum("chars").cast("bigint").alias("tc"),
        F.max("chars").cast("bigint").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "shard",
            "n_docs",
            "chars",
            "floor(CAST(chars AS DOUBLE) / CAST(tc AS DOUBLE)"
            " * 10000 + 0.5) / 10000 AS char_share",
            "floor(CAST(mx AS DOUBLE)"
            " / (CAST(tc AS DOUBLE) / CAST(n_shards AS DOUBLE))"
            " * 10000 + 0.5) / 10000 AS max_skew_ratio",
        )
        .orderBy("shard")
    )


# --- r12 growth: URL canonicalization dedup ----------------------------------


@register(
    "corpus_url_dedup_normalize",
    category="corpus",
    oracle="""
    WITH urls AS (
      SELECT source,
             (CASE WHEN (doc_id // 20) % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
             || '://'
             || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
             || source || '.Example.COM'
             || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
             || '/articles/' || CAST(doc_id // 40 AS VARCHAR)
             || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN (doc_id // 20) % 2 = 0
                 THEN '?utm_source=feed&id=' || CAST(doc_id // 40 AS VARCHAR)
                      || '&utm_campaign=x'
                 ELSE '?id=' || CAST(doc_id // 40 AS VARCHAR) END)
             || (CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END) AS url
      FROM documents
    ),
    parts AS (
      SELECT source, url,
             lower(string_split(url, '://')[1]) AS scheme,
             string_split(url, '://')[2] AS rest
      FROM urls
    ),
    hostsplit AS (
      SELECT source, url, scheme,
             lower(string_split(rest, '/')[1]) AS hostport,
             substr(rest, length(string_split(rest, '/')[1]) + 1) AS pathq
      FROM parts
    ),
    pieces AS (
      SELECT source, url, scheme,
             CASE WHEN hostport LIKE 'www.%'
                  THEN substr(hostport, 5) ELSE hostport END AS h1,
             string_split(string_split(pathq, '?')[1], '#')[1] AS rawpath,
             CASE WHEN contains(pathq, '?')
                  THEN string_split(string_split(pathq, '?')[2], '#')[1]
                  ELSE '' END AS query
      FROM hostsplit
    ),
    normed AS (
      SELECT source, url,
             scheme || '://'
             || (CASE WHEN h1 LIKE '%:443' AND scheme = 'https'
                 THEN substr(h1, 1, length(h1) - 4) ELSE h1 END)
             || (CASE WHEN rawpath <> '/' AND rawpath LIKE '%/'
                 THEN substr(rawpath, 1, length(rawpath) - 1)
                 ELSE rawpath END)
             || (CASE WHEN length(array_to_string(list_sort(
                        list_filter(string_split(query, '&'),
                                    p -> p NOT LIKE 'utm_%')), '&')) > 0
                 THEN '?' || array_to_string(list_sort(
                        list_filter(string_split(query, '&'),
                                    p -> p NOT LIKE 'utm_%')), '&')
                 ELSE '' END) AS canonical,
             CASE WHEN len(list_filter(string_split(query, '&'),
                           p -> p LIKE 'utm_%')) > 0
                  THEN 1 ELSE 0 END AS has_tracking
      FROM pieces
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
           CAST(count(*) - count(DISTINCT canonical) AS BIGINT) AS n_dupes,
           CAST(sum(has_tracking) AS BIGINT) AS n_tracking,
           floor((CAST(count(*) AS DOUBLE) - count(DISTINCT canonical))
                 / count(*) * 10000 + 0.5) / 10000 AS dup_rate
    FROM normed
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_url_dedup_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL CANONICALIZATION DEDUP — the first pass of every web-corpus
    pipeline (CCNet / RefinedWeb lineage): crawl frontiers emit the
    same resource under scheme-case, www-prefix, default-port,
    trailing-slash, tracking-param (utm_*), param-order, and fragment
    variants, and exact-dup removal only works after those collapse.
    URLs are synthesized per document with all seven variant axes
    planted (deterministic doc_id arithmetic), then PARSED BACK —
    scheme split on '://', host/port lowered with www./:443 stripped,
    path de-slashed, the query decomposed to params with utm_*
    dropped and the survivors lexicographically re-ordered, fragment
    cut — and deduplicated on the canonical string. The parse is the
    product: the oracle builds the identical URLs and re-derives the
    canonical form through DuckDB's own string/list kernel, so every
    split index and normalization branch is load-bearing.

    Scale shape: parsing is row-local codegen (split/substr/HOFs over
    a ≤6-element param list — no regex, no explode); the dedup is one
    count-distinct per source (map-side partial on (source, canonical)
    pairs). At 100 TB this is the same shape as dedup_exact with the
    canonical string in place of the raw key — hash-partitionable,
    no skew beyond the host distribution itself.
    """
    docs = load(spark, sf_dir, "documents")
    urls = docs.selectExpr(
        "source",
        "concat("
        " CASE WHEN (doc_id div 20) % 2 = 0 THEN 'HTTPS' ELSE 'https' END, '://',"
        " CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,"
        " source, '.Example.COM',"
        " CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,"
        " '/articles/', CAST(doc_id div 40 AS STRING),"
        " CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,"
        " CASE WHEN (doc_id div 20) % 2 = 0"
        " THEN concat('?utm_source=feed&id=', CAST(doc_id div 40 AS STRING),"
        "             '&utm_campaign=x')"
        " ELSE concat('?id=', CAST(doc_id div 40 AS STRING)) END,"
        " CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END"
        ") AS url",
    )
    parts = urls.selectExpr(
        "source",
        "lower(element_at(split(url, '://'), 1)) AS scheme",
        "element_at(split(url, '://'), 2) AS rest",
    )
    hostsplit = parts.selectExpr(
        "source",
        "scheme",
        "lower(element_at(split(rest, '/'), 1)) AS hostport",
        "substring(rest, length(element_at(split(rest, '/'), 1)) + 1)"
        " AS pathq",
    )
    pieces = hostsplit.selectExpr(
        "source",
        "scheme",
        "CASE WHEN hostport LIKE 'www.%' THEN substring(hostport, 5)"
        " ELSE hostport END AS h1",
        "element_at(split(element_at(split(pathq, '[?]'), 1), '#'), 1)"
        " AS rawpath",
        "CASE WHEN pathq LIKE '%?%'"
        " THEN element_at(split(element_at(split(pathq, '[?]'), 2), '#'), 1)"
        " ELSE '' END AS query",
    )
    normed = pieces.selectExpr(
        "source",
        "concat("
        " scheme, '://',"
        " CASE WHEN h1 LIKE '%:443' AND scheme = 'https'"
        " THEN substring(h1, 1, length(h1) - 4) ELSE h1 END,"
        " CASE WHEN rawpath <> '/' AND rawpath LIKE '%/'"
        " THEN substring(rawpath, 1, length(rawpath) - 1) ELSE rawpath END,"
        " CASE WHEN length(array_join(array_sort("
        "   filter(split(query, '&'), p -> p NOT LIKE 'utm_%')), '&')) > 0"
        " THEN concat('?', array_join(array_sort("
        "   filter(split(query, '&'), p -> p NOT LIKE 'utm_%')), '&'))"
        " ELSE '' END"
        ") AS canonical",
        "CASE WHEN size(filter(split(query, '&'), p -> p LIKE 'utm_%')) > 0"
        " THEN 1 ELSE 0 END AS has_tracking",
    )
    return (
        normed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.countDistinct("canonical").cast("bigint").alias("n_canonical"),
            F.sum("has_tracking").cast("bigint").alias("n_tracking"),
        )
        .selectExpr(
            "source",
            "n_urls",
            "n_canonical",
            "n_urls - n_canonical AS n_dupes",
            "n_tracking",
            "floor((CAST(n_urls AS DOUBLE) - n_canonical) / n_urls"
            " * 10000 + 0.5) / 10000 AS dup_rate",
        )
        .orderBy("source")
    )


# --- r12 extension wave E: greedy token-budget allocation --------------------


@register(
    "corpus_token_budget_allocation",
    category="corpus",
    oracle="""
    WITH per_src AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
             CAST(sum(len(list_filter(string_split(text, ' '),
                  w -> length(w) >= 5))) AS BIGINT) AS long_toks
      FROM documents GROUP BY source
    ),
    scored AS (
      SELECT source, toks,
             CAST(long_toks * 1000000 // toks AS BIGINT) AS quality_ppm,
             CAST(toks * 6 // 10 AS BIGINT) AS cap
      FROM per_src
    ),
    tot AS (
      SELECT CAST(sum(toks) * 4 // 10 AS BIGINT) AS budget FROM scored
    ),
    ranked AS (
      SELECT s.*, t.budget,
             CAST(row_number() OVER (ORDER BY s.quality_ppm DESC, s.source)
                  AS BIGINT) AS rnk,
             coalesce(sum(s.cap) OVER (ORDER BY s.quality_ppm DESC, s.source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM scored s CROSS JOIN tot t
    )
    SELECT source, rnk, quality_ppm, toks AS tokens_available, cap,
           CAST(greatest(least(cap, budget - cum_before), 0) AS BIGINT)
             AS allocated,
           least(cap, budget - cum_before) >= cap AS fully_taken
    FROM ranked
    ORDER BY rnk
    """,
)
def corpus_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY TOKEN-BUDGET ALLOCATION across sources — the mixing
    decision every pretraining run makes: given a token budget (40% of
    the corpus), a per-source diversity cap (60% of each source's
    tokens — no source may dominate), and a per-source quality score
    (ppm of tokens with length >= 5, an exact integer proxy in the
    text_quality_score family), fill the budget greedily from the
    highest-quality source down. The allocation is the classic
    fractional-knapsack prefix rule: every source before the knee gets
    its full cap, the knee source gets the remainder, everything after
    gets zero — realized as ONE window prefix sum over the
    quality-ranked source relation with a greatest/least clamp (no
    loop, no driver logic).

    Exactness: token counts, ppm scores, caps, and the budget are all
    integer floors; the allocation arithmetic is pure integer
    min/max. Total order on (quality_ppm DESC, source) makes the rank
    deterministic under ties.

    Scale shape: one data-sized aggregate collapses documents to the
    20-row per-source relation; the ranking window and clamp run
    there. At 100 TB sources number in the thousands at most — the
    window stays domain-bounded; the scan does all the work map-side.
    """
    docs = load(spark, sf_dir, "documents")
    per_src = docs.selectExpr(
        "source",
        "size(split(text, ' ')) AS nt",
        "size(filter(split(text, ' '), w -> length(w) >= 5)) AS nl",
    ).groupBy("source").agg(
        F.sum("nt").cast("bigint").alias("toks"),
        F.sum("nl").cast("bigint").alias("long_toks"),
    )
    scored = per_src.selectExpr(
        "source",
        "toks",
        "CAST(long_toks * 1000000 div toks AS BIGINT) AS quality_ppm",
        "CAST(toks * 6 div 10 AS BIGINT) AS cap",
    )
    tot = scored.agg(
        F.expr("CAST(sum(toks) * 4 div 10 AS BIGINT)").alias("budget")
    )
    w_ord = Window.orderBy(F.col("quality_ppm").desc(), "source")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    ranked = scored.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        "quality_ppm",
        "cap",
        "budget",
        F.row_number().over(w_ord).cast("bigint").alias("rnk"),
        F.coalesce(F.sum("cap").over(w_cum), F.lit(0)).alias("cum_before"),
    )
    return ranked.selectExpr(
        "source",
        "rnk",
        "quality_ppm",
        "toks AS tokens_available",
        "cap",
        "CAST(greatest(least(cap, budget - cum_before), 0) AS BIGINT)"
        " AS allocated",
        "least(cap, budget - cum_before) >= cap AS fully_taken",
    ).orderBy("rnk")
