"""Text-analysis operators: token stats, language heuristics, quality
scoring, fingerprinting (SURVEY.md §2.B north-star).

Everything stays in JVM higher-order functions (split/filter/aggregate)
— tokenization of 100 TB of text must not cross into Python. The only
shuffle in each op is the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.tables import load

# Tiny function-word set used by the quality/lang-id heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = " OR ".join(f"w = '{s}'" for s in STOPWORDS)


@register(
    "text_token_counts",
    category="text",
    oracle="""
    WITH tokens AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS n FROM tokens GROUP BY token
    )
    SELECT token, n
    FROM counts
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 token frequencies (whitespace tokenization).

    explode + hash-agg with map-side combine: the shuffle carries one row
    per (partition, distinct token), not per token occurrence — vocabulary-
    sized, not corpus-sized. Top-k via TakeOrdered.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "text_token_bpe_regex",
    category="text",
    oracle="""
    WITH tokens AS (
      SELECT unnest(regexp_extract_all(text, ' ?[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS token
      FROM documents WHERE doc_id <= 2000
    )
    SELECT token, count(*) AS n
    FROM tokens
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_token_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style regex pre-tokenization (GPT-2-shaped pattern, RE2-safe).

    The ` ?[a-z]+` alternative keeps the leading space attached to each
    word — the BPE convention that makes token counts match a trained
    tokenizer's pre-tokenization pass. regexp_extract_all runs in
    codegen; counting a 100 TB corpus's token histogram is one explode +
    vocab-sized hash aggregate (same shuffle shape as text_token_counts).
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 2000)
    toks = F.regexp_extract_all(
        "text", F.lit(" ?[a-z]+|[0-9]+|[^a-z0-9 ]+"), 0
    )
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "text_lang_stats",
    category="text",
    oracle="""
    SELECT
      lang,
      CAST(n_chars // 100 AS BIGINT)  AS len_bucket,
      count(*)                        AS n_docs,
      round(avg(n_chars), 2)          AS avg_chars
    FROM documents
    GROUP BY lang, len_bucket
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document counts and length histogram (100-char buckets)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("len_bucket", F.floor(F.col("n_chars") / 100).cast("bigint"))
        .groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


@register(
    "text_quality_score",
    category="text",
    oracle=f"""
    WITH feats AS (
      SELECT
        doc_id,
        len(string_split(text, ' '))                                       AS n_tokens,
        len(list_filter(string_split(text, ' '), w -> {_STOP_SQL}))        AS n_stop
      FROM documents WHERE doc_id <= 2000
    )
    SELECT
      doc_id,
      n_tokens,
      round(CAST(n_stop AS DOUBLE) / n_tokens, 4)             AS stopword_ratio,
      round(0.5 * least(n_tokens / 100.0, 1.0)
            + 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens), 4)   AS quality_score
    FROM feats
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation + stopword ratio.

    The C4/Gopher-style cheap quality gate: all features from one
    split() per doc, no shuffle at all (narrow map) — the filter stage
    you run before anything expensive in a training pipeline.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 2000)
    words = F.split("text", " ")
    is_stop = lambda w: w.isin(*STOPWORDS)  # noqa: E731
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, is_stop))
    ratio = n_stop.cast("double") / n_tokens
    score = 0.5 * F.least(n_tokens / F.lit(100.0), F.lit(1.0)) + 0.5 * ratio
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


@register(
    "text_lang_id",
    category="text",
    oracle=f"""
    WITH feats AS (
      SELECT
        doc_id,
        lang,
        CAST(len(list_filter(string_split(text, ' '), w -> {_STOP_SQL})) AS DOUBLE)
          / len(string_split(text, ' ')) AS stop_ratio
      FROM documents WHERE doc_id <= 2000
    )
    SELECT
      doc_id,
      lang                                            AS labeled_lang,
      CASE WHEN stop_ratio > 0.05 THEN 'en' ELSE 'other' END AS detected_lang,
      round(stop_ratio, 4)                            AS stop_ratio
    FROM feats
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-ratio language ID (n-gram heuristic, binary en/other).

    The mechanism — score text against per-language marker-token sets,
    argmax wins — shown with a single English marker set; production adds
    one `size(filter(...))` column per language, still one map pass.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 2000)
    words = F.split("text", " ")
    ratio = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast(
        "double"
    ) / F.size(words)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(ratio > 0.05, "en").otherwise("other").alias("detected_lang"),
        F.round(ratio, 4).alias("stop_ratio"),
    )


@register(
    "text_fingerprint",
    category="text",
    oracle="""
    SELECT
      doc_id,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(text, ' '),
                         w -> CAST(length(w) * 17 + unicode(w) AS BIGINT))),
        (acc, v) -> (acc * 31 + v) % 1000000007
      ) AS fingerprint
    FROM documents
    WHERE doc_id <= 2000
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (mod 1e9+7).

    fold(acc·31 + wordval) over the token stream — order-sensitive (unlike
    md5-of-text it changes when words move), integer-only, and computable
    incrementally over a stream of appends. wordval = 17·len(w) +
    codepoint(w[0]), chosen to be reproducible in any engine.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 2000)
    wordvals = F.transform(
        F.split("text", " "),
        lambda w: (F.length(w) * 17 + F.ascii(w)).cast("bigint"),
    )
    fp = F.aggregate(
        wordvals,
        F.lit(0).cast("bigint"),
        lambda acc, v: (acc * 31 + v) % 1000000007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_normalize",
    category="text",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               '  +', ' ', 'g')) AS norm_text
      FROM documents
      WHERE doc_id <= 500
    )
    SELECT doc_id,
           md5(norm_text) AS norm_md5,
           length(norm_text) AS norm_len,
           CASE WHEN norm_text = '' THEN 0
                ELSE length(norm_text) - length(replace(norm_text, ' ', '')) + 1
           END AS n_tokens
    FROM norm
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase → strip non-alphanumerics
    → collapse runs of spaces → trim.

    The first stage of every dedup/quality pipeline (dedup_exact,
    dedup_near, and the fingerprints all assume a canonical form).
    Pure JVM string kernels — whole-stage-codegen'd, zero shuffle, scales
    as a map over the corpus. The md5 of the normalized text is returned
    so the oracle comparison proves BYTE-EXACT agreement on the full
    normalized string, not just its statistics (an engine-portability
    guarantee: a corpus normalized half on this engine, half on another,
    dedups correctly).
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 500)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            "  +",
            " ",
        )
    )
    toks = F.when(F.col("norm_text") == "", 0).otherwise(
        F.length("norm_text")
        - F.length(F.regexp_replace(F.col("norm_text"), " ", ""))
        + 1
    )
    return docs.select("doc_id", norm.alias("norm_text")).select(
        "doc_id",
        F.md5("norm_text").alias("norm_md5"),
        F.length("norm_text").alias("norm_len"),
        toks.cast("int").alias("n_tokens"),
    )
