"""Deterministic dup-planted corpora for the dedup operators.

The driver's `documents`/`embeddings` tables contain no duplicates, so —
exactly like the CDC fixtures (FIXTURES.md §3) — each dedup operator
synthesizes its corpus as a pure function of the source table: planted
exact copies (doc_id+1_000_000, same text) and near copies
(doc_id+2_000_000, three words appended). The identical CTE runs in the
DuckDB oracle, so dedup results stay hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pubsub_spark.tables import load

# Appended to near-dup copies: shrinks Jaccard to ~0.9 on a ~60-word doc.
NEAR_SUFFIX = " zq extra tail"

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
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


def shingle_array(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Per-doc word n-gram shingle array: (doc_id, grams array<string>).

    Built entirely inside codegen (transform over sequence) — one narrow
    map pass, no explode, no shuffle. Docs shorter than n words are
    dropped (guard against Spark's descending `sequence`).
    """
    words = F.split(F.col("text"), " ")
    grams = F.expr(
        f"transform(sequence(0, size(split(text, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i + 1, {n})))"
    )
    return corpus.filter(F.size(words) >= n).select(
        "doc_id", grams.alias("grams")
    )


def shingles(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle) rows."""
    return (
        shingle_array(corpus, n)
        .select("doc_id", F.explode("grams").alias("shingle"))
        .distinct()
    )


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
