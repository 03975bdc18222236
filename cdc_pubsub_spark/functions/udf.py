"""UDF / UDAF / UDTF surface (SURVEY.md §2.B).

UDFs are the slow path — every operator here exists to prove the
extension mechanism, with docstrings stating the scale rules:

- plain `@udf` = row-at-a-time Python, ~100x slower than builtins; only
  for logic that genuinely can't be expressed otherwise (here: HLC string
  decode, which *could* be builtin — the arithmetic oracle proves it).
- `pandas_udf` = Arrow-vectorized, the acceptable Python path.
- `applyInPandas` = grouped map, the custom-operator workhorse (llmops
  and streaming build on it).
- UDTF-shaped expansion is done with explode (JVM Generate node) — the
  same 1-row→N-rows shape as the reference's NDJSON line split
  (publisher.go:182-202) without leaving codegen.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_pubsub_spark.registry import register
from cdc_pubsub_spark.sources.cdc import _HLC_SQL, _hlc33
from cdc_pubsub_spark.tables import load


@register(
    "udf_python_scalar",
    category="udf",
    oracle=rf"""
    WITH hlc AS (
      SELECT o_orderkey, {_HLC_SQL.format(v=0)} AS updated
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT
      o_orderkey,
      CAST(updated AS BIGINT) // 1000000 AS wall_ms,
      CAST(updated AS BIGINT) % 1000000  AS logical_part
    FROM hlc
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain Python @udf decoding the 33-digit HLC into (wall_ms, logical).

    Row-at-a-time Python: each value crosses JVM→Python pickled. Kept
    deliberately tiny (2k rows) — the arithmetic oracle shows the same
    result is expressible as builtins, which is the point: plain UDFs are
    the last resort (SURVEY.md §4.2).
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    hlc = orders.select("o_orderkey", _hlc33(0).alias("updated"))

    @F.udf(returnType=T.LongType())
    def wall_ms(updated: str) -> int:
        return int(updated) // 1_000_000

    @F.udf(returnType=T.LongType())
    def logical_part(updated: str) -> int:
        return int(updated) % 1_000_000

    return hlc.select(
        "o_orderkey",
        wall_ms("updated").alias("wall_ms"),
        logical_part("updated").alias("logical_part"),
    )


@register(
    "udf_pandas_scalar",
    category="udf",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS disc_price_v
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF computing the discounted price.

    Series→Series over Arrow batches: one (de)serialization per batch of
    ~10k rows instead of per row. numpy's floor formula matches the
    engines' IEEE sequence exactly (rounding.py).
    """
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return np.floor(price * (1 - discount) * 100 + 0.5) / 100

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price_v"),
    )


@register(
    "udf_pandas_grouped_agg",
    category="udf",
    oracle="""
    SELECT
      l_returnflag,
      round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price per flag.

    GROUPED_AGG ships each group's columns as Arrow arrays to one Python
    call — no per-row overhead, but unlike builtin aggs there is no
    map-side partial aggregation, so the whole group shuffles. At 100 TB
    prefer the equivalent builtin expression (the oracle shows it).
    """

    @F.pandas_udf(T.DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float(round((price * qty).sum() / qty.sum(), 2))

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@register(
    "udf_grouped_map",
    category="udf",
    oracle="""
    SELECT
      event_id,
      round((value - avg(value) OVER (PARTITION BY event_type))
            / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS value_z
    FROM events
    WHERE user_id <= 50
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group z-score normalization.

    The grouped-map mechanism behind every custom operator the builtins
    can't express (llmops uses it for ANN search). Each group becomes one
    pandas DataFrame in Python; output schema is declared up front.
    pandas ddof=1 std matches stddev_samp.
    """

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std()
        return pd.DataFrame({"event_id": pdf["event_id"], "value_z": z.round(4)})

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id bigint, value_z double"
    )


@register(
    "udf_broadcast_lookup",
    category="udf",
    oracle="""
    SELECT c_custkey, n_name AS nation_name, round(c_acctbal, 2) AS acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 1000
    """,
)
def udf_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim lookup inside a pandas UDF via an explicit broadcast variable.

    The guide's closure pitfall done right: a driver-side dict captured
    naively re-pickles per task; `sparkContext.broadcast` ships it once
    per executor. The pattern matters when Python code (tokenizer vocab,
    label maps, stopword tables) needs side data — the oracle shows the
    relational equivalent (a broadcast join), which is ALWAYS preferred
    when the lookup is expressible as a join; this exists for when it
    isn't.
    """
    nation_map = {
        r["n_nationkey"]: r["n_name"]
        for r in load(spark, sf_dir, "nation").collect()
    }
    bc = spark.sparkContext.broadcast(nation_map)

    @F.pandas_udf(T.StringType())
    def lookup_nation(keys: pd.Series) -> pd.Series:
        m = bc.value  # one deserialization per executor, not per task
        return keys.map(m)

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    return cust.select(
        "c_custkey",
        lookup_nation("c_nationkey").alias("nation_name"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@register(
    "udtf_python_real",
    category="udf",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' '))                              AS token,
           unnest(range(1, len(string_split(text, ' ')) + 1))           AS idx
    FROM documents
    WHERE doc_id <= 50
    """,
)
def udtf_python_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine Python UDTF (Spark 4 `@udtf`): one doc row → one row per
    token with its 1-based position.

    The UDTF mechanism is the extension point for row-expanding logic a
    SQL generator can't express (stateful parsers, tokenizers with
    carry-over). Invoked via SQL LATERAL join — the only way to feed it
    per-row columns. Per-row Python: kept to 50 docs; `udtf_explode_like`
    shows the JVM path for expansion that IS expressible.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, idx int")
    class SplitWords:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield tok, i + 1

    spark.udtf.register("split_words", SplitWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.idx
        FROM documents_udtf d, LATERAL split_words(d.text) t
        WHERE d.doc_id <= 50
        """
    )


@register(
    "udtf_explode_like",
    category="udf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id <= 100
    """,
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row → N rows token expansion (UDTF shape) via explode.

    This is exactly the reference's record split: one HTTP body → one row
    per NDJSON line (bufio.Scanner loop, publisher.go:182-202). Spark's
    Generate node does the expansion inside codegen; a Python UDTF could
    express the same but would leave the JVM for no semantic gain — and
    unlike bufio's 64 KiB default token cap (which silently truncates,
    SURVEY.md §2.A5) there is no line-length limit here.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
