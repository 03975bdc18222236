"""Custom Python Data Source (Spark 4 DataSource API): a synthetic
changefeed source.

This is the idiomatic Spark-4 answer to "the reference is an ingest
server": instead of a bespoke HTTP daemon (reference server.go:45-103),
an engine-native source implements `DataSource`/`DataSourceReader`, gets
partitioned parallel reads, schema enforcement, and full Catalyst
integration for free, and is driven declaratively
(`spark.read.format("cdc_synthetic").option(...)`).

The source generates the deterministic changefeed row-stream as a pure
function of (n, partition) — the oracle reproduces it with a `range()`
relation, so even the custom source is hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from cdc_pubsub_spark.registry import register

_STATUSES = ("O", "F", "P")


def _row(i: int) -> tuple[int, str, float]:
    # Pure function of i; two-decimal prices are exact in binary after
    # /100.0 of an integer, so the oracle's arithmetic is bit-identical.
    return (i, _STATUSES[i % 3], (100000 + (i * 37) % 900000) / 100.0)


class ChangefeedDataSource(DataSource):
    """`format("cdc_synthetic")` — options: n (row count), parts."""

    @classmethod
    def name(cls) -> str:
        return "cdc_synthetic"

    def schema(self) -> str:
        return "key bigint, status string, price double"

    def reader(self, schema) -> "ChangefeedReader":
        return ChangefeedReader(
            int(self.options.get("n", 1000)), int(self.options.get("parts", 4))
        )


class ChangefeedReader(DataSourceReader):
    def __init__(self, n: int, parts: int) -> None:
        self.n = n
        self.parts = parts

    def partitions(self):
        # Contiguous key ranges — each Spark task reads one slice in
        # parallel, the property the reference's single accept-loop
        # thread never had.
        step = max(1, self.n // self.parts)
        bounds = list(range(1, self.n + 1, step)) + [self.n + 1]
        return [
            InputPartition((lo, hi)) for lo, hi in zip(bounds, bounds[1:])
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _row(i)


@register(
    "source_python_datasource",
    category="scans",
    bench=False,
    oracle="""
    SELECT
      CASE WHEN i % 3 = 0 THEN 'O' WHEN i % 3 = 1 THEN 'F' ELSE 'P' END AS status,
      count(*) AS n,
      round(sum((100000 + (i * 37) % 900000) / 100.0), 2) AS total_price
    FROM (SELECT unnest(range(1, 2001)) AS i)
    GROUP BY 1
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read 2000 rows from the custom Python data source, aggregated.

    Registration is idempotent per session; the read plans one task per
    InputPartition (4 here). The oracle regenerates the identical rows
    from a range() relation — a custom source whose output is still
    exactly verifiable.
    """
    try:
        spark.dataSource.register(ChangefeedDataSource)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("cdc_synthetic").option("n", 2000).option("parts", 4).load()
    return df.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("price"), 2).alias("total_price"),
    )
