"""Query registry: the single source of truth for the engine's operator surface.

Every operator from SURVEY.md §2.B registers here as a :class:`QuerySpec`:
a named PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__.py``
exposes the registry to the driver; ``bench.py`` and the pytest parity
harness iterate it.

Determinism contract (SURVEY.md §2.B preamble): every floating aggregate is
rounded to 2 decimals, every LIMIT is total-ordered on a unique key, and
column names are aliased identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Tables pre-registered as DuckDB views by the driver (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    category: str = ""
    bench: bool = True  # include in bench.py headline set
    doc: str = field(default="", repr=False)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    category: str = "",
    bench: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query/operator implementation.

    ``oracle`` is ANSI SQL that DuckDB runs against the same parquet tables;
    omit it only for genuinely non-SQL-expressible ops (streaming, approx).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
