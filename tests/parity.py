"""Local replica of the driver's DuckDB-oracle comparison.

The driver (CORRECTNESS_r{N}.json) compares each Spark query against its
oracle SQL by row count + schema + order-insensitive value hash with
columns sorted by name. This module reproduces that check locally so
parity failures are caught before a round ends.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from cdc_pubsub_spark.registry import REGISTRY, TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's pre-registration."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    """Canonical string form of one cell, tolerant of dtype differences
    (int32 vs int64, Decimal vs float, numpy vs python scalars)."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, _decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.4f}"
        return f"{v:.4f}"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every cell canonicalized, rows sorted."""
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(row[c]) for c in cols) for _, row in df[cols].iterrows()]
    return sorted(out)


def assert_parity(spark: SparkSession, name: str, sf_dir: str) -> None:
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} has no oracle (rows-only)"

    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    con = duck_connection(sf_dir)
    duck_pdf = con.sql(spec.oracle).df()
    con.close()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    # Kind-strict dtype check: the driver's comparator stringifies raw
    # cells, so a Spark BIGINT column paired with a DuckDB DOUBLE
    # oracle column ('167338' vs '167338.0') hash-fails at the driver
    # even when every value is numerically identical — Spark's
    # floor() returns BIGINT while DuckDB's returns DOUBLE, the exact
    # trap events_ab_cuped hit in the r12 extension session. Catch the
    # integer-vs-float kind split here instead of at the driver.
    for col in spark_pdf.columns:
        sk = spark_pdf[col].dtype.kind
        dk = duck_pdf[col].dtype.kind
        if {sk, dk} <= {"i", "u"} or sk == dk:
            continue
        # object columns (strings, lists) and empty frames are out of
        # scope; a float/int split on a numeric column is the bug.
        if {sk, dk} == {"f", "i"} or {sk, dk} == {"f", "u"}:
            raise AssertionError(
                f"{name}.{col}: dtype kind mismatch spark={sk} duck={dk}"
                " (int-vs-float stringifies differently at the driver;"
                " CAST the oracle or the Spark column)"
            )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rowcount mismatch spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )

    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (s, d) for s, d in zip(s_rows, d_rows) if s != d
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, duck): {diffs}"
        )
