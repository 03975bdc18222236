"""Oracle-differential tests: every SQL-oracled query in the registry is
hash-compared against DuckDB at sf0.01 — a local replica of the driver's
correctness gate."""

from __future__ import annotations

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY

from .parity import assert_parity

SQL_ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", SQL_ORACLED)
def test_oracle_parity(spark, sf_correct, name):
    assert_parity(spark, name, sf_correct)


def test_registry_is_fully_sql_oracled():
    """Since r11 (dedup_minhash_banded's portable-family graduation) the
    registry carries ZERO rows-only ops — every operator is hash-checked
    against DuckDB. Pin that state: a future op registered without an
    oracle is a deliberate contract regression and must either get one
    (portable-hash bridges make even LSH collision sets expressible —
    BANDED_PAIRS_SQL is the template) or consciously amend this pin AND
    re-add the rows-only smoke/coverage guards this test replaced."""
    assert ROWS_ONLY == [], (
        f"ops registered without a SQL oracle: {ROWS_ONLY} — "
        "the registry has been 100% SQL-oracled since r11"
    )
