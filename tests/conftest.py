"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest

import cdc_pubsub_spark.all_queries  # noqa: F401  (populate registry)
from cdc_pubsub_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"
ALL_SFS = (SF_SMOKE, SF_CORRECT, SF_BENCH)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdc-pubsub-spark-tests")
    yield s
    # Leave the session running: tearing down the JVM between pytest runs
    # costs more than it saves and Spark handles reuse via getOrCreate.


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT
