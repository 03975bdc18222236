"""Import every operator module so the registry is fully populated.

``import cdc_pubsub_spark.all_queries`` is the one-liner that brings the
whole declared surface (SURVEY.md §2.B) into :data:`~cdc_pubsub_spark.registry.REGISTRY`.
"""

from __future__ import annotations

import importlib

_MODULES = [
    "cdc_pubsub_spark.operators.aggregates",
    "cdc_pubsub_spark.operators.scans",
    "cdc_pubsub_spark.operators.filters",
    "cdc_pubsub_spark.operators.joins",
    "cdc_pubsub_spark.operators.composite",
    "cdc_pubsub_spark.operators.tpch_more",
    "cdc_pubsub_spark.operators.partsupp",
    "cdc_pubsub_spark.operators.windows",
    "cdc_pubsub_spark.operators.sorts",
    "cdc_pubsub_spark.operators.setops",
    "cdc_pubsub_spark.operators.advanced",
    "cdc_pubsub_spark.operators.modern",
    "cdc_pubsub_spark.operators.graph",
    "cdc_pubsub_spark.functions.scalar",
    "cdc_pubsub_spark.functions.udf",
    "cdc_pubsub_spark.sources.cdc",
    "cdc_pubsub_spark.sources.formats",
    "cdc_pubsub_spark.sources.lakehouse",
    "cdc_pubsub_spark.sources.python_ds",
    "cdc_pubsub_spark.llmops.corpus",
    "cdc_pubsub_spark.llmops.dedup",
    "cdc_pubsub_spark.llmops.similarity",
    "cdc_pubsub_spark.llmops.text",
    "cdc_pubsub_spark.llmops.multimodal",
    "cdc_pubsub_spark.llmops.ml",
    "cdc_pubsub_spark.streaming.ops",
]

for _m in _MODULES:
    importlib.import_module(_m)

from cdc_pubsub_spark.registry import REGISTRY  # noqa: E402,F401
