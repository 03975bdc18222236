"""cdc_pubsub_spark — a PySpark-native analytics engine.

A from-scratch Spark engine with the data-processing capabilities of the
reference CDC→Pub/Sub bridge (bobvawter/cdc-pubsub) generalized to a full
analytics surface: relational operators, CDC envelope/routing semantics,
structured streaming, and LLM-data-pipeline operators (dedup, similarity
search, text analysis) — all expressed Spark-first (DataFrame/SQL/Catalyst),
designed for 100 TB scale, and verified against a DuckDB oracle.

Import side effect: importing :mod:`cdc_pubsub_spark.all_queries` populates
the query registry used by ``__spark_entry__.py``.
"""

from cdc_pubsub_spark.registry import REGISTRY, QuerySpec, register  # noqa: F401

__version__ = "0.1.0"
