"""Observability taps (SURVEY.md §2.A14): the engine's equivalents of the
reference's pprof endpoints and per-publish log lines are `observe()`
metrics (batch) and StreamingQueryListener progress (streaming)."""

from __future__ import annotations

import os

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

import cdc_pubsub_spark.all_queries  # noqa: F401
from cdc_pubsub_spark.registry import REGISTRY
from cdc_pubsub_spark.tables import load


def test_batch_observe_metrics(spark, sf_dir):
    """observe() rides along the flagship scan — per-query row/byte
    counters with zero extra passes (the analogue of the reference's
    per-publish log line, publisher.go:206-208)."""
    obs = Observation("flagship_metrics")
    li = load(spark, sf_dir, "lineitem")
    df = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_total"),
    ).groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    df.collect()
    metrics = obs.get
    assert metrics["rows_scanned"] == li.count()
    assert metrics["price_total"] > 0


def test_streaming_listener_progress(spark, sf_dir):
    """StreamingQueryListener receives per-batch progress — rows/sec,
    batch ids, watermark — the healthz/pprof surface of a stream."""
    from cdc_pubsub_spark.streaming.harness import (
        BASE,
        read_event_stream,
        write_events_ndjson,
    )

    seen: list[tuple[int, int]] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            seen.append((event.progress.batchId, event.progress.numInputRows))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        input_dir = write_events_ndjson(spark, sf_dir, "observability")
        stream = read_event_stream(spark, input_dir)
        q = (
            stream.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName("obs_sink")
            .option(
                "checkpointLocation",
                os.path.join(BASE, "observability/ck_obs"),
            )
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Listener delivery is async; allow it to drain.
        deadline = time.time() + 10
        while not seen and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert seen, "listener must receive progress events"
    total_rows = sum(n for _, n in seen)
    assert total_rows == load(spark, sf_dir, "events").count()
