"""Structured Streaming surface of the engine.

The reference's crawl is an unbounded self-feeding stream (each parse yields
the next Request — ``Facebook_group_post.py:188-221``); our batch rounds are
its micro-batch form. This module is the continuous form for the metrics /
ingest paths that are genuinely streaming:

- ``windowed_fetch_metrics``: per-kind tumbling-window fetch counters with a
  watermark for late events (the A5 queue-length log re-expressed as a
  streaming aggregation; late data beyond the watermark is dropped exactly
  like the reference's append-only ``log.txt`` never rewrites history).
- ``stream_frontier_deltas``: readStream over a frontier delta directory
  (parquet files appear per round/snapshot) — the engine's own table layout
  doubles as a streaming source, so downstream consumers (dashboards,
  repair jobs) tail the crawl without touching the engine.
- ``foreach_batch_merge``: the canonical writeStream→foreachBatch pattern for
  merging discovered URLs into a keyed store; used with availableNow for
  catch-up runs.

All outputs are plain DataFrames/StreamingQueries; tests drive them with
``trigger(availableNow=True)`` and compare against the equivalent batch
aggregation (streaming-batch parity is the correctness oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_fetch_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per key with late-data watermark.

    Works identically on a batch or streaming DataFrame (same plan — that IS
    the parity test)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n",
            "sum_value",
        )
    )


def stream_frontier_deltas(spark: SparkSession, path: str, schema) -> DataFrame:
    """Tail a frontier delta directory as a stream (one file per snapshot)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def foreach_batch_merge(stream: DataFrame, merge_fn, checkpoint_dir: str, available_now: bool = True):
    """writeStream → foreachBatch(merge_fn(batch_df, batch_id)).

    ``availableNow`` processes everything currently on disk then stops —
    the catch-up/repair mode (reference T7: debug_empty_text re-crawl)."""
    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
