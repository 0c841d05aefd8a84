"""Structured Streaming sessionization (streaming surface of the batch
operator in operators/windows.py).

The reference is fully batch (SURVEY.md §2.9); this is the engine's
streaming analog for the north-rule sessionization semantics: event-time
``session_window`` aggregation with a watermark for late data. The batch
and streaming results agree for gap/window semantics (tested with the
file source + availableNow trigger, which drains a static directory as a
stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_session_counts(
    spark: SparkSession,
    path: str,
    schema: StructType,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-(key, session-window) event counts.

    Watermark bounds state: sessions close once event time passes
    window end + watermark — the knob that keeps state finite on an
    unbounded stream (at 100 TB/day the watermark IS the memory budget).
    """
    events = spark.readStream.schema(schema).parquet(path)
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(sdf: DataFrame, name: str = "sessions") -> None:
    """Drain a bounded stream synchronously into an in-memory table (test
    helper; production would write to a real sink with checkpointing)."""
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_windowed_rollup(
    spark: SparkSession,
    path: str,
    schema: StructType,
    key: str = "user_id",
    ts: str = "ts",
    window: str = "1 day",
    watermark: str = "1 hour",
    value: str | None = None,
) -> DataFrame:
    """Streaming tumbling-window rollup (streaming face of the batch
    daily_rollup): per-(key, window) event counts and optional value sum.

    With append output mode a window only emits once the watermark passes
    its end — and events arriving LATER than the watermark are dropped,
    never retro-mutating an emitted window. That trade (bounded state +
    immutable emitted results vs. losing very-late data) is the streaming
    contract; the batch operator over the same files is the exact oracle
    for everything inside the watermark.
    """
    events = spark.readStream.schema(schema).parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(F.sum(value).alias("total_value"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.window(F.col(ts), window))
        .agg(*aggs)
        .select(
            key,
            F.col("window.start").alias("win_start"),
            "n_events",
            *(["total_value"] if value is not None else []),
        )
    )
