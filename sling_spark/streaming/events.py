"""Streaming event analytics: tumbling windows, session windows,
stateful dedup — the Structured Streaming face of the batch operators.

Reference context: SLING is batch-first; its incremental path is
epoch-versioned records with last-writer-wins (sling/db/dbprotocol.h:
27-147, serial ordering task/sorter.cc:37-56). We map that to Structured
Streaming: event-time windows + watermarks for bounded state,
dropDuplicates for idempotent replay, availableNow triggers for batch
parity testing. At production scale these run against Kafka/file sources
with checkpointLocation providing exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time tumbling aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (native session_window: state-backed,
    watermark-bounded — the streaming twin of the batch lag/cumsum
    sessionizer in contract.q_events_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("session_start"),
            F.col("w.end").cast("long").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event dedup on event_id within the watermark horizon
    (idempotent replay — the serial/LWW analog).

    dropDuplicatesWithinWatermark, NOT dropDuplicates: with a subset
    that excludes the event-time column, plain dropDuplicates never
    evicts its state (every event_id ever seen is pinned forever);
    the WithinWatermark variant expires state at the horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint: str, output_mode: str = "append"
):
    """Drain all available input in one run (batch-parity testing path)
    into an in-memory sink; returns the finished StreamingQuery."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
