"""Structured Streaming operators over the events stream.

The reference is batch-only; its incremental machinery maps to batch
MERGE (SURVEY.md §2.10). These operators exist for the capability the
north star's pipeline needs at ingest time: windowed rollups with
late-data handling. Each has a BATCH twin with identical semantics so
the DuckDB oracle can check the math; the streaming test feeds the same
rows through a stream and asserts equal results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts_batch(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window per-type rollup: count + sum(value). Batch twin."""
    win = F.window(F.col("ts"), f"{minutes} minutes")
    return (
        events.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def windowed_counts_stream(events_stream: DataFrame, minutes: int = 60,
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming twin: same rollup with an event-time watermark so state
    for closed windows is dropped (bounded state at unbounded input)."""
    win = F.window(F.col("ts"), f"{minutes} minutes")
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user (batch formulation): session
    starts where the gap from the previous event exceeds the threshold;
    session_id = cumulative count of starts — a window-function plan, no
    UDF, shuffle = one hash partition by user."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # exact integer microseconds (unix_micros) — second-truncating casts
    # disagree with the SQL oracle at sub-second gap boundaries
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    starts = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sess = events.withColumn("_start", starts).withColumn(
        "session_seq", F.sum("_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
