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


SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT"
)
SESSION_STATE_SCHEMA = "start_us BIGINT, end_us BIGINT, n BIGINT"


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """TRUE stateful streaming sessionization via
    ``applyInPandasWithState`` (the custom-stateful-operator capability
    the task brief names; ``sessionize_batch`` stays the declarative
    twin the oracle checks).

    Per-user state = the one OPEN session (start_us, end_us, n).
    Each micro-batch merges the open session with the batch's events as
    INTERVALS sorted by start time — so a cross-batch out-of-order event
    (still above the watermark) that predates the open session's start
    extends it BACKWARD (session_start = min), and one that predates it
    by more than the gap becomes its own earlier session, exactly as the
    batch twin would order them. A gap > threshold closes a session (row
    emitted); an event-time timeout set past the open session's
    ``end + gap`` emits it once the watermark proves no in-order event
    can extend it — so every session is emitted exactly once, closed
    rows never mutate, and state stays O(1) per active user. (Residual
    stream-vs-batch divergence requires an out-of-order event for a
    session that was already EMITTED — impossible above the watermark.)"""
    import pandas as pd  # noqa: F401 (worker-side)

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        rows = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                out.append((key[0], s, e, n))
                state.remove()
        else:
            # pandas datetime64[ns] -> int64 ns; convert to us
            ts_us = [t // 1000 for t in rows["ts"].astype("int64").tolist()]
            # the open session participates as one (start, end, n)
            # interval among the batch's single-event intervals; sorting
            # by start reproduces the batch twin's event-time order
            items = [(t, t, 1) for t in ts_us]
            if state.exists:
                items.append(tuple(state.get))
            items.sort()
            cur = None
            for s, e, n in items:
                if cur is None:
                    cur = [s, e, n]
                elif s - cur[1] > gap_us:
                    out.append((key[0], cur[0], cur[1], cur[2]))
                    cur = [s, e, n]
                else:
                    cur[1] = max(cur[1], e)
                    cur[2] += n
            if cur is not None:
                state.update(tuple(cur))
                # emit once the watermark passes end + gap: nothing
                # in-order can extend the session after that
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime(
                        [o[1] for o in out], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [o[2] for o in out], unit="us"
                    ),
                    "n_events": [o[3] for o in out],
                }
            )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            "EventTimeTimeout",
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
