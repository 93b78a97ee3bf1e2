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
# CHECKPOINT COMPATIBILITY (round-4 review): v2 widened the per-user
# state from one scalar open session (start_us, end_us, n) to parallel
# arrays of ALL pending sessions. applyInPandasWithState persists state
# rows with the schema below, so a streaming query RESTARTED from a
# pre-v2 checkpoint would misread its state rows (Spark's state-store
# schema check rejects the mismatch where enabled; where not, three
# scalars would deserialize as garbage arrays). There is no legacy-state
# converter: a v1->v2 upgrade requires a NEW checkpoint directory (the
# source is replayable parquet in every deployment shape this engine
# supports, so a fresh checkpoint re-derives identical sessions).
SESSION_STATE_VERSION = 2
SESSION_STATE_SCHEMA = (
    "starts ARRAY<BIGINT>, ends ARRAY<BIGINT>, ns ARRAY<BIGINT>"
)


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """TRUE stateful streaming sessionization via
    ``applyInPandasWithState`` (the custom-stateful-operator capability
    the task brief names; ``sessionize_batch`` stays the declarative
    twin the oracle checks).

    Per-user state = ALL not-yet-final sessions (parallel start/end/n
    arrays — in steady state one open session, briefly more when
    out-of-order arrivals open earlier sessions). Each micro-batch
    merges the pending sessions with the batch's events as INTERVALS
    sorted by start, exactly as the batch twin orders them: an
    above-watermark event that predates a pending session's start
    extends it backward, one more than a gap earlier becomes its own
    session, and one that bridges two pending sessions merges them.

    A session is EMITTED only once ``end + gap < watermark`` — the
    watermark proves no admissible future event can touch it (an
    event-time timeout re-drains when the watermark passes the earliest
    pending deadline). That guard is what makes emission exactly-once
    and batch-consistent: a previously-emitted session can never need
    extension, because any future event is ≥ the watermark that sealed
    it. State stays O(pending sessions) per active user, bounded by the
    watermark delay / gap."""
    import pandas as pd  # noqa: F401 (worker-side)

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        def drain(pending):
            """Split pending sessions into (final -> out, still-pending)
            by the CURRENT watermark; final = end + gap below it."""
            wm_us = state.getCurrentWatermarkMs() * 1000
            keep = []
            for s, e, n in pending:
                if e + gap_us < wm_us:
                    out.append((key[0], s, e, n))
                else:
                    keep.append((s, e, n))
            return keep

        def park(pending):
            if pending:
                state.update((
                    [p[0] for p in pending],
                    [p[1] for p in pending],
                    [p[2] for p in pending],
                ))
                # wake when the watermark passes the EARLIEST deadline
                # (sessions are disjoint, so starts order == ends order)
                state.setTimeoutTimestamp((pending[0][1] + gap_us) // 1000 + 1)
            elif state.exists:
                state.remove()

        out = []
        if state.hasTimedOut:
            pending = list(zip(*state.get)) if state.exists else []
            park(drain(pending))
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            # pandas datetime64[ns] -> int64 ns; convert to us
            ts_us = [t // 1000 for t in rows["ts"].astype("int64").tolist()]
            items = [(t, t, 1) for t in ts_us]
            if state.exists:
                items.extend(zip(*state.get))
            items.sort()
            merged = []
            for s, e, n in items:
                if merged and s - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], e)
                    merged[-1][2] += n
                else:
                    merged.append([s, e, n])
            park(drain([tuple(m) for m in merged]))
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
