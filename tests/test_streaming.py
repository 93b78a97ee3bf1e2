"""Structured Streaming twin: the same rows through readStream produce the
same windowed rollup as the batch plan (late rows within the watermark
included)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from data_prep_opensearch_spark.streaming.events import (
    sessionize_batch,
    windowed_counts_batch,
    windowed_counts_stream,
)


def _events_df(spark):
    rows = []
    base = "2024-01-01 00:{m:02d}:{s:02d}"
    for i in range(500):
        m, s = (i * 7) % 60, (i * 13) % 60
        rows.append((i, base.format(m=m, s=s), i % 9, ["click", "view", "buy"][i % 3], float(i % 17)))
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "user_id", "event_type", "value"])
    return df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def test_stream_equals_batch(spark, tmp_root):
    events = _events_df(spark)
    src = os.path.join(tmp_root, "stream_src")
    events.write.mode("overwrite").parquet(src)

    batch = windowed_counts_batch(spark.read.parquet(src), minutes=10)
    expected = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
                for r in batch.collect()}

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = windowed_counts_stream(stream, minutes=10)
    ckpt = tempfile.mkdtemp(dir=tmp_root)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
               for r in spark.sql("SELECT * FROM win_counts").collect()}
    finally:
        q.stop()
    assert got == expected
    shutil.rmtree(ckpt, ignore_errors=True)


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 5, "click", 1.0),
        (2, "2024-01-01 00:10:00", 5, "click", 1.0),   # same session (10m gap)
        (3, "2024-01-01 01:00:00", 5, "click", 1.0),   # new session (50m gap)
        (4, "2024-01-01 00:00:00", 6, "view", 1.0),    # other user
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts_s", "user_id", "event_type", "value"])
    df = df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = {(r["user_id"], r["session_seq"]): r["n_events"]
           for r in sessionize_batch(df, gap_minutes=30).collect()}
    assert out == {(5, 1): 2, (5, 2): 1, (6, 1): 1}


def test_sessionize_stream_out_of_order_across_batches(spark, tmp_root):
    """Later micro-batches deliver events that PREDATE pending sessions
    (still above the watermark): one within the gap extends the open
    session backward, one more than a gap earlier opens its own earlier
    session — and that earlier session must stay PENDING (not emitted)
    until the watermark seals it, so a yet-later above-watermark event
    can still merge into it. Regression for two bugs: the extend-branch
    that never moved session_start (r3 ADVICE), and the premature
    emission of pre-open sessions without a watermark guard (r4
    review)."""
    import tempfile

    from data_prep_opensearch_spark.streaming.events import sessionize_stream

    cols = ["event_id", "ts_s", "user_id", "event_type", "value"]

    def df_of(rows):
        d = spark.createDataFrame(rows, cols)
        return d.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    batch1 = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:10:00", 1, "click", 1.0),
    ]
    batch2 = [
        (3, "2024-01-01 09:55:00", 1, "click", 1.0),  # backward-extends
        (4, "2024-01-01 09:00:00", 1, "click", 1.0),  # own earlier session
    ]
    batch3 = [
        # merges into the 09:00 session — only possible because it was
        # NOT prematurely emitted in batch 2
        (5, "2024-01-01 09:20:00", 1, "click", 1.0),
        (6, "2024-06-01 00:00:00", 1, "sentinel", 0.0),
    ]
    batch4 = [
        # advances the watermark past the real sessions' deadlines
        (7, "2024-06-02 00:00:00", 1, "sentinel", 0.0),
    ]
    sentinel_starts = {"2024-06-01 00:00:00", "2024-06-02 00:00:00"}

    src = os.path.join(tmp_root, "stream_ooo_src")
    df_of(batch1).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df_of(batch1).schema).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
    ckpt = tempfile.mkdtemp(dir=tmp_root)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_ooo")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        for batch in (batch2, batch3, batch4):
            df_of(batch).coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        got = {
            (r["user_id"], str(r["session_start"]), str(r["session_end"])):
            r["n_events"]
            for r in spark.sql("SELECT * FROM sess_ooo").collect()
            if str(r["session_start"]) not in sentinel_starts
        }
    finally:
        q.stop()
    expected_batch = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])):
        r["n_events"]
        for r in sessionize_batch(
            df_of(batch1 + batch2 + batch3 + batch4), gap_minutes=30
        ).collect()
        if str(r["session_start"]) not in sentinel_starts
    }
    assert got == expected_batch
    assert got == {
        (1, "2024-01-01 09:00:00", "2024-01-01 09:20:00"): 2,
        (1, "2024-01-01 09:55:00", "2024-01-01 10:10:00"): 3,
    }
    shutil.rmtree(ckpt, ignore_errors=True)


def test_sessionize_stream_stateful_equals_batch(spark, tmp_root):
    """applyInPandasWithState sessionizer vs the declarative batch twin.

    Sessions are emitted only once the WATERMARK seals them (end + gap
    below it), so a far-future sentinel per user advances the watermark
    in batch 1 and a second, later sentinel batch triggers the drain;
    the sentinels' own still-pending sessions are excluded from the
    comparison on both sides."""
    import tempfile

    from data_prep_opensearch_spark.streaming.events import sessionize_stream

    events = _events_df(spark)
    sentinel_ts = ["2024-06-01 00:00:00", "2024-06-02 00:00:00"]

    def sentinels_at(ts):
        return (
            events.select("user_id").distinct()
            .withColumn("event_id", F.lit(-1))
            .withColumn("ts", F.lit(ts).cast("timestamp"))
            .withColumn("event_type", F.lit("sentinel"))
            .withColumn("value", F.lit(0.0))
            .select(*events.columns)
        )

    batch1 = events.unionByName(sentinels_at(sentinel_ts[0]))
    batch2 = sentinels_at(sentinel_ts[1])
    src = os.path.join(tmp_root, "stream_sess_src")
    batch1.coalesce(1).write.mode("overwrite").parquet(src)

    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])):
        r["n_events"]
        for r in sessionize_batch(
            batch1.unionByName(batch2), gap_minutes=30
        ).collect()
        if str(r["session_start"]) not in sentinel_ts
    }

    stream = spark.readStream.schema(batch1.schema).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
    ckpt = tempfile.mkdtemp(dir=tmp_root)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            (r["user_id"], str(r["session_start"]), str(r["session_end"])):
            r["n_events"]
            for r in spark.sql("SELECT * FROM sess_stream").collect()
            if str(r["session_start"]) not in sentinel_ts
        }
    finally:
        q.stop()
    assert got == expected
    shutil.rmtree(ckpt, ignore_errors=True)
