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
    """A later micro-batch delivers events that PREDATE the open session
    (still above the watermark): one within the gap must extend the
    session backward (session_start = min), one more than a gap earlier
    must become its own earlier session — matching the batch twin.
    Regression test for the extend-branch that never moved session_start
    (r3 ADVICE)."""
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
        (5, "2024-06-01 00:00:00", 1, "sentinel", 0.0),  # closes everything
    ]
    sentinel_ts = "2024-06-01 00:00:00"

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
        q.processAllAvailable()  # micro-batch 1: open session 10:00-10:10
        df_of(batch2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # micro-batch 2: out-of-order arrivals
        got = {
            (r["user_id"], str(r["session_start"]), str(r["session_end"])):
            r["n_events"]
            for r in spark.sql("SELECT * FROM sess_ooo").collect()
        }
    finally:
        q.stop()
    expected_batch = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"])):
        r["n_events"]
        for r in sessionize_batch(
            df_of(batch1 + batch2), gap_minutes=30
        ).collect()
        if str(r["session_start"]) != sentinel_ts  # still open in stream
    }
    assert got == expected_batch
    assert got == {
        (1, "2024-01-01 09:00:00", "2024-01-01 09:00:00"): 1,
        (1, "2024-01-01 09:55:00", "2024-01-01 10:10:00"): 3,
    }
    shutil.rmtree(ckpt, ignore_errors=True)


def test_sessionize_stream_stateful_equals_batch(spark, tmp_root):
    """applyInPandasWithState sessionizer vs the declarative batch twin.

    A far-future sentinel event per user forces every REAL session shut
    via the gap rule inside the stream (the sentinel's own still-open
    session is excluded from the comparison on both sides)."""
    from data_prep_opensearch_spark.streaming.events import sessionize_stream

    events = _events_df(spark)
    sentinel_ts = "2024-06-01 00:00:00"
    sentinels = (
        events.select("user_id").distinct()
        .withColumn("event_id", F.lit(-1))
        .withColumn("ts", F.lit(sentinel_ts).cast("timestamp"))
        .withColumn("event_type", F.lit("sentinel"))
        .withColumn("value", F.lit(0.0))
        .select(*events.columns)
    )
    all_events = events.unionByName(sentinels)
    src = os.path.join(tmp_root, "stream_sess_src")
    all_events.coalesce(1).write.mode("overwrite").parquet(src)

    batch = sessionize_batch(spark.read.parquet(src), gap_minutes=30)
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in batch.collect()
        if str(r["session_start"]) != sentinel_ts  # open sentinel session
    }

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
    import tempfile

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
        got = {
            (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sess_stream").collect()
        }
    finally:
        q.stop()
    assert got == expected
    shutil.rmtree(ckpt, ignore_errors=True)
