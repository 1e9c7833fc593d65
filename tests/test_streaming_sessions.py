"""Streaming sessionization: static-plan parity with the batch
sessionize/session_stats pair, then a real micro-batched stream whose
closed sessions must equal the batch answer exactly."""

import os

from pyspark.sql import functions as F

from baselinr_spark.operators.temporal import session_stats, sessionize
from baselinr_spark.streaming.session_stream import (
    session_window_stats,
    start_session_stream,
)

SCHEMA = "k string, ts timestamp"


def _events(spark):
    rows = [
        ("u1", "2024-01-01 00:00:00"), ("u1", "2024-01-01 00:10:00"),
        ("u1", "2024-01-01 00:40:00"),   # exact 30m gap: same session
        ("u1", "2024-01-01 02:00:00"),   # new session
        ("u2", "2024-01-01 00:05:00"), ("u2", "2024-01-01 03:00:00"),
    ]
    return spark.createDataFrame(rows, "k string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _batch_key(df):
    return sorted(
        (r["k"], r["start_s"], r["n_events"], r["duration_s"])
        for r in df.collect()
    )


def test_static_parity_with_batch_operator(spark):
    ev = _events(spark)
    batch = session_stats(sessionize(ev, "k", "ts", gap=1800.0), "k", "ts")
    stream_plan = session_window_stats(ev, "k", "ts", gap="30 minutes")
    assert _batch_key(batch) == _batch_key(
        stream_plan.select("k", "start_s", "n_events", "duration_s")
    )


def test_streaming_sessions_match_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_root = str(tmp_path / "out")
    ev = _events(spark)
    # three arrival files: early, late, then a far-future flush batch
    # that pushes the watermark past every real session's close
    ev.filter("ts < '2024-01-01 01:00:00'").coalesce(1).write.parquet(
        in_dir, mode="append")
    ev.filter("ts >= '2024-01-01 01:00:00'").coalesce(1).write.parquet(
        in_dir, mode="append")
    flush = spark.createDataFrame(
        [("__flush__", "2024-02-01 00:00:00")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.coalesce(1).write.parquet(in_dir, mode="append")

    q = start_session_stream(
        spark, in_dir, out_root, "k", "ts", SCHEMA,
        gap="30 minutes", watermark="1 minute", max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(os.path.join(out_root, "stream_sessions")).filter(
        F.col("k") != "__flush__"
    )
    batch = session_stats(sessionize(ev, "k", "ts", gap=1800.0), "k", "ts")
    assert _batch_key(got.select("k", "start_s", "n_events", "duration_s")) \
        == _batch_key(batch)


def test_streaming_restart_is_exactly_once(spark, tmp_path):
    """Re-running the stream over the same checkpoint emits nothing new."""
    in_dir = str(tmp_path / "in")
    out_root = str(tmp_path / "out")
    ev = _events(spark)
    ev.coalesce(1).write.parquet(in_dir, mode="append")
    flush = spark.createDataFrame(
        [("__flush__", "2024-02-01 00:00:00")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    flush.coalesce(1).write.parquet(in_dir, mode="append")

    q = start_session_stream(spark, in_dir, out_root, "k", "ts", SCHEMA,
                             gap="30 minutes", watermark="1 minute")
    q.awaitTermination(120)
    first = spark.read.parquet(
        os.path.join(out_root, "stream_sessions")).count()

    q2 = start_session_stream(spark, in_dir, out_root, "k", "ts", SCHEMA,
                              gap="30 minutes", watermark="1 minute")
    q2.awaitTermination(120)
    second = spark.read.parquet(
        os.path.join(out_root, "stream_sessions")).count()
    assert first == second
