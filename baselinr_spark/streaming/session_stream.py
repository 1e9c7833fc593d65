"""Streaming sessionization — the continuous twin of the batch
`operators/temporal.py:sessionize/session_stats` pair, built on
Spark's native ``session_window`` aggregation (gap-based dynamic
windows with watermarked state eviction).

Semantics note (why this is the twin, not a re-implementation): the
batch operator assigns ROW-LEVEL session ids over a complete history;
the streaming aggregation maintains OPEN sessions as state and emits a
session's aggregate row once the watermark passes its close (start of
a gap longer than ``gap``). For any event set fully inside the
processed horizon the (key, session start, n_events, duration)
aggregates agree exactly — asserted against `session_stats` in
tests/test_streaming_sessions.py — because both define a session
break as (time since previous event) > gap with the boundary gap
staying in-session.

State size is O(open sessions), i.e. active entities within the
watermark horizon — bounded by arrival rate × (gap + watermark), not
by history; that is what makes continuous sessionization viable on an
unbounded event stream where the batch operator would need the full
log every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["start_session_stream", "session_window_stats"]


def session_window_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
) -> DataFrame:
    """The shared aggregation plan: per (key, session_window) event
    count, start/end epoch seconds and duration. Works on a static OR
    streaming frame — the parity test runs it both ways; the streaming
    path adds a watermark before calling this."""
    win = F.session_window(F.col(ts_col), gap)
    ep = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    return (
        events.groupBy(F.col(key_col), win)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ep(F.col(ts_col))).alias("start_s"),
            F.max(ep(F.col(ts_col))).alias("end_s"),
            (F.max(ep(F.col(ts_col))) - F.min(ep(F.col(ts_col))))
            .alias("duration_s"),
        )
        .select(
            key_col,
            ep(F.col("session_window.start")).alias("window_start_s"),
            "n_events", "start_s", "end_s", "duration_s",
        )
    )


def start_session_stream(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    key_col: str,
    ts_col: str,
    schema: str,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Continuously sessionize a parquet event stream; closed sessions
    append to ``<output_root>/stream_sessions`` exactly once (session
    state emits only after the watermark passes the session close, so
    a session row is final when written — no upsert needed)."""
    import os

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
        .withWatermark(ts_col, watermark)
    )
    out = session_window_stats(stream, key_col, ts_col, gap=gap)
    writer = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(output_root, "stream_sessions"))
        .option("checkpointLocation",
                os.path.join(output_root, "_session_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
