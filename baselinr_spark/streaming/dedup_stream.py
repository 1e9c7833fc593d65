"""Streaming-native operators: watermarked dedup and stateful counters.

The reference is batch-only (SURVEY.md §2.16), so like
``filter_stream.py`` these are additive Spark-native capabilities for
a continuously-arriving corpus — the two canonical stateful patterns a
web-scale ingest needs:

1. **Exactly-once URL dedup across micro-batches**
   (``start_streaming_dedup``): ``withWatermark`` +
   ``dropDuplicatesWithinWatermark`` keeps per-key state only within
   the watermark horizon, so state size is bounded by (arrival rate ×
   watermark) instead of growing with the full corpus — the property
   that makes streaming dedup viable at 100 TB/day. A re-crawled URL
   arriving within the horizon is dropped; one arriving later is a
   legitimate re-snapshot and passes. (Spark evicts expired keys in the
   state-cleanup phase at the END of a micro-batch, so a re-snapshot is
   guaranteed to pass once any batch has completed with the watermark
   past the first sighting's expiry — eviction lags the watermark by
   one micro-batch.)

2. **Custom stateful aggregation** (``start_running_totals``):
   ``applyInPandasWithState`` with per-group ``GroupState`` — the
   Spark analogue of a custom stateful operator. Maintains cumulative
   (docs, kept) per partition key across micro-batches and emits the
   running totals each batch; state is two longs per key.
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.pages import PAGES_DDL


def _pages_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL + ", dt date")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def start_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    watermark: str = "1 day",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Drop re-crawls of the same url arriving within ``watermark`` of
    each other; append survivors to parquet. State per url is evicted
    once the watermark passes, bounding memory."""
    out_dir = os.path.join(output_root, "deduped")
    checkpoint = os.path.join(output_root, "_dedup_checkpoint")
    pages = _pages_stream(spark, input_path, max_files_per_trigger)
    deduped = (
        pages.select("url", "warc_ts", "text", "dt")
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .queryName("baselinr-stream-dedup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_TOTALS_SCHEMA = "dt string, docs long, kept long"
_STATE_SCHEMA = "docs long, kept long"


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-group state update: accumulate (docs, kept) forever, emit the
    running total once per batch the group appears in."""
    docs, kept = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        docs += len(pdf)
        kept += int(pdf["keep"].sum())
    state.update((docs, kept))
    yield pd.DataFrame({"dt": [key[0]], "docs": [docs], "kept": [kept]})


def start_running_totals(
    spark: SparkSession,
    docs_path: str,
    output_root: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Cumulative per-dt (docs, kept) counters over a stream of filtered
    docs — a custom stateful operator via ``applyInPandasWithState``.
    Each micro-batch emits the updated running totals for the dt keys it
    touched; ``foreachBatch`` upserts them into a parquet snapshot keyed
    by (dt, batch) so the latest batch per dt is the current total."""
    out_dir = os.path.join(output_root, "running_totals")
    checkpoint = os.path.join(output_root, "_totals_checkpoint")
    docs = (
        spark.readStream.schema("url string, keep boolean, dt date")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )
    totals = (
        docs.select(F.col("dt").cast("string").alias("dt"), "keep")
        .groupBy("dt")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    writer = (
        totals.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .queryName("baselinr-running-totals")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_totals(spark: SparkSession, output_root: str) -> DataFrame:
    """Current running totals: the newest batch's row per dt."""
    from pyspark.sql import Window as W

    df = spark.read.parquet(os.path.join(output_root, "running_totals"))
    w = W.partitionBy("dt").orderBy(F.col("batch").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "batch")
    )
