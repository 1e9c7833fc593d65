"""Streaming sketch maintenance — the Count-Min and HyperLogLog TABLES
(operators/sketch.py) kept continuously up to date over an arriving
corpus.

Why this exists: the batch sketches' whole design point is that they
are tables (mergeable, persistable, incrementally growable). This job
proves the incremental half on Structured Streaming: each micro-batch
contributes its own partial sketch, and the merged sketch is a pure
aggregation over the partials — CMS merges by SUM per (row, col), HLL
by MAX per idx — so the streamed answer equals the batch answer over
the same files exactly (asserted in tests/test_streaming_sketch.py).

Exactly-once shape (same as the other streaming sinks here): every
micro-batch writes its partials under a `batch=<id>` partition with
dynamic overwrite, so a replayed batch id overwrites itself instead of
double counting; the merged views are recomputed from the partial dirs
each trigger. State carried by the stream itself: none — the partial
dirs ARE the state, which is what makes restart trivially idempotent.

At 100 TB/day: a micro-batch's partial CMS is ≤ depth·width rows and
its partial HLL ≤ 2^p rows regardless of batch size (map-side combine
does the collapse), so the sink writes O(KB) per trigger and the merge
reads O(KB · n_batches) — compact the partial dirs on the same cadence
as any streaming table maintenance if n_batches grows unbounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import cms_build, hll_build, hll_estimate


def start_sketch_stream(
    spark: SparkSession,
    docs_path: str,
    output_root: str,
    key_col: str = "url",
    *,
    cms_width: int = 1024,
    cms_depth: int = 4,
    hll_p: int = 12,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Watch a parquet doc stream and maintain
    `<output_root>/stream_cms` (merged Count-Min cells),
    `<output_root>/stream_hll` (merged HLL registers) and
    `<output_root>/stream_distinct` (the one-row HLL estimate) for
    ``key_col``. Returns the streaming query."""
    cms_parts = os.path.join(output_root, "stream_cms_parts")
    hll_parts = os.path.join(output_root, "stream_hll_parts")
    cms_dir = os.path.join(output_root, "stream_cms")
    hll_dir = os.path.join(output_root, "stream_hll")
    est_dir = os.path.join(output_root, "stream_distinct")
    checkpoint = os.path.join(output_root, "_sketch_checkpoint")

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
        .select(F.col(key_col))
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        (
            cms_build(batch_df, key_col, width=cms_width, depth=cms_depth)
            .withColumn("batch", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(cms_parts)
        )
        (
            hll_build(batch_df, key_col, p=hll_p)
            .withColumn("batch", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(hll_parts)
        )
        merged_cms = (
            sp.read.parquet(cms_parts)
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt"))
        )
        merged_cms.coalesce(1).write.mode("overwrite").parquet(cms_dir)
        merged_hll = (
            sp.read.parquet(hll_parts)
            .groupBy("idx")
            .agg(F.max("rank").alias("rank"))
        )
        merged_hll.coalesce(1).write.mode("overwrite").parquet(hll_dir)
        (
            hll_estimate(sp.read.parquet(hll_dir), p=hll_p)
            .withColumn("as_of_batch", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(est_dir)
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
