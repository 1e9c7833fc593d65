"""Streaming PSI drift monitor — the pipeline's cohort drift check as a
continuously-updating Structured Streaming job.

The batch pipeline computes PSI between consecutive dt cohorts from the
stored metrics table (plans/pipeline.py:drift_events). A continuously-
arriving corpus wants the same signal without waiting for a batch run:
this job maintains each cohort's perplexity-bucket distribution as
STREAMING STATE and re-evaluates the pairwise-lag PSI whenever a
micro-batch lands.

Shape (all bounded at 100 TB/day):
1. The doc stream is bucketed with the SAME fixed log10 half-decade
   expression the batch pipeline uses (`psi_bucket_expr`) — fixed edges
   are what make distributions comparable across cohorts AND across the
   batch/stream boundary.
2. `applyInPandasWithState` keyed by dt holds ONE 10-long count vector
   per cohort (state ≈ 80 bytes/day of data, nothing grows with docs);
   each micro-batch adds its bincounts and emits the cohort's current
   distribution. `GroupStateTimeout` eviction is deliberately off —
   a year of cohorts is ~30 KB of state; re-emitting an old dt after
   eviction would zero its history.
3. `foreachBatch` upserts the emitted distributions into a tiny parquet
   snapshot (one dir per dt, latest batch wins — the same idempotent
   (key, batch) pattern as `start_running_totals`) and recomputes
   `psi_pairwise_lag` over the CURRENT snapshot — the exact batch
   operator, so streaming and batch drift agree by construction
   (asserted in tests/test_streaming_drift.py).

The output `stream_drift` table is the live answer to "is today's
cohort drifting against yesterday's" with micro-batch latency.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ..plans.pipeline import psi_bucket_expr

N_PSI_BUCKETS = 10

_DIST_SCHEMA = "dt string, counts array<long>"
_DSTATE_SCHEMA = "counts array<long>"


def _update_distribution(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Accumulate the cohort's bucket counts; emit the current vector
    once per micro-batch the cohort appears in."""
    counts = (np.array(state.get[0], dtype=np.int64) if state.exists
              else np.zeros(N_PSI_BUCKETS, dtype=np.int64))
    for pdf in pdfs:
        counts += np.bincount(pdf["bucket"].to_numpy(dtype=np.int64),
                              minlength=N_PSI_BUCKETS)
    state.update((counts.tolist(),))
    yield pd.DataFrame({"dt": [key[0]], "counts": [counts.tolist()]})


def start_drift_stream(
    spark: SparkSession,
    docs_path: str,
    output_root: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Watch a stream of filtered docs (any source with `dt` and
    `perplexity`), maintain per-dt perplexity-bucket distributions, and
    keep `<output_root>/stream_drift` updated with the pairwise-lag PSI
    verdict per cohort. Returns the streaming query."""
    from ..operators.drift import psi_pairwise_lag

    dist_dir = os.path.join(output_root, "stream_distributions")
    drift_dir = os.path.join(output_root, "stream_drift")
    checkpoint = os.path.join(output_root, "_drift_checkpoint")

    docs = (
        spark.readStream.schema(
            "url string, dt string, perplexity double")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )
    bucketed = docs.select(
        F.col("dt").cast("string").alias("dt"),
        psi_bucket_expr().alias("bucket"),
    )
    dists = bucketed.groupBy("dt").applyInPandasWithState(
        _update_distribution,
        outputStructType=_DIST_SCHEMA,
        stateStructType=_DSTATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        # idempotent upsert: one (dt=..., batch=...) dir per touched
        # cohort; the max batch per dt is its current distribution
        (batch_df.withColumn("batch", F.lit(batch_id))
         .coalesce(1).write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("dt", "batch").parquet(dist_dir))
        snap = sp.read.parquet(dist_dir)
        from pyspark.sql import Window as W

        latest = (
            snap.withColumn(
                "__rn",
                F.row_number().over(
                    W.partitionBy("dt").orderBy(F.desc("batch"))))
            .filter(F.col("__rn") == 1)
        )
        long_counts = latest.select(
            F.col("dt").cast("string").alias("dt"),
            F.posexplode("counts").alias("bucket", "count"),
        ).withColumn("metric", F.lit("perplexity"))
        psi = psi_pairwise_lag(long_counts, "dt", "bucket", "count",
                               key_cols=["metric"])
        (psi.withColumn("as_of_batch", F.lit(batch_id))
         .coalesce(1).write.mode("overwrite").parquet(drift_dir))

    writer = (
        dists.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .queryName("baselinr-stream-drift")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
