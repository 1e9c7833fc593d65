"""Streaming PSI drift monitor: batch/stream agreement + idempotence."""

import os

import pytest
from pyspark.sql import functions as F

from baselinr_spark.plans.pipeline import psi_bucket_expr, run_pipeline
from baselinr_spark.streaming.drift_stream import start_drift_stream


@pytest.fixture(scope="module")
def batch_docs(spark, warehouse, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("drift_stream_out"))
    run_pipeline(spark, warehouse, out, run_id="ds-base")
    return out


def _batch_psi(spark, docs_dir):
    from baselinr_spark.operators.drift import psi_pairwise_lag

    docs = spark.read.parquet(docs_dir)
    counts = (
        docs.select(F.col("dt").cast("string").alias("dt"),
                    psi_bucket_expr().alias("bucket"))
        .groupBy("dt", "bucket").count()
        .withColumn("metric", F.lit("perplexity"))
    )
    return {
        r["cohort"]: (round(r["psi"], 9), r["drift"], r["severity"])
        for r in psi_pairwise_lag(counts, "dt", "bucket", "count",
                                  key_cols=["metric"]).collect()
    }


def test_stream_drift_matches_batch_psi(spark, batch_docs):
    docs_dir = os.path.join(batch_docs, "docs")
    q = start_drift_stream(spark, docs_dir, batch_docs,
                           max_files_per_trigger=3)
    q.awaitTermination(300)

    got = {
        r["cohort"]: (round(r["psi"], 9), r["drift"], r["severity"])
        for r in spark.read.parquet(
            os.path.join(batch_docs, "stream_drift")).collect()
    }
    want = _batch_psi(spark, docs_dir)
    assert got == want
    assert len(got) >= 8  # 10 daily cohorts → 9 lag pairs


def test_stream_drift_restart_is_idempotent(spark, batch_docs):
    """Re-running the drained stream must not change the verdicts (the
    checkpoint skips consumed files; the (dt, batch) snapshot upsert is
    re-delivery-safe)."""
    docs_dir = os.path.join(batch_docs, "docs")
    before = spark.read.parquet(
        os.path.join(batch_docs, "stream_drift")).collect()
    q = start_drift_stream(spark, docs_dir, batch_docs,
                           max_files_per_trigger=3)
    q.awaitTermination(300)
    after = spark.read.parquet(
        os.path.join(batch_docs, "stream_drift")).collect()
    key = lambda r: (r["cohort"],)  # noqa: E731
    assert sorted((r["cohort"], round(r["psi"], 9)) for r in before) == \
        sorted((r["cohort"], round(r["psi"], 9)) for r in after)


def test_stream_distribution_state_is_cumulative(spark, batch_docs):
    """The per-dt distributions in the snapshot equal the full batch
    bincounts even though each micro-batch saw only a few files."""
    docs_dir = os.path.join(batch_docs, "docs")
    from pyspark.sql import Window as W

    snap = spark.read.parquet(
        os.path.join(batch_docs, "stream_distributions"))
    latest = (snap.withColumn(
        "__rn", F.row_number().over(
            W.partitionBy("dt").orderBy(F.desc("batch"))))
        .filter("__rn = 1"))
    got = {str(r["dt"]): r["counts"] for r in latest.collect()}

    docs = spark.read.parquet(docs_dir)
    want_rows = (docs.select(F.col("dt").cast("string").alias("dt"),
                             psi_bucket_expr().alias("bucket"))
                 .groupBy("dt", "bucket").count().collect())
    want = {}
    for r in want_rows:
        want.setdefault(r["dt"], [0] * 10)[r["bucket"]] = r["count"]
    assert got == want
