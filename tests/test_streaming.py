"""Structured Streaming front-end: drain-the-backlog run must produce
exactly the docs the batch transform produces, and a restart must not
duplicate output (exactly-once via checkpoint + dynamic overwrite)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_result(spark, warehouse, tmp_path_factory):
    from baselinr_spark.streaming.filter_stream import start_filter_stream

    out_root = str(tmp_path_factory.mktemp("stream_out"))
    q = start_filter_stream(spark, warehouse, out_root, run_id="s1",
                            max_files_per_trigger=4, available_now=True)
    q.awaitTermination(300)
    return out_root


def test_stream_matches_batch_transform(spark, warehouse, stream_result, pages_pdf):
    from baselinr_spark.oracle.pandas_ref import reference_labels

    docs = spark.read.parquet(os.path.join(stream_result, "docs")).toPandas()
    labels = reference_labels(pages_pdf)
    merged = docs.merge(labels, on="url", validate="1:1")
    assert len(merged) == len(labels)
    assert (merged["keep"] == merged["expected_keep"]).all()
    for _, row in merged.head(50).iterrows():
        assert row["scrubbed_text"] == row["expected_scrubbed_text"]


def test_stream_restart_is_idempotent(spark, warehouse, stream_result):
    from baselinr_spark.streaming.filter_stream import start_filter_stream

    docs_dir = os.path.join(stream_result, "docs")
    before = spark.read.parquet(docs_dir).count()
    # restart over the same checkpoint: backlog already consumed → no-op
    q = start_filter_stream(spark, warehouse, stream_result, run_id="s1",
                            max_files_per_trigger=4, available_now=True)
    q.awaitTermination(300)
    after = spark.read.parquet(docs_dir).count()
    assert after == before
    urls = spark.read.parquet(docs_dir).groupBy("url").count()
    assert urls.filter(F.col("count") > 1).count() == 0
