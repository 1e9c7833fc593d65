"""Streaming sketch maintenance: batch/stream agreement + idempotent
restart (streaming/sketch_stream.py)."""

import os

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.sketch import cms_build, hll_build, hll_estimate
from baselinr_spark.plans.pipeline import run_pipeline
from baselinr_spark.streaming.sketch_stream import start_sketch_stream


@pytest.fixture(scope="module")
def sketch_out(spark, warehouse, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sketch_stream_out"))
    run_pipeline(spark, warehouse, out, run_id="sk-base")
    return out


def _read_sorted(spark, path, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in spark.read.parquet(path).collect()
    )


def test_stream_sketches_match_batch(spark, sketch_out):
    docs_dir = os.path.join(sketch_out, "docs")
    q = start_sketch_stream(
        spark, docs_dir, sketch_out, key_col="url", max_files_per_trigger=3
    )
    q.awaitTermination(300)

    static = spark.read.parquet(docs_dir).select("url")
    want_cms = sorted(
        map(tuple, cms_build(static, "url").collect())
    )
    got_cms = _read_sorted(
        spark, os.path.join(sketch_out, "stream_cms"), ("row", "col", "cnt")
    )
    assert got_cms == want_cms

    want_hll = sorted(map(tuple, hll_build(static, "url").collect()))
    got_hll = _read_sorted(
        spark, os.path.join(sketch_out, "stream_hll"), ("idx", "rank")
    )
    assert got_hll == want_hll

    est = spark.read.parquet(os.path.join(sketch_out, "stream_distinct"))
    got_e = est.collect()[0]["estimate"]
    want_e = hll_estimate(hll_build(static, "url")).collect()[0]["estimate"]
    assert got_e == want_e
    # urls are unique per doc -> estimate near the true doc count
    n = static.count()
    assert abs(got_e - n) / n < 0.1


def test_stream_sketch_restart_is_idempotent(spark, sketch_out):
    docs_dir = os.path.join(sketch_out, "docs")
    before = _read_sorted(
        spark, os.path.join(sketch_out, "stream_cms"), ("row", "col", "cnt")
    )
    q = start_sketch_stream(
        spark, docs_dir, sketch_out, key_col="url", max_files_per_trigger=3
    )
    q.awaitTermination(300)
    after = _read_sorted(
        spark, os.path.join(sketch_out, "stream_cms"), ("row", "col", "cnt")
    )
    assert after == before
