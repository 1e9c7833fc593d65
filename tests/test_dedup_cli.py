"""End-to-end test for the standalone incremental dedup job
(scripts/run_dedup.py): cross-partition near-dup filtering against
persisted LSH state, idempotent resume, and orphan-delta tolerance."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import run_dedup  # noqa: E402

DOC_A = ("the quick brown fox jumps over the lazy dog while the cat "
         "watches from a warm windowsill in the afternoon sun")
DOC_B = ("completely different content about distributed query engines "
         "and the cost model that drives join order selection at scale")
DOC_C = ("a third unrelated document describing sourdough fermentation "
         "timing hydration ratios and scoring patterns for home bakers")


@pytest.fixture()
def wh(spark, tmp_path):
    root = str(tmp_path / "pages")
    rows = [
        ("u1", DOC_A, "2025-06-01"),
        ("u2", DOC_B, "2025-06-01"),
        # day 2: exact re-post of DOC_A under a new url + one new doc
        ("u3", DOC_A, "2025-06-02"),
        ("u4", DOC_C, "2025-06-02"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, dt string")
    df.write.partitionBy("dt").mode("overwrite").parquet(root)
    return root


def _run(spark, capsys, argv):
    rc = run_dedup.main(argv, spark=spark)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_incremental_dedup_job_e2e(spark, tmp_path, capsys, wh):
    out = str(tmp_path / "out")
    rc, s = _run(spark, capsys, ["--input", wh, "--output", out])
    assert rc == 0
    assert s["partitions_total"] == 2 and s["partitions_skipped"] == 0
    assert s["docs_in"] == 4
    # u3 (re-post of DOC_A) is dropped against day-1 state
    assert s["docs_kept"] == 3
    kept = {
        r["url"]
        for r in spark.read.parquet(os.path.join(out, "kept")).collect()
    }
    assert kept == {"u1", "u2", "u4"}

    # resume: everything committed -> no-op
    rc2, s2 = _run(spark, capsys, ["--input", wh, "--output", out])
    assert rc2 == 0
    assert s2["partitions_skipped"] == 2 and s2["partitions_processed"] == []
    assert s2["docs_in"] == 0

    # state tables exist and are dt-tagged
    idx = spark.read.parquet(os.path.join(out, "dedup_state", "index"))
    assert set(idx.select("batch_dt").distinct().toPandas()["batch_dt"]) == {
        "2025-06-01", "2025-06-02",
    }


def test_orphan_deltas_are_ignored(spark, tmp_path, capsys, wh):
    out = str(tmp_path / "out")
    # process only day 1, then plant an ORPHAN index delta (a crash
    # between delta append and batch commit) claiming DOC_C's day
    rc, s = _run(spark, capsys, ["--input", wh, "--output", out,
                                 "--max-partitions", "1"])
    assert s["partitions_processed"] == ["2025-06-01"]
    idx_path = os.path.join(out, "dedup_state", "index")
    orphan = spark.read.parquet(idx_path).limit(1).withColumn(
        "batch_dt", F.lit("2099-01-01")
    )
    orphan.write.mode("append").parquet(idx_path)

    rc2, s2 = _run(spark, capsys, ["--input", wh, "--output", out])
    assert rc2 == 0
    # day 2 still dedups correctly: the orphan row was filtered out by
    # the committed-dt load, not treated as accepted state
    assert s2["partitions_processed"] == ["2025-06-02"]
    assert s2["docs_kept"] == 1  # u4 kept, u3 dropped vs day-1 state
