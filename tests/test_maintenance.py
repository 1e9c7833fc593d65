"""compaction_plan — hand-computed plans."""

from baselinr_spark.operators.maintenance import compaction_plan


def test_compaction_plan_hand_computed(spark):
    """p1: 4 small files of 100 bytes, target 250 -> 2 output files,
    2 saved, needs compaction. p2: one big 300-byte file -> 2 output?
    no: ceil(300/250)=2 > n_files=1 -> no reduction, no compaction.
    p3: 2 files but only 1 small -> small-count rule blocks it."""
    df = spark.createDataFrame(
        [("p1", 100), ("p1", 100), ("p1", 100), ("p1", 100),
         ("p2", 300),
         ("p3", 100), ("p3", 240)],
        ["part", "bytes"],
    )
    got = {r["part"]: r
           for r in compaction_plan(df, "part", "bytes",
                                    target_bytes=250,
                                    small_frac=0.5).collect()}
    p1 = got["p1"]
    assert p1["n_files"] == 4 and p1["n_small_files"] == 4
    assert p1["n_output_files"] == 2 and p1["files_saved"] == 2
    assert p1["needs_compaction"]

    p2 = got["p2"]
    assert p2["n_files"] == 1 and not p2["needs_compaction"]
    assert p2["files_saved"] == 0

    p3 = got["p3"]
    assert p3["n_small_files"] == 1 and not p3["needs_compaction"]


def test_compaction_plan_exact_target_boundary(spark):
    """total == k * target -> exactly k outputs (ceil boundary)."""
    df = spark.createDataFrame(
        [("p", 250), ("p", 250), ("p", 100), ("p", 100), ("p", 50)],
        ["part", "bytes"],
    )
    (r,) = compaction_plan(df, "part", "bytes", target_bytes=250,
                           small_frac=0.5).collect()
    assert r["total_bytes"] == 750 and r["n_output_files"] == 3
    assert r["files_saved"] == 2 and r["needs_compaction"]
