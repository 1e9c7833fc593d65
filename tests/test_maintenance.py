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


def test_snapshot_expiry_both_conditions_required(spark):
    """retain_last=2, max_age=10d, now=2024-01-31: the newest two keep
    by rank; rank-3 is only 6 days old so it survives on age; rank-4
    is 30 days old and beyond retain_last, so it alone expires."""
    from baselinr_spark.operators.maintenance import snapshot_expiry_plan

    rows = [
        ("t", 1, "2024-01-01 00:00:00"),  # rank 4, 30d old -> expire
        ("t", 2, "2024-01-25 00:00:00"),  # rank 3, 6d old -> keep (age)
        ("t", 3, "2024-01-28 00:00:00"),  # rank 2 -> keep (retain)
        ("t", 4, "2024-01-30 00:00:00"),  # rank 1 -> keep (retain)
    ]
    df = spark.createDataFrame(rows, ["tbl", "snap", "ts"]).select(
        "tbl", "snap", df_ts("ts")
    )
    got = {r["snap"]: r
           for r in snapshot_expiry_plan(
               df, "tbl", "snap", "ts", retain_last=2,
               max_age_days=10.0, now_ts="2024-01-31 00:00:00").collect()}
    assert got[1]["expire"] and got[1]["rank"] == 4
    assert not got[2]["expire"]  # rank 3 but young
    assert not got[3]["expire"] and not got[4]["expire"]


def df_ts(col):
    from pyspark.sql import functions as F
    return F.to_timestamp(col).alias("ts")


def test_snapshot_expiry_tie_breaks_by_snap_id(spark):
    """Two snapshots at the same instant: the higher id ranks newer."""
    from baselinr_spark.operators.maintenance import snapshot_expiry_plan

    rows = [("t", 1, "2024-01-01 00:00:00"), ("t", 2, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, ["tbl", "snap", "ts"]).select(
        "tbl", "snap", df_ts("ts")
    )
    got = {r["snap"]: r["rank"]
           for r in snapshot_expiry_plan(
               df, "tbl", "snap", "ts", retain_last=1,
               max_age_days=0.5, now_ts="2024-01-02 00:00:00").collect()}
    assert got[2] == 1 and got[1] == 2


def test_orphan_file_audit_hand_computed(spark):
    """f2 is unreferenced -> orphan; manifest dupes and NULLs are
    harmless; referenced files never appear."""
    files = spark.createDataFrame(
        [("f1", 10), ("f2", 20), ("f3", 30)], ["path", "bytes"]
    )
    manifest = spark.createDataFrame(
        [("f1",), ("f1",), ("f3",), (None,)], "path string"
    )
    from baselinr_spark.operators.maintenance import orphan_file_audit

    got = orphan_file_audit(files, manifest, "path",
                            size_col="bytes").collect()
    assert len(got) == 1
    assert got[0]["path"] == "f2" and got[0]["bytes"] == 20


def test_partition_spec_plan_coarsen(spark):
    from baselinr_spark.operators.maintenance import partition_spec_plan

    # 4 partitions of 10 bytes each, target 100 -> all small -> coarsen
    files = spark.createDataFrame(
        [(f"p{i}", 10) for i in range(4)], ["part", "bytes"]
    )
    r = partition_spec_plan(files, "part", "bytes", target_bytes=100).collect()[0]
    assert r["n_partitions"] == 4
    assert r["small_frac"] == 1.0
    assert r["recommendation"] == "coarsen"


def test_partition_spec_plan_split_and_keep(spark):
    from baselinr_spark.operators.maintenance import partition_spec_plan

    # one 500-byte partition among 3 at target 100 -> large_frac=0.25 > 0.2
    files = spark.createDataFrame(
        [("a", 500), ("b", 100), ("c", 120)], ["part", "bytes"]
    )
    r = partition_spec_plan(files, "part", "bytes", target_bytes=100).collect()[0]
    assert r["large_frac"] > 0.2
    assert r["recommendation"] == "split"
    # balanced sizes -> keep
    files2 = spark.createDataFrame(
        [("a", 100), ("b", 110), ("c", 90)], ["part", "bytes"]
    )
    r2 = partition_spec_plan(files2, "part", "bytes",
                             target_bytes=100).collect()[0]
    assert r2["recommendation"] == "keep"


def test_file_prune_audit(spark):
    from baselinr_spark.operators.maintenance import file_prune_audit

    stats = spark.createDataFrame(
        [
            ("p1", 0, 0, 50),        # below range -> pruned
            ("p1", 1, 60, 90),       # intersects [80, 120] -> scanned
            ("p1", 2, 130, 200),     # above -> pruned
            ("p1", 3, None, 10),     # null stats -> must scan
            ("p2", 0, 100, 110),     # inside -> scanned
        ],
        ["part", "file_id", "min_v", "max_v"],
    )
    got = {r["part"]: r for r in
           file_prune_audit(stats, "part", "min_v", "max_v",
                            lo=80, hi=120).collect()}
    assert got["p1"]["n_files"] == 4
    assert got["p1"]["n_scanned"] == 2  # the intersecting + the null-stats
    assert got["p1"]["prune_frac"] == 0.5
    assert got["p2"]["n_scanned"] == 1
    assert got["p2"]["prune_frac"] == 0.0
