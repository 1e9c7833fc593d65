"""Tests for the metadata query client and lineage BFS."""

import datetime as dt

import pandas as pd

from baselinr_spark.query.client import (
    query_active_drift_summary,
    query_drift_events,
    query_run_details,
    query_runs,
    query_table_history,
)
from baselinr_spark.query.lineage import (
    get_downstream_tables,
    get_lineage_path,
    get_upstream_tables,
)

T0 = dt.datetime(2024, 6, 1)


def _runs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "run_id": [f"r{i}" for i in range(6)],
                "dataset_name": ["orders"] * 4 + ["users"] * 2,
                "schema_name": ["main"] * 6,
                "profiled_at": [T0 + dt.timedelta(days=i) for i in range(6)],
                "environment": ["prod", "dev"] * 3,
                "status": ["success"] * 5 + ["failed"],
                "row_count": [100 + i for i in range(6)],
                "column_count": [9] * 6,
            }
        )
    )


def test_query_runs_filters_and_pagination(spark):
    runs = _runs(spark)
    got = query_runs(runs, table="orders", status="success").collect()
    assert [r["run_id"] for r in got] == ["r3", "r2", "r1", "r0"]  # desc
    # offset skips the newest, limit bounds the page
    page = query_runs(runs, table="orders", status="success",
                      limit=2, offset=1).collect()
    assert [r["run_id"] for r in page] == ["r2", "r1"]
    # days filter anchored at an explicit now
    recent = query_runs(runs, days=2, now=T0 + dt.timedelta(days=5)).collect()
    assert {r["run_id"] for r in recent} == {"r4", "r5"}


def test_run_details_and_history(spark):
    runs = _runs(spark)
    metrics = spark.createDataFrame(
        pd.DataFrame(
            {
                "run_id": ["r1", "r1", "r2"],
                "dataset_name": ["orders"] * 3,
                "column_name": ["a", "b", "a"],
                "column_type": ["bigint"] * 3,
                "metric_name": ["count", "count", "count"],
                "metric_value": [1.0, 2.0, 3.0],
            }
        )
    )
    det = query_run_details(runs, metrics, "r1").collect()
    assert len(det) == 2
    assert {r["column_name"] for r in det} == {"a", "b"}
    assert all(r["row_count"] == 101 for r in det)

    hist = query_table_history(runs, "users", days=None).collect()
    assert [r["run_id"] for r in hist] == ["r5", "r4"]


def _drift_events(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "event_type": ["distribution_drift"] * 4,
                "table_name": ["t1", "t1", "t2", "t2"],
                "column_name": ["c"] * 4,
                "metric_name": ["mean", "schema_columns", "row_count",
                                "freshness_hours"],
                "baseline_value": [1.0] * 4,
                "current_value": [2.0] * 4,
                "change_percent": [100.0] * 4,
                "drift_severity": ["low", "high", "medium", "none"],
                "timestamp": [T0 + dt.timedelta(hours=i) for i in range(4)],
            }
        )
    )


def test_drift_events_and_summary(spark):
    ev = _drift_events(spark)
    got = query_drift_events(ev, table="t1", severity="high").collect()
    assert [r["event_id"] for r in got] == [2]

    summary = {
        r["table_name"]: r
        for r in query_active_drift_summary(
            ev, days=7, now=T0 + dt.timedelta(days=1)
        ).collect()
    }
    # t1: highest severity high; schema beats distribution for type
    assert summary["t1"]["severity"] == "high"
    assert summary["t1"]["drift_type"] == "schema"
    assert summary["t1"]["event_count"] == 2
    assert summary["t1"]["started_at"] == T0
    # t2: medium beats none; volume beats freshness
    assert summary["t2"]["severity"] == "medium"
    assert summary["t2"]["drift_type"] == "volume"


def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["upstream_table", "downstream_table", "lineage_type",
                     "confidence_score"],
        )
    )


def test_lineage_bfs_diamond_min_depth(spark):
    # diamond: a -> b -> d, a -> c -> d, plus deep chain d -> e
    edges = _edges(
        spark,
        [
            ("b", "a", "fk", 1.0),
            ("c", "a", "fk", 1.0),
            ("d", "b", "fk", 1.0),
            ("d", "c", "fk", 1.0),
            ("e", "d", "fk", 1.0),
        ],
    )
    up = get_upstream_tables(edges, "a").collect()
    by_table = {}
    for r in up:
        by_table.setdefault(r["table"], []).append(r["depth"])
    # d is reachable via b and c: one row per edge, both at min depth 1
    assert sorted(by_table["d"]) == [1, 1]
    assert by_table["b"] == [0] and by_table["c"] == [0]
    assert by_table["e"] == [2]
    # max_depth=0 -> only direct parents
    direct = get_upstream_tables(edges, "a", max_depth=0).collect()
    assert {r["table"] for r in direct} == {"b", "c"}

    down = get_downstream_tables(edges, "d").collect()
    assert sorted((r["table"], r["depth"]) for r in down) == [
        ("a", 1), ("a", 1), ("b", 0), ("c", 0)]


def test_lineage_bfs_cycle_and_missing(spark):
    edges = _edges(spark, [("a", "b", "fk", 1.0), ("b", "a", "fk", 1.0)])
    up = get_upstream_tables(edges, "b").collect()
    # cycle terminates: a at depth 0, then b at depth 1, then stop
    assert {(r["table"], r["depth"]) for r in up} == {("a", 0), ("b", 1)}
    assert get_upstream_tables(edges, "zzz").count() == 0


def test_lineage_path(spark):
    edges = _edges(
        spark,
        [
            ("s", "n1", "fk", 1.0),
            ("s", "n2", "fk", 1.0),
            ("n1", "r", "fk", 1.0),
            ("n2", "r", "fk", 1.0),
            ("r", "world", "fk", 1.0),
        ],
    )
    path = get_lineage_path(edges, "s", "world").collect()
    # shortest path length 4; lexical tiebreak picks n1 over n2
    assert [(r["step"], r["table"]) for r in sorted(path)] == [
        (0, "s"), (1, "n1"), (2, "r"), (3, "world")]
    # trivial path: from == to
    assert get_lineage_path(edges, "r", "r").count() == 1
    # no path / depth-capped
    assert get_lineage_path(edges, "world", "s").count() == 0
    assert get_lineage_path(edges, "s", "world", max_depth=2).count() == 0


def test_with_staleness(spark):
    from baselinr_spark.query.lineage import with_staleness

    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "upstream_table": ["a", "b", "c"],
                "downstream_table": ["x", "x", "x"],
                "last_seen_at": [T0 - dt.timedelta(days=40),
                                 T0 - dt.timedelta(days=5), pd.NaT],
            }
        )
    )
    got = {r["upstream_table"]: r["is_stale"]
           for r in with_staleness(edges, now=T0).collect()}
    assert got == {"a": True, "b": False, "c": False}


def test_infer_partition_key(spark):
    from baselinr_spark.sources.catalog import infer_partition_key

    df = spark.createDataFrame([], "url string, dt date, x long")
    assert infer_partition_key(df) == "dt"
    # name pattern beats type fallback
    df = spark.createDataFrame([], "event_date timestamp, ds string")
    assert infer_partition_key(df) == "event_date"
    # DATE/TIMESTAMP column with 'date' in the name as fallback
    df = spark.createDataFrame([], "url string, load_date timestamp")
    assert infer_partition_key(df) == "load_date"
    # timestamp without 'date' in the name does NOT match (reference :274-278)
    df = spark.createDataFrame([], "url string, warc_ts timestamp")
    assert infer_partition_key(df) is None


def test_collect_table_metadata(spark, warehouse):
    import datetime as dt

    from baselinr_spark.sources.catalog import collect_table_metadata

    now = dt.datetime.now(dt.timezone.utc)
    md = {r["table"]: r for r in collect_table_metadata(
        spark, {"pages": warehouse}, now=now).collect()}
    p = md["pages"]
    assert p["row_count"] == 400  # footer-exact, not estimated
    assert p["size_bytes"] > 0
    assert p["has_partitions"] and p["partition_key"] == "dt"
    assert 0 <= p["days_since_modified"] < 1

    # missing dir → zeroed metadata, no partitions
    md = {r["table"]: r for r in collect_table_metadata(
        spark, {"ghost": "/tmp/does_not_exist_xyz"}, now=now).collect()}
    g = md["ghost"]
    assert g["row_count"] == 0 and not g["has_partitions"]
    assert g["last_modified_time"] is None


def test_metadata_feeds_table_scorer(spark, warehouse):
    from baselinr_spark.operators.smart_selection import score_tables
    from baselinr_spark.sources.catalog import collect_table_metadata
    from pyspark.sql import functions as F

    md = collect_table_metadata(spark, {"pages": warehouse})
    meta = md.select(
        "table",
        F.lit(None).cast("long").alias("query_count"),
        F.lit(None).cast("double").alias("days_since_last_query"),
        "days_since_modified",
        "row_count",
    )
    out = score_tables(meta).collect()[0]
    # unknown query stats → neutral recency 50, zero frequency;
    # fresh write activity ≈ 100
    assert out["query_frequency_score"] == 0.0
    assert out["query_recency_score"] == 50.0
    assert out["write_activity_score"] > 90.0
