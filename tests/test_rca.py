"""Unit tests for the RCA temporal-correlation operators.

Hand-computed expectations mirror the reference formulas
(temporal_correlator.py:333-388, root_cause_analyzer.py:271-327).
"""

import datetime as dt
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.rca import (
    correlate_deployments,
    correlate_pipeline_runs,
    multi_signal_score,
    rank_causes,
    recurring_patterns,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ts(hours_before: float) -> dt.datetime:
    return T0 - dt.timedelta(hours=hours_before)


@pytest.fixture()
def anomalies(spark):
    return spark.createDataFrame(
        pd.DataFrame({"anomaly_id": [1], "table_name": ["orders"],
                      "anomaly_ts": [T0]})
    )


def test_pipeline_correlation_hand_computed(spark, anomalies):
    runs = spark.createDataFrame(
        pd.DataFrame(
            {
                "run_id": [10, 11, 12, 13, 14],
                "pipeline_name": ["a", "b", "c", "d", "e"],
                "pipeline_type": ["etl"] * 5,
                # 4h before (one half-life), 1h, 30h (outside window),
                # in the future (excluded), exactly at lookback boundary
                "started_at": [_ts(4), _ts(1), _ts(30), _ts(-1), _ts(24)],
                "status": ["success", "failed", "success", "success", "success"],
                "duration_seconds": [60.0, None, 60.0, 60.0, None],
                "affected_tables": [["orders"], ["x_orders_y"], ["orders"],
                                    ["orders"], []],
            }
        )
    )
    got = {
        r["cause_id"]: r
        for r in correlate_pipeline_runs(anomalies, runs,
                                         lookback_hours=24.0).collect()
    }
    # run 12 (30h before) and run 13 (after the anomaly) are excluded
    assert set(got) == {10, 11, 14}

    # run 10: proximity = 0.5 at one half-life, exact table match = 1.0
    r10 = got[10]
    assert r10["temporal_proximity"] == pytest.approx(0.5, abs=1e-12)
    assert r10["table_relevance"] == 1.0
    assert r10["confidence_score"] == pytest.approx(0.5 * 0.6 + 1.0 * 0.4)
    assert r10["cause_type"] == "pipeline_degradation"
    assert r10["time_before_anomaly_minutes"] == pytest.approx(240.0)

    # run 11: failed -> x1.5 boost capped at 1.0; partial table match 0.7
    r11 = got[11]
    prox = math.exp(-math.log(2) / 4.0 * 1.0)
    assert r11["temporal_proximity"] == pytest.approx(prox, rel=1e-12)
    assert r11["table_relevance"] == 0.7
    assert r11["confidence_score"] == pytest.approx(
        min(1.0, (prox * 0.6 + 0.7 * 0.4) * 1.5)
    )
    assert r11["cause_type"] == "pipeline_failure"

    # run 14: boundary-inclusive (exactly lookback before); empty table
    # list -> unknown relevance 0.3; null duration -> data_quality
    r14 = got[14]
    assert r14["table_relevance"] == 0.3
    assert r14["cause_type"] == "data_quality"
    assert r14["temporal_proximity"] == pytest.approx(
        math.exp(-math.log(2) / 4.0 * 24.0), rel=1e-12
    )

    # ranking: confidence desc -> 11 (boosted ~1.0), 10 (0.7), 14
    assert [got[i]["rank"] for i in (11, 10, 14)] == [1, 2, 3]


def test_deployment_correlation_and_ranking(spark, anomalies):
    deps = spark.createDataFrame(
        pd.DataFrame(
            {
                "deployment_id": [20, 21],
                "deployed_at": [_ts(4), _ts(4)],
                "git_branch": ["main", "main"],
                "deployment_type": ["schema", "code"],
                "affected_pipelines": [["p1"], []],
            }
        )
    )
    got = {
        r["cause_id"]: r
        for r in correlate_deployments(anomalies, deps,
                                       lookback_hours=24.0).collect()
    }
    # schema deployment: relevance 0.5 * 1.5 = 0.75; code w/o pipelines: 0.3
    assert got[20]["pipeline_relevance"] == pytest.approx(0.75)
    assert got[21]["pipeline_relevance"] == pytest.approx(0.3)
    assert got[20]["confidence_score"] == pytest.approx(0.5 * 0.7 + 0.75 * 0.3)
    assert all(r["cause_type"] == "code_change" for r in got.values())

    # rank_causes: dedup same cause_id keeping max confidence, floor 0.3
    causes = spark.createDataFrame(
        pd.DataFrame(
            {
                "anomaly_id": [1, 1, 1, 1],
                "cause_id": [5, 5, 6, 7],
                "cause_type": ["a", "b", "c", "d"],
                "confidence_score": [0.9, 0.4, 0.2, 0.5],
            }
        )
    )
    ranked = rank_causes(causes, min_confidence=0.3, max_causes=5).collect()
    by_id = {r["cause_id"]: r for r in ranked}
    assert set(by_id) == {5, 7}              # 6 below floor; 5 deduped
    assert by_id[5]["confidence_score"] == 0.9
    assert by_id[5]["rank"] == 1 and by_id[7]["rank"] == 2


def test_multi_signal_score_and_patterns(spark):
    df = spark.range(1).select(
        multi_signal_score(F.lit(1.0), F.lit(1.0), F.lit(1.0)).alias("capped"),
        multi_signal_score(F.lit(0.5), F.lit(None).cast("double"),
                           F.lit(0.2)).alias("with_null"),
    )
    row = df.collect()[0]
    assert row["capped"] == 1.0
    assert row["with_null"] == pytest.approx(0.5 * 0.4 + 0.2 * 0.3)

    incidents = spark.createDataFrame(
        pd.DataFrame(
            {
                # 4 incidents; top cause per incident: A, A, A, B
                "incident_id": [1, 1, 2, 3, 4],
                "analyzed_at": [_ts(5), _ts(5), _ts(4), _ts(3), _ts(2)],
                "cause_type": ["A", "B", "A", "A", "B"],
                "confidence_score": [0.9, 0.5, 0.8, 0.7, 0.6],
            }
        )
    )
    pats = recurring_patterns(incidents, min_pattern_occurrences=3).collect()
    assert len(pats) == 1  # only A recurs >= 3 times
    p = pats[0]
    assert p["cause_type"] == "A"
    assert p["occurrence_count"] == 3
    assert p["avg_confidence"] == pytest.approx((0.9 + 0.8 + 0.7) / 3)
    assert p["first_seen"] == _ts(5) and p["last_seen"] == _ts(3)


def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["upstream_table", "downstream_table"])
    )


def test_lineage_closure_and_common_ancestors(spark):
    from baselinr_spark.operators.rca import common_ancestors, lineage_closure

    # diamond with a deep tail: root -> (x, y) -> leaf; root -> z
    edges = _edges(spark, [
        ("root", "x"), ("root", "y"), ("x", "leaf"), ("y", "leaf"),
        ("root", "z"),
    ])
    cl = {(r["table"], r["upstream_table"]): r["distance"]
          for r in lineage_closure(edges, max_depth=5).collect()}
    assert cl[("leaf", "x")] == 1 and cl[("leaf", "y")] == 1
    assert cl[("leaf", "root")] == 2  # min distance through either branch
    assert cl[("z", "root")] == 1

    anc = common_ancestors(lineage_closure(edges), ["leaf", "z"]).collect()
    assert [(r["upstream_table"], r["distance"]) for r in anc] == [("root", 1)]


def test_upstream_anomaly_causes_hand_computed(spark):
    from baselinr_spark.operators.rca import (
        lineage_closure, upstream_anomaly_causes,
    )

    closure = lineage_closure(_edges(spark, [("p", "t"), ("gp", "p")]))
    anomalies = spark.createDataFrame(pd.DataFrame({
        "anomaly_id": [1], "table_name": ["t"], "anomaly_ts": [T0],
        "column_name": ["c1"], "metric_name": ["m1"],
    }))
    events = spark.createDataFrame(pd.DataFrame({
        "event_id": [10, 11, 12],
        "table_name": ["p", "gp", "p"],
        "column_name": ["c1", "cX", "c1"],
        "metric_name": ["mX", "m1", "m1"],
        "severity": ["high", "low", "low"],
        # 1h before (peak temporal), 5h before, and AFTER (excluded)
        "timestamp": [_ts(1), _ts(5), _ts(-1)],
    }))
    got = {r["cause_id"]: r for r in upstream_anomaly_causes(
        closure, anomalies, events, lookback_hours=24.0).collect()}
    assert set(got) == {10, 11}

    r10 = got[10]  # distance 1 (p), 1h -> temporal 1.0, column match only
    assert r10["distance_score"] == pytest.approx(1 / 1.5)
    assert r10["temporal_score"] == 1.0
    assert r10["confidence_score"] == pytest.approx(
        min(1.0, (1 / 1.5) * 0.4 + 1.0 * 0.4 + 0.2))

    r11 = got[11]  # distance 2 (gp), 5h -> 1-(3/24), metric match only
    assert r11["distance_score"] == pytest.approx(1 / 2.0)
    assert r11["temporal_score"] == pytest.approx(1 - 3 / 24)
    assert r11["confidence_score"] == pytest.approx(
        0.5 * 0.4 + (1 - 3 / 24) * 0.4 + 0.2)
    assert r11["lineage_distance"] == 2
    assert got[10]["rank"] == 1 and got[11]["rank"] == 2


def test_impact_analysis_chain(spark):
    from baselinr_spark.operators.rca import impact_analysis

    # a -> b -> c (a feeds b feeds c)
    edges = _edges(spark, [("a", "b"), ("b", "c")])
    got = {r["table"]: r for r in impact_analysis(edges).collect()}
    assert got["a"]["n_downstream"] == 2
    assert got["a"]["max_downstream_depth"] == 2
    assert got["a"]["blast_radius_score"] == pytest.approx(0.4)
    assert got["a"]["n_upstream"] == 0
    assert got["c"]["n_upstream"] == 2 and got["c"]["n_downstream"] == 0
    assert got["c"]["blast_radius_score"] == 0.0
