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
