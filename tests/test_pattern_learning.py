"""Pattern learner: hand-computed suffix/prefix/exact rules."""

import pytest

from baselinr_spark.operators.pattern_learning import learn_patterns


def _cfg(spark, rows):
    return spark.createDataFrame(
        rows, "table_name string, column_name string, check_type string")


def test_suffix_majority_and_consistency(spark):
    # four *_id column instances; completeness on all 4, uniqueness on 2
    rows = [
        ("t1", "user_id", "completeness"), ("t1", "user_id", "uniqueness"),
        ("t1", "order_id", "completeness"),
        ("t2", "user_id", "completeness"), ("t2", "user_id", "uniqueness"),
        ("t2", "item_id", "completeness"),
    ]
    out = {(r["pattern"], r["check_type"]): r
           for r in learn_patterns(_cfg(spark, rows)).collect()}
    c = out[("*_id", "completeness")]
    assert c["pattern_type"] == "suffix"
    assert c["occurrence_count"] == 4
    u = out[("*_id", "uniqueness")]
    # common checks: completeness 4/4, uniqueness 2/4 (>= 0.5) →
    # consistency (4+2)/(4*2) = 0.75 → conf 0.5 + 0.45*0.75 = 0.8375
    assert c["confidence"] == pytest.approx(0.8375)
    assert u["confidence"] == pytest.approx(0.8375)


def test_first_matching_suffix_wins(spark):
    # 'loaded_at' matches _at (first in list); 'x_type' matches _type;
    # a single-occurrence bucket is dropped (min_occurrences=2)
    rows = [
        ("t", "loaded_at", "freshness"), ("t", "synced_at", "freshness"),
        ("t", "x_type", "allowed_values"),
    ]
    out = learn_patterns(_cfg(spark, rows)).collect()
    pats = {r["pattern"] for r in out}
    assert "*_at" in pats and "*_type" not in pats
    at = next(r for r in out if r["pattern"] == "*_at")
    # both columns carry freshness → consistency 1 → conf capped logic:
    # 0.5 + 0.45*1.0 = 0.95
    assert at["confidence"] == pytest.approx(0.95)


def test_prefix_and_exact(spark):
    rows = [
        ("t1", "is_active", "completeness"),
        ("t2", "is_valid", "completeness"),
        # exact 'status' appears in three tables with 2:1 check split
        ("t1", "status", "allowed_values"),
        ("t2", "status", "allowed_values"),
        ("t3", "status", "completeness"),
    ]
    out = {(r["pattern_type"], r["pattern"], r["check_type"]): r
           for r in learn_patterns(_cfg(spark, rows)).collect()}
    assert ("prefix", "is_*", "completeness") in out
    ex = out[("exact", "status", "allowed_values")]
    # total=3 entries, top1=2 → conf 0.6 + 0.35*2/3
    assert ex["confidence"] == pytest.approx(0.6 + 0.35 * 2 / 3, abs=1e-6)
    assert ex["occurrence_count"] == 3
    # completeness is 1/3 (>= 0.3) → also kept, same confidence
    assert ("exact", "status", "completeness") in out


def test_minority_checks_dropped(spark):
    # uniqueness on 1 of 3 *_key instances (< 0.5) → not emitted
    rows = [
        ("t1", "a_key", "completeness"), ("t1", "a_key", "uniqueness"),
        ("t2", "b_key", "completeness"),
        ("t3", "c_key", "completeness"),
    ]
    out = learn_patterns(_cfg(spark, rows)).collect()
    checks = {r["check_type"] for r in out if r["pattern"] == "*_key"}
    assert checks == {"completeness"}
