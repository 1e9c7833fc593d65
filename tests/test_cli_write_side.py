"""Write-side CLI verbs (profile / drift-check / validate / score) —
the reference CI's profile-twice-then-drift flow
(reference .github/workflows/cli-e2e.yml:49-80) over a parquet
warehouse."""

import json
import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import query_meta  # noqa: E402


def _run(spark, out_root, argv):
    return query_meta.main(["--output", out_root] + argv, spark=spark)


@pytest.fixture()
def wh(spark, tmp_path):
    """A tiny 'customers' table the test mutates between profile runs."""
    root = str(tmp_path / "wh")
    rows = [Row(cust_id=i, amount=float(100 + i), email=f"u{i}@x.com")
            for i in range(50)]
    spark.createDataFrame(rows).write.parquet(os.path.join(root, "customers"))
    return root


def test_profile_twice_then_drift(spark, tmp_path, wh):
    out = str(tmp_path / "meta")
    r1 = _run(spark, out, ["profile", "--warehouse", wh,
                           "--table", "customers", "--run-id", "r1"])
    assert {r["run_id"] for r in r1} == {"r1"}
    assert any(r["metric_name"] == "count" and r["metric_value"] == 50.0
               for r in r1)

    # mutate: drop 40% of rows -> count drifts by -40% (high >= 30%).
    # Spark refuses to overwrite a path from a plan that reads it, so
    # round-trip the survivors through the driver (50 rows) first.
    cust = os.path.join(wh, "customers")
    survivors = spark.read.parquet(cust).filter(F.col("cust_id") < 30).collect()
    spark.createDataFrame(survivors).write.mode("overwrite").parquet(cust)
    r2 = _run(spark, out, ["profile", "--warehouse", wh,
                           "--table", "customers", "--run-id", "r2"])
    assert {r["run_id"] for r in r2} == {"r2"}

    drift = _run(spark, out, ["drift-check", "--table", "customers",
                              "--drift-only"])
    # defaults picked latest (r2) vs second-latest (r1)
    assert drift and all(r["baseline_run"] == "r1"
                         and r["current_run"] == "r2" for r in drift)
    assert all(r["drift"] for r in drift)

    with pytest.raises(SystemExit) as ei:
        _run(spark, out, ["drift-check", "--table", "customers",
                          "--fail-on-drift"])
    assert ei.value.code == 3


def test_profile_twice_same_data_no_drift(spark, tmp_path, wh):
    out = str(tmp_path / "meta")
    _run(spark, out, ["profile", "--warehouse", wh, "--table", "customers",
                      "--run-id", "a"])
    _run(spark, out, ["profile", "--warehouse", wh, "--table", "customers",
                      "--run-id", "b"])
    rows = _run(spark, out, ["drift-check", "--table", "customers"])
    assert rows and not any(r["drift"] for r in rows)
    # identical runs: exit cleanly even with --fail-on-drift
    _run(spark, out, ["drift-check", "--table", "customers",
                      "--fail-on-drift"])


def test_drift_check_requires_history(spark, tmp_path, wh):
    out = str(tmp_path / "meta")
    _run(spark, out, ["profile", "--warehouse", wh, "--table", "customers"])
    with pytest.raises(SystemExit) as ei:
        _run(spark, out, ["drift-check", "--table", "customers"])
    assert ei.value.code == 2


def test_validate_default_and_rules_json(spark, tmp_path, wh):
    out = str(tmp_path / "meta")
    rows = _run(spark, out, ["validate", "--warehouse", wh,
                             "--table", "customers"])
    assert {r["rule_type"] for r in rows} == {"not_null"}
    assert all(r["failed_rows"] == 0 for r in rows)

    spec = [
        {"name": "amount_range", "rule_type": "range", "column": "amount",
         "min_value": 0, "max_value": 120},
        {"name": "email_fmt", "rule_type": "format", "column": "email",
         "pattern": "^[^@]+@[^@]+$"},
        {"name": "cust_unique", "rule_type": "unique", "column": "cust_id"},
    ]
    rules_path = str(tmp_path / "rules.json")
    with open(rules_path, "w") as fh:
        json.dump(spec, fh)
    rows = _run(spark, out, ["validate", "--warehouse", wh,
                             "--table", "customers",
                             "--rules-json", rules_path])
    by = {r["rule_name"]: r for r in rows}
    # amounts run 100..149 -> 29 rows exceed 120
    assert by["amount_range"]["failed_rows"] == 29
    assert by["email_fmt"]["failed_rows"] == 0
    assert by["cust_unique"]["failed_rows"] == 0


def test_score_emits_overall(spark, tmp_path, wh):
    out = str(tmp_path / "meta")
    rows = _run(spark, out, ["score", "--warehouse", wh,
                             "--table", "customers"])
    assert len(rows) == 1
    r = rows[0]
    assert r["table_name"] == "customers"
    assert 0.0 <= r["overall_score"] <= 100.0
    assert r["status"] in ("healthy", "warning", "critical")


def test_lineage_visualize(spark, tmp_path, wh):
    """`lineage visualize` renders the pipeline lineage graph around a
    partition path (reference cli lineage visualize surface)."""
    from baselinr_spark.plans.pipeline import run_pipeline
    from baselinr_spark.sources.pages import write_pages_warehouse

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_warehouse(spark, pages, n_docs=40, seed=7)
    run_pipeline(spark, pages, out, run_id="viz")
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    some_input = lin.select("input_path").first()["input_path"]
    res = _run(spark, out, ["lineage", "visualize", "--table", some_input,
                            "--format", "mermaid"])
    assert res and res[0]["format"] == "mermaid" and res[0]["chars"] > 0
    res = _run(spark, out, ["lineage", "visualize", "--table", some_input,
                            "--format", "dot"])
    assert res[0]["chars"] > 0
