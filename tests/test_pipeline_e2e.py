"""End-to-end: run the full pipeline over the synthetic warehouse and
compare every document against the pure-pandas reference labels
(keep/drop F1 ≥ 0.99 target from BASELINE.json; we assert exact parity
plus byte-identical scrubbed text)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from baselinr_spark.config import RULE_NAMES
from baselinr_spark.oracle.pandas_ref import reference_labels
from baselinr_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipeline_result(spark, warehouse, pages_pdf, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("out"))
    summary = run_pipeline(spark, warehouse, out_root, run_id="run-e2e")
    docs = spark.read.parquet(os.path.join(out_root, "docs")).toPandas()
    labels = reference_labels(pages_pdf)
    return summary, out_root, docs, labels


def _f1(tp: int, fp: int, fn: int) -> float:
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    return 2 * p * r / (p + r) if p + r else 0.0


def test_keep_f1(pipeline_result):
    _, _, docs, labels = pipeline_result
    merged = docs.merge(labels, on="url", validate="1:1")
    assert len(merged) == len(labels)
    tp = int(((merged.keep) & (merged.expected_keep)).sum())
    fp = int(((merged.keep) & (~merged.expected_keep)).sum())
    fn = int(((~merged.keep) & (merged.expected_keep)).sum())
    assert _f1(tp, fp, fn) >= 0.99
    # drop reasons match exactly
    for _, row in merged.iterrows():
        assert list(row["drop_reasons"]) == list(row["expected_drop_reasons"]), row["url"]


def test_scrubbed_text_byte_identical(pipeline_result):
    _, _, docs, labels = pipeline_result
    merged = docs.merge(labels, on="url", validate="1:1")
    for _, row in merged.iterrows():
        assert row["scrubbed_text"] == row["expected_scrubbed_text"], row["url"]


def test_lang_and_perplexity_match(pipeline_result):
    _, _, docs, labels = pipeline_result
    merged = docs.merge(labels, on="url", validate="1:1")
    assert (merged["lang"] == merged["expected_lang"]).all()
    diff = (merged["perplexity"] - merged["expected_perplexity"]).abs()
    rel = diff / merged["expected_perplexity"].abs().clip(lower=1e-12)
    assert float(rel.max()) < 1e-9


def test_metrics_table(pipeline_result, spark):
    summary, out_root, docs, _ = pipeline_result
    m = spark.read.parquet(os.path.join(out_root, "metrics"))
    pdf = m.toPandas()
    parts = sorted(docs["dt"].astype(str).unique())
    assert sorted(pdf["partition"].unique()) == parts
    counts = pdf[pdf.metric_name == "count"].set_index("partition")["metric_value"]
    real = docs.groupby(docs["dt"].astype(str)).size()
    for p in parts:
        assert int(counts[p]) == int(real[p])
    kr = pdf[pdf.metric_name == "keep_rate"]["metric_value"]
    assert ((kr >= 0) & (kr <= 1)).all()
    # histogram rows parse and cover all docs with non-null ppl
    hist = pdf[pdf.metric_name == "perplexity_histogram"]
    assert len(hist) == len(parts)
    for _, row in hist.iterrows():
        bins = json.loads(row["metric_json"])
        assert sum(b["count"] for b in bins) == int(real[row["partition"]])
    # rule fire rate rows exist for every rule
    for r in RULE_NAMES:
        assert (pdf.metric_name == f"rule_fire_rate:{r}").any()


def test_events_and_lineage(pipeline_result, spark):
    summary, out_root, docs, _ = pipeline_result
    ev = spark.read.parquet(os.path.join(out_root, "events")).toPandas()
    parts = sorted(docs["dt"].astype(str).unique())
    # PSI exists for every cohort with a predecessor
    assert sorted(ev["partition"].unique()) == parts[1:]
    assert set(ev["severity"]).issubset({"none", "low", "medium", "high"})
    lin = spark.read.parquet(os.path.join(out_root, "lineage")).toPandas()
    assert sorted(lin["partition"]) == parts
    assert int(lin["doc_count"].sum()) == len(docs)
    assert int(lin["kept_count"].sum()) == int(docs["keep"].sum())


def test_summary(pipeline_result):
    summary, _, docs, labels = pipeline_result
    assert summary["doc_count"] == len(labels)
    assert summary["kept_count"] == int(docs["keep"].sum())
    assert summary["partitions_skipped"] == 0
