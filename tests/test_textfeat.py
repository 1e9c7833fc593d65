"""Spark native-expression features vs the independent pandas oracle."""

import math

from pyspark.sql import functions as F

from baselinr_spark.functions.textfeat import FEATURE_COLS, with_features
from baselinr_spark.oracle.pandas_ref import doc_features
from baselinr_spark.sources.pages import PAGES_DDL, generate_pages_pandas


def test_features_match_oracle(spark):
    pdf = generate_pages_pandas(150, seed=11)
    df = spark.createDataFrame(pdf, schema=PAGES_DDL)
    got = {r["url"]: r.asDict() for r in with_features(df).collect()}
    assert len(got) == len(pdf)
    for _, row in pdf.iterrows():
        exp = doc_features(row["text"])
        g = got[row["url"]]
        for k in FEATURE_COLS:
            assert math.isclose(float(g[k]), float(exp[k]), rel_tol=1e-12, abs_tol=1e-12), (
                row["url"], k, g[k], exp[k])


def test_features_edge_cases(spark):
    rows = [
        ("u1", ""),            # empty
        ("u2", "   \n\n  "),   # whitespace only
        ("u3", "one"),
        ("u4", None),          # null text
        ("u5", "a\na\na\nb"),  # dup lines 2/4 distinct
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["url"]: r.asDict() for r in with_features(df).collect()}
    assert got["u1"]["n_words"] == 0 and got["u1"]["mean_word_length"] == 0.0
    assert got["u2"]["n_words"] == 0 and got["u2"]["dup_line_fraction"] == 0.0
    assert got["u3"]["n_words"] == 1 and got["u3"]["mean_word_length"] == 3.0
    assert got["u4"]["n_words"] == 0
    assert abs(got["u5"]["dup_line_fraction"] - 0.5) < 1e-12
    for u, t in rows:
        exp = doc_features(t)
        for k in FEATURE_COLS:
            assert math.isclose(float(got[u][k]), float(exp[k]), abs_tol=1e-12)
