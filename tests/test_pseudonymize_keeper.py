"""Tests for stable pseudonymization (functions/scrub.py:
pseudonymize_expr) and quality-aware dedup keeper selection
(operators/dedup.py:best_quality_keeper)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from baselinr_spark.functions.scrub import (
    oracle_pseudonymize_sql,
    pseudonymize_count_expr,
    pseudonymize_expr,
)
from baselinr_spark.operators.dedup import best_quality_keeper

TEXTS = [
    "contact a@x.com and b@y.com or a@x.com",
    "no pii here",
    "ends with a@x.com",
    "a@x.com starts",
    "",
    None,
]


def test_pseudonymize_stable_tokens(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "t string")
    rows = df.select(
        pseudonymize_expr(F.col("t")).alias("p"),
        pseudonymize_count_expr(F.col("t")).alias("n"),
    ).collect()
    out = rows[0]["p"]
    # same value -> same token; different value -> different token
    toks = [w for w in out.split() if w.startswith("<EMAIL:")]
    assert len(toks) == 3 and toks[0] == toks[2] and toks[0] != toks[1]
    assert rows[0]["n"] == 3
    assert rows[1]["p"] == "no pii here" and rows[1]["n"] == 0
    assert rows[4]["p"] == ""
    assert rows[5]["p"] is None and rows[5]["n"] is None


def test_pseudonymize_matches_duckdb_bytewise(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS if t is not None], "t string")
    got = [
        r["p"] for r in df.select(pseudonymize_expr(F.col("t")).alias("p")).collect()
    ]
    con = duckdb.connect()
    expr = oracle_pseudonymize_sql("t")
    want = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        for t in TEXTS
        if t is not None
    ]
    assert got == want


def test_best_quality_keeper_hand_computed(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, component long"
    )
    scores = spark.createDataFrame(
        # cluster 1: doc 2 has the best score; cluster 7: tie 0.5/0.5
        [(1, 0.2), (2, 0.9), (3, 0.4), (7, 0.5), (8, 0.5)],
        "doc_id long, q double",
    )
    out = {
        r["component"]: r
        for r in best_quality_keeper(comp, scores, "doc_id", "q").collect()
    }
    assert out[1]["keeper_id"] == 2 and out[1]["keeper_score"] == pytest.approx(0.9)
    assert out[1]["cluster_size"] == 3
    # tie breaks to the SMALLEST id
    assert out[7]["keeper_id"] == 7 and out[7]["cluster_size"] == 2
