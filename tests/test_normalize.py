"""Text normalization chain (functions/normalize.py): hand-computed
expectations, idempotence, and Spark<->DuckDB byte parity on adversarial
strings."""

import duckdb
import pytest
from pyspark.sql import functions as F

from baselinr_spark.functions.normalize import (
    normalize_text_expr,
    oracle_normalize_expr_sql,
)

CASES = [
    # (raw, expected) — adversarial chars spelled as \\u escapes so the
    # fixture is reviewable and cannot be mangled by editors
    ("plain text", "plain text"),
    ("a\u2019s \u201cquote\u201d", "a's \"quote\""),
    ("x \u2013 y \u2014 z", "x - y - z"),
    ("wait\u2026", "wait..."),
    ("a\u200bb\u200cc\u200dd\ufeffe", "abcde"),
    ("nb\u00a0sp and\u202fnarrow", "nb sp and narrow"),
    ("crlf\r\nline\rend", "crlf\nline\nend"),
    ("tabs\t\tand   spaces", "tabs and spaces"),
    ("trail  \nnext", "trail\nnext"),
    ("p1\n\n\n\n\np2", "p1\n\np2"),
    ("ctrl\x01\x02\x7fgone", "ctrlgone"),
    ("  outer trim  ", "outer trim"),
    # composition: every class at once
    ("\u201cA\u201d\r\n\r\n\r\n\r\n\tB\u2026\u200b  C  ",
     '"A"\n\nB... C'),
]


def _run_spark(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               ["i", "raw"])
    rows = (df.select("i", normalize_text_expr(F.col("raw")).alias("n"))
            .orderBy("i").collect())
    return [r["n"] for r in rows]


def test_hand_computed_cases(spark):
    got = _run_spark(spark, [raw for raw, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i int, raw string")
    (row,) = df.select(normalize_text_expr(F.col("raw")).alias("n")).collect()
    assert row["n"] is None


def test_idempotent(spark):
    once = _run_spark(spark, [raw for raw, _ in CASES])
    twice = _run_spark(spark, once)
    assert once == twice


def test_duckdb_parity(spark):
    """The SQL twin must be byte-identical to the Spark chain on every
    case (NUL excluded: DuckDB strings cannot carry NUL at all)."""
    values = [raw for raw, _ in CASES]
    got_spark = _run_spark(spark, values)
    con = duckdb.connect()
    expr = oracle_normalize_expr_sql("raw")
    got_duck = []
    for v in values:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS raw", [v])
        got_duck.append(con.execute(f"SELECT {expr} FROM t").fetchone()[0])
    assert got_spark == got_duck


def test_nul_stripped_spark_side(spark):
    got = _run_spark(spark, ["a\x00b"])
    assert got == ["ab"]
