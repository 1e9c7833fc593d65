"""Byte-identity of the scrub pass across all three implementations:
python re (oracle), pandas UDF (pipeline default), JVM regexp_replace."""

from pyspark.sql import functions as F

from baselinr_spark.functions.scrub import scrub_expr, scrub_pandas_udf, scrub_python
from baselinr_spark.sources.pages import PAGES_DDL, generate_pages_pandas


def test_scrub_python_removes_planted_pii():
    text = (
        "contact abcdef@example3.com now\n"
        "call +1-555-1234-9876 today\n"
        "server at 10.2.33.4 responded\n"
        "they said FRAKK loudly\nplain line stays"
    )
    out = scrub_python(text)
    assert out == (
        "contact <EMAIL> now\ncall <PHONE> today\n"
        "server at <IP> responded\nthey said <TOX> loudly\nplain line stays"
    )


def test_scrub_spark_paths_byte_identical(spark):
    pdf = generate_pages_pandas(200, seed=13)
    df = spark.createDataFrame(pdf, schema=PAGES_DDL)
    got = (
        df.select(
            "url",
            scrub_pandas_udf(F.col("text")).alias("s_pandas"),
            scrub_expr(F.col("text")).alias("s_native"),
        )
        .collect()
    )
    exp = {u: scrub_python(t) for u, t in zip(pdf["url"], pdf["text"])}
    assert len(got) == 200
    for r in got:
        assert r["s_pandas"] == exp[r["url"]]
        assert r["s_native"] == exp[r["url"]]


def test_scrub_null_passthrough(spark):
    df = spark.createDataFrame([("u", None)], "url string, text string")
    r = df.select(scrub_pandas_udf("text").alias("a"), scrub_expr(F.col("text")).alias("b")).first()
    assert r["a"] is None and r["b"] is None


def test_pii_cooccurrence_hand_computed(spark):
    """email+phone doc lands in the combined tier, clean doc in
    'none'; shares sum to 1; tox words are NOT PII."""
    from baselinr_spark.functions.scrub import pii_cooccurrence

    rows = [
        ("mail me a@b.example or call +1-555-0100-0000",),
        ("server at 10.0.0.1 blah",),
        ("perfectly clean text",),
        ("a@b.example only",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = {r["pii_types"]: r
           for r in pii_cooccurrence(df, "text").collect()}
    assert got["email+phone"]["n_docs"] == 1
    assert got["ipv4"]["n_docs"] == 1
    assert got["none"]["n_docs"] == 1
    assert got["email"]["n_docs"] == 1
    assert abs(sum(r["doc_share"] for r in got.values()) - 1.0) < 1e-12
