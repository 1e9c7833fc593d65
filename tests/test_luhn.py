"""Tests for Luhn payment-card detection (functions/scrub.py:
luhn_valid_expr / cc_scan_exprs)."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.functions.scrub import cc_scan_exprs, luhn_valid_expr

# classic public test numbers
VALID = [
    "4111111111111111",   # Visa 16
    "378282246310005",    # Amex 15
    "6011111111111117",   # Discover 16
    "4222222222222",      # Visa 13
]
INVALID = ["4111111111111112", "1234567890123456", "378282246310006"]


def test_luhn_validates_known_numbers(spark):
    rows = [(d, True) for d in VALID] + [(d, False) for d in INVALID]
    df = spark.createDataFrame(rows, "digits string, expect boolean")
    got = df.select("digits", "expect", luhn_valid_expr(F.col("digits")).alias("ok")).collect()
    for r in got:
        assert r["ok"] == r["expect"], r["digits"]


def test_cc_scan_counts_and_separators(spark):
    rows = [
        ("pay with 4111 1111 1111 1111 today", 1, 1),
        ("fake 4111-1111-1111-1112 number", 1, 0),
        ("two cards 378282246310005 and 6011111111111117 listed", 2, 2),
        ("short digits 12345 and a year 2026", 0, 0),
        ("no digits at all", 0, 0),
    ]
    df = spark.createDataFrame(rows, "text string, want_cand int, want_valid int")
    n_cand, n_valid = cc_scan_exprs(F.col("text"))
    got = df.select("want_cand", "want_valid", n_cand.alias("c"), n_valid.alias("v")).collect()
    for r in got:
        assert r["c"] == r["want_cand"]
        assert r["v"] == r["want_valid"]


def test_cc_scan_digit_length_bounds(spark):
    # 12 digits (too short) and 20 digits (too long) are not candidates
    rows = [("card 411111111111 x", ), ("card 41111111111111111110 x",)]
    df = spark.createDataFrame(rows, "text string")
    n_cand, _ = cc_scan_exprs(F.col("text"))
    assert [r["c"] for r in df.select(n_cand.alias("c")).collect()] == [0, 0]


def test_cc_rule_optin_pipeline(spark):
    """cc_rule=True drops a doc carrying a Luhn-valid card; the default
    config neither computes the columns nor changes keep/drop."""
    from baselinr_spark.config import FilterConfig
    from baselinr_spark.plans.pipeline import transform_pages
    from baselinr_spark.sources.pages import generate_pages_pandas

    pdf = generate_pages_pandas(40, seed=7)
    # plant a valid card into one otherwise-kept doc's text
    base = spark.createDataFrame(pdf)
    planted = base.withColumn(
        "text",
        F.when(
            F.col("url") == pdf.url.iloc[0],
            F.concat(F.col("text"), F.lit(" pay 4111 1111 1111 1111 now")),
        ).otherwise(F.col("text")),
    )

    default_df = transform_pages(spark, planted)
    assert "rule_cc_numbers" not in default_df.columns
    default_out = default_df.select("url", "keep", "drop_reasons")

    cc_out = transform_pages(
        spark, planted, cfg=FilterConfig(cc_rule=True)
    ).select("url", "keep", "drop_reasons", "rule_cc_numbers")

    d = {r["url"]: r for r in default_out.collect()}
    c = {r["url"]: r for r in cc_out.collect()}
    u0 = pdf.url.iloc[0]
    assert c[u0]["rule_cc_numbers"]
    assert "cc_numbers" in c[u0]["drop_reasons"] and not c[u0]["keep"]
    # every other doc's verdict is untouched by the opt-in rule
    for u in d:
        if u == u0:
            continue
        assert c[u]["keep"] == d[u]["keep"]
        assert not c[u]["rule_cc_numbers"]


# --- IBAN (ISO 13616 + ISO 7064 mod-97) ---

# public example IBANs from the ISO 13616 registry
IBAN_VALID = [
    "GB82WEST12345698765432",
    "DE89370400440532013000",
    "FR1420041010050500013M02606",   # letters inside the BBAN
    "MT84MALT011000012345MTLCAST001S",  # 31 chars (longest registry entry)
]
IBAN_INVALID = ["GB82WEST12345698765431", "DE89370400440532013001",
                "GB00WEST12345698765432"]


def _py_iban_mod97(iban: str) -> int:
    s = iban[4:] + iban[:4]
    return int("".join(str(int(ch, 36)) for ch in s)) % 97


def test_iban_mod97_matches_bigint_reference(spark):
    from baselinr_spark.functions.scrub import iban_mod97_expr

    all_ibans = IBAN_VALID + IBAN_INVALID
    df = spark.createDataFrame([(i,) for i in all_ibans], "iban string")
    got = {r["iban"]: r["m"] for r in
           df.select("iban", iban_mod97_expr(F.col("iban")).alias("m")).collect()}
    for i in all_ibans:
        assert got[i] == _py_iban_mod97(i), i


def test_iban_valid_expr(spark):
    from baselinr_spark.functions.scrub import iban_valid_expr

    rows = [(i, True) for i in IBAN_VALID] + [(i, False) for i in IBAN_INVALID]
    df = spark.createDataFrame(rows, "iban string, expect boolean")
    for r in df.select("expect", iban_valid_expr(F.col("iban")).alias("ok")).collect():
        assert r["ok"] == r["expect"]


def test_iban_scan_counts(spark):
    from baselinr_spark.functions.scrub import iban_scan_exprs

    rows = [
        ("send to GB82WEST12345698765432 please", 1, 1),
        ("typo GB82WEST12345698765431 here", 1, 0),
        ("two GB82WEST12345698765432 and DE89370400440532013000", 2, 2),
        ("lowercase gb82west12345698765432 is prose", 0, 0),
        ("no accounts here", 0, 0),
        ("short GB82WEST1234 is not an iban", 0, 0),
    ]
    df = spark.createDataFrame(rows, "text string, e_cand int, e_valid int")
    n_cand, n_valid = iban_scan_exprs(F.col("text"))
    got = df.select("e_cand", "e_valid", n_cand.alias("c"), n_valid.alias("v")).collect()
    for r in got:
        assert (r["c"], r["v"]) == (r["e_cand"], r["e_valid"])


def test_iban_scan_stays_codegen(spark):
    """The scan must be pure expressions — no BatchEvalPython /
    ArrowEvalPython node (row-Python in the PII hot path is the
    north-rule anti-pattern)."""
    from baselinr_spark.functions.scrub import iban_scan_exprs

    df = spark.createDataFrame([("x GB82WEST12345698765432",)], "text string")
    n_cand, n_valid = iban_scan_exprs(F.col("text"))
    plan = df.select(n_cand.alias("c"), n_valid.alias("v")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
