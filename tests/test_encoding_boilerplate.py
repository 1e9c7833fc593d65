"""Encoding-quality signals (functions/encoding.py) and per-domain
boilerplate removal (operators/boilerplate.py) — hand-computed cases."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from baselinr_spark.functions.encoding import with_encoding_features
from baselinr_spark.operators.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)


def test_encoding_features_hand_cases(spark):
    rows = [
        Row(doc_id=0, text="a clean ascii document"),
        # mojibake: caf(Ã©) = 1 artifact; it(â€™)s = 1 artifact
        Row(doc_id=1, text="cafÃ© open"),
        Row(doc_id=2, text="itâ€™s a test â€“dash"),
        # replacement chars: 3 of 10 chars -> bad fraction 0.3
        Row(doc_id=3, text="bad���text"),
        # control chars (BEL, VT) but tab/newline exempt
        Row(doc_id=4, text="a\x07b\x0bc\td\ne"),
        Row(doc_id=5, text=None),
        Row(doc_id=6, text=""),
    ]
    out = {
        r["doc_id"]: r
        for r in with_encoding_features(
            spark.createDataFrame(rows), "text"
        ).collect()
    }
    assert (out[0]["replacement_count"], out[0]["control_count"],
            out[0]["mojibake_count"]) == (0, 0, 0)
    assert out[0]["encoding_ok"] is True

    assert out[1]["mojibake_count"] == 1
    assert out[2]["mojibake_count"] == 2  # â€™ and â€“
    assert out[2]["encoding_ok"] is True  # <= 2 artifacts tolerated

    assert out[3]["replacement_count"] == 3
    assert abs(out[3]["bad_char_fraction"] - 0.3) < 1e-9
    assert out[3]["encoding_ok"] is False

    assert out[4]["control_count"] == 2  # BEL + VT; tab/newline exempt
    assert out[4]["encoding_ok"] is False  # 2/9 > 1%

    assert out[5]["encoding_ok"] is True and out[5]["mojibake_count"] == 0
    assert out[6]["encoding_ok"] is True


def _boiler_df(spark):
    # domain d1: header in 3/3 docs, footer in 2/3; domain d2: 1 doc
    rows = [
        Row(doc_id=1, domain="d1",
            text="HEADER MENU\nunique alpha content\nCOPYRIGHT FOOTER"),
        Row(doc_id=2, domain="d1",
            text="HEADER MENU\nunique beta content\nCOPYRIGHT FOOTER"),
        Row(doc_id=3, domain="d1",
            text="HEADER MENU\nunique gamma content"),
        Row(doc_id=4, domain="d2",
            text="HEADER MENU\nlonely page body"),
    ]
    return spark.createDataFrame(rows)


def test_boilerplate_lines_stats(spark):
    stats = {
        (r["domain"], r["line"]): r
        for r in boilerplate_lines(
            _boiler_df(spark), "doc_id", "domain", "text",
            min_frac=0.6, min_docs=2,
        ).collect()
    }
    hdr = stats[("d1", "HEADER MENU")]
    assert (hdr["doc_freq"], hdr["group_docs"]) == (3, 3)
    assert hdr["is_boilerplate"] is True
    ftr = stats[("d1", "COPYRIGHT FOOTER")]
    assert ftr["doc_freq"] == 2 and ftr["is_boilerplate"] is True
    assert stats[("d1", "unique alpha content")]["is_boilerplate"] is False
    # d2 has one doc: min_docs=2 blocks the 100% header
    assert stats[("d2", "HEADER MENU")]["is_boilerplate"] is False


def test_strip_boilerplate_reassembly(spark):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _boiler_df(spark), "doc_id", "domain", "text",
            min_frac=0.6, min_docs=2,
        ).collect()
    }
    assert out[1]["text_clean"] == "unique alpha content"
    assert (out[1]["n_lines"], out[1]["n_dropped"]) == (3, 2)
    assert out[3]["text_clean"] == "unique gamma content"
    assert out[3]["n_dropped"] == 1
    # d2 untouched (min_docs): original two lines survive in order
    assert out[4]["text_clean"] == "HEADER MENU\nlonely page body"
    assert out[4]["n_dropped"] == 0


def test_strip_boilerplate_short_lines_exempt(spark):
    # "---" (3 chars) appears in every doc but is under min_line_chars
    rows = [
        Row(doc_id=1, domain="d", text="---\nreal body one here"),
        Row(doc_id=2, domain="d", text="---\nreal body two here"),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            spark.createDataFrame(rows), "doc_id", "domain", "text",
            min_frac=0.5, min_docs=2, min_line_chars=5,
        ).collect()
    }
    assert out[1]["text_clean"] == "---\nreal body one here"
    assert out[1]["n_dropped"] == 0
