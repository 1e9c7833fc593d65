"""BM25 retrieval (operators/bm25.py), RAKE keywords
(operators/keywords.py), readability (operators/readability.py), and
anchor-text aggregation (operators/anchors.py) — hand-computed
expectations."""

import math

import pytest
from pyspark.sql import Row

from baselinr_spark.operators.anchors import anchor_summary, anchor_top_terms
from baselinr_spark.operators.bm25 import bm25_topk, doc_lengths
from baselinr_spark.operators.keywords import candidate_phrases, rake_keywords
from baselinr_spark.operators.readability import readability


def _corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="cherry cherry date apple"),
        ]
    )


def test_doc_lengths(spark):
    dl = {r["doc_id"]: r["dl"] for r in
          doc_lengths(_corpus(spark), "doc_id", "text").collect()}
    assert dl == {1: 3, 2: 2, 3: 4}


def test_bm25_topk_hand_computed(spark):
    # N=3, avgdl=3; query {apple, date}: df(apple)=2, df(date)=1
    rows = bm25_topk(
        _corpus(spark), "doc_id", "text", ["apple", "date"], k=2
    ).collect()
    idf_apple = math.log(1 + 1.5 / 2.5)
    idf_date = math.log(1 + 2.5 / 1.5)
    # doc1: dl=3 -> norm 1.0, tf(apple)=2: idf*2*2.2/(2+1.2)
    s1 = idf_apple * 2 * 2.2 / 3.2
    # doc3: dl=4 -> norm 1.25, tf=1 each: idf*2.2/(1+1.5)
    s3 = (idf_apple + idf_date) * 2.2 / 2.5
    assert [r["doc_id"] for r in rows] == [3, 1]  # s3 > s1
    assert rows[0]["n_hit_terms"] == 2
    assert rows[0]["score"] == pytest.approx(s3)
    assert rows[1]["n_hit_terms"] == 1
    assert rows[1]["score"] == pytest.approx(s1)


def test_bm25_no_hits_empty(spark):
    assert bm25_topk(_corpus(spark), "doc_id", "text", ["zzz"]).count() == 0


_RAKE_TEXT = "Deep learning of deep networks. Learning rocks. Epic. Deep deep magic!"


def test_candidate_phrases_segmentation(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=_RAKE_TEXT)])
    got = [
        (r["phrase_id"], r["phrase"], r["phrase_len"])
        for r in candidate_phrases(df, "doc_id", "text")
        .orderBy("phrase_id").collect()
    ]
    assert got == [
        (0, "deep learning", 2),
        (1, "deep networks", 2),
        (2, "learning rocks", 2),
        (3, "epic", 1),
        (4, "deep deep magic", 3),
    ]


def test_rake_scores_and_tiebreak(spark):
    # word scores: deep deg10/freq4=2.5, learning 4/2=2, networks 2,
    # rocks 2, epic 1, magic 3
    df = spark.createDataFrame([Row(doc_id=1, text=_RAKE_TEXT)])
    rows = rake_keywords(df, "doc_id", "text", k=3).orderBy("rank").collect()
    assert [(r["rank"], r["phrase"]) for r in rows] == [
        (1, "deep deep magic"),   # 2.5+2.5+3 = 8
        (2, "deep learning"),     # 4.5, tie broken by phrase asc
        (3, "deep networks"),     # 4.5
    ]
    assert rows[0]["score"] == pytest.approx(8.0)
    assert rows[1]["score"] == pytest.approx(4.5)


def test_readability_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="The cat sat. The cat ran!"),
            Row(doc_id=2, text="Banana?"),
            Row(doc_id=3, text=""),
        ]
    )
    rows = {r["doc_id"]: r for r in
            readability(df, "doc_id", "text").collect()}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    assert r1["reading_ease"] == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1)
    assert r1["fk_grade"] == pytest.approx(0.39 * 3 + 11.8 * 1 - 15.59)
    r2 = rows[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 3)
    assert r2["reading_ease"] == pytest.approx(206.835 - 1.015 - 84.6 * 3)
    r3 = rows[3]
    assert (r3["n_words"], r3["n_sentences"], r3["n_syllables"]) == (0, 1, 0)
    assert r3["reading_ease"] == 0.0 and r3["fk_grade"] == 0.0


def _edges(spark):
    return spark.createDataFrame(
        [
            Row(src="s1", dst="t1", anchor="Best Apple pie"),
            Row(src="s2", dst="t1", anchor="apple PIE recipe"),
            Row(src="s3", dst="t1", anchor="apple"),
            Row(src="s1", dst="t2", anchor="cherry"),
            Row(src="s1", dst="t2", anchor="cherry"),
        ]
    )


def test_anchor_summary(spark):
    rows = {r["dst"]: r for r in anchor_summary(_edges(spark)).collect()}
    assert (rows["t1"]["n_inlinks"], rows["t1"]["n_distinct_anchors"],
            rows["t1"]["n_distinct_sources"]) == (3, 3, 3)
    assert (rows["t2"]["n_inlinks"], rows["t2"]["n_distinct_anchors"],
            rows["t2"]["n_distinct_sources"]) == (2, 1, 1)


def test_anchor_top_terms(spark):
    rows = [
        (r["dst"], r["rank"], r["term"], r["term_count"])
        for r in anchor_top_terms(_edges(spark), k=3)
        .orderBy("dst", "rank").collect()
    ]
    assert rows == [
        ("t1", 1, "apple", 3),
        ("t1", 2, "pie", 2),
        ("t1", 3, "best", 1),  # best < recipe on the count-1 tie
        ("t2", 1, "cherry", 2),
    ]
