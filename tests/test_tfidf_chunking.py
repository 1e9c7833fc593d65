"""TF-IDF weighting (operators/tfidf.py) and sliding-window chunking
(operators/chunking.py) — hand-computed expectations."""

import math

import pytest
from pyspark.sql import Row

from baselinr_spark.operators.chunking import chunk_documents
from baselinr_spark.operators.tfidf import (
    doc_term_freqs,
    term_idf,
    tfidf_topk,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana APPLE"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="cherry cherry date"),
        ]
    )


def test_doc_term_freqs_lowercases_and_counts(spark):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_term_freqs(_corpus(spark), "doc_id", "text").collect()
    }
    assert tf[(1, "apple")] == 2  # APPLE folded into apple
    assert tf[(1, "banana")] == 1
    assert tf[(3, "cherry")] == 2
    assert len(tf) == 6


def test_term_idf_smoothed(spark):
    idf = {
        r["term"]: (r["doc_freq"], r["idf"])
        for r in term_idf(_corpus(spark), "doc_id", "text").collect()
    }
    # N=3: df=1 -> ln(4/2)+1, df=2 -> ln(4/3)+1
    assert idf["apple"][0] == 1
    assert idf["apple"][1] == pytest.approx(math.log(2.0) + 1)
    assert idf["banana"][0] == 2
    assert idf["banana"][1] == pytest.approx(math.log(4.0 / 3.0) + 1)
    assert idf["cherry"] == idf["banana"]
    assert idf["date"] == idf["apple"]


def test_tfidf_topk_scores_and_tiebreak(spark):
    rows = {
        (r["doc_id"], r["rank"]): r
        for r in tfidf_topk(_corpus(spark), "doc_id", "text", k=2).collect()
    }
    # doc 1: apple tf2*ln2+1 beats banana
    assert rows[(1, 1)]["term"] == "apple"
    assert rows[(1, 1)]["tfidf"] == pytest.approx(2 * (math.log(2.0) + 1))
    assert rows[(1, 2)]["term"] == "banana"
    # doc 2: banana and cherry tie on score -> term asc
    assert rows[(2, 1)]["term"] == "banana"
    assert rows[(2, 2)]["term"] == "cherry"
    # doc 3: cherry tf2 first, then date
    assert rows[(3, 1)]["term"] == "cherry"
    assert rows[(3, 2)]["term"] == "date"
    assert len(rows) == 6


def test_chunking_layout(spark):
    toks10 = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=toks10),
            Row(doc_id=2, text="a b c"),
            Row(doc_id=3, text="x0 x1 x2 x3 x4"),
            Row(doc_id=4, text=""),
            Row(doc_id=5, text=None),
        ]
    )
    out = chunk_documents(
        df, "doc_id", "text", chunk_tokens=4, overlap_tokens=1
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r for r in out.collect()
    }
    # doc 1: n=10, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert [k[1] for k in sorted(rows) if k[0] == 1] == [0, 1, 2]
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["token_start"] == 3
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9"
    # doc 2: n=3 <= 4 -> one full-copy chunk
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert rows[(2, 0)]["n_chunk_tokens"] == 3
    assert (2, 1) not in rows
    # doc 3: n=5 -> 2 chunks, second is a short tail
    assert rows[(3, 0)]["chunk_text"] == "x0 x1 x2 x3"
    assert rows[(3, 1)]["chunk_text"] == "x3 x4"
    assert rows[(3, 1)]["n_chunk_tokens"] == 2
    # empty / null text: one empty chunk, row never dropped
    for d in (4, 5):
        assert rows[(d, 0)]["n_chunk_tokens"] == 0
        assert rows[(d, 0)]["chunk_text"] == ""


def test_chunking_overlap_must_be_smaller(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap_tokens=4)


def test_chunking_reconstruction_no_overlap(spark):
    """With overlap 0 the chunks partition the token stream exactly."""
    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = chunk_documents(
        df, "doc_id", "text", chunk_tokens=5, overlap_tokens=0
    ).orderBy("chunk_id")
    chunks = [r["chunk_text"] for r in out.collect()]
    assert len(chunks) == 5  # 23 tokens / 5 -> 4 full + 1 tail of 3
    assert " ".join(chunks) == text


def test_char_entropy_hand_cases(spark):
    from baselinr_spark.operators.textanalysis import char_entropy

    rows = [
        Row(doc_id=1, text="aaaa"),        # one symbol -> 0 bits
        Row(doc_id=2, text="abab"),        # uniform over 2 -> 1 bit
        Row(doc_id=3, text="abcd"),        # uniform over 4 -> 2 bits
        Row(doc_id=4, text="aab"),         # 2/3,1/3 -> ~0.9183 bits
        Row(doc_id=5, text=""),
        Row(doc_id=6, text=None),
    ]
    out = {
        r["doc_id"]: r
        for r in char_entropy(
            spark.createDataFrame(rows), "doc_id", "text"
        ).collect()
    }
    assert out[1]["entropy_bits"] == pytest.approx(0.0)
    assert out[1]["n_distinct_chars"] == 1
    assert out[2]["entropy_bits"] == pytest.approx(1.0)
    assert out[3]["entropy_bits"] == pytest.approx(2.0)
    expected = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert out[4]["entropy_bits"] == pytest.approx(expected)
    for d in (5, 6):
        assert out[d]["entropy_bits"] == 0.0
        assert out[d]["n_chars"] == 0
