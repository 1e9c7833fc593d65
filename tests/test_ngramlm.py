"""Unit tests for the corpus-trained n-gram LM (operators/ngramlm.py):
hand-computed add-k probabilities on a tiny corpus, edge cases (empty /
single-token docs), and the external-train path."""

import math

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.ngramlm import (
    bigram_counts,
    lm_perplexity,
    unigram_counts,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    # tokens: doc1=[a,b,a], doc2=[b,a], doc3=[a], doc4=[]  (digits drop)
    return spark.createDataFrame(
        [(1, "A b a"), (2, "b a"), (3, "a!"), (4, "123 .")],
        ["doc_id", "text"],
    )


def test_unigram_counts(spark, tiny_docs):
    got = {r["gram"]: r["cnt"] for r in unigram_counts(tiny_docs).collect()}
    assert got == {"a": 4, "b": 2}


def test_bigram_counts(spark, tiny_docs):
    got = {(r["prev"], r["gram"]): r["cnt"]
           for r in bigram_counts(tiny_docs).collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_lm_perplexity_hand_computed(spark, tiny_docs):
    # V=2 distinct tokens, N=6 total tokens, k=0.5
    # c(a)=4, c(b)=2, c(a,b)=1, c(b,a)=2
    k, V, N = 0.5, 2.0, 6.0
    p_first_a = (4 + k) / (N + k * V)          # first-token unigram model
    p_first_b = (2 + k) / (N + k * V)
    p_ab = (1 + k) / (4 + k * V)               # p(b|a)
    p_ba = (2 + k) / (2 + k * V)               # p(a|b)

    exp_lp = {
        1: math.log(p_first_a) + math.log(p_ab) + math.log(p_ba),
        2: math.log(p_first_b) + math.log(p_ba),
        3: math.log(p_first_a),
    }
    rows = {r["doc_id"]: r for r in
            lm_perplexity(tiny_docs, "doc_id", "text", k=k).collect()}

    assert rows[1]["n_tokens"] == 3
    assert rows[2]["n_tokens"] == 2
    assert rows[3]["n_tokens"] == 1
    for d, lp in exp_lp.items():
        assert rows[d]["log_prob"] == pytest.approx(lp, rel=1e-9)
        t = rows[d]["n_tokens"]
        assert rows[d]["perplexity"] == pytest.approx(
            math.exp(-lp / t), rel=1e-9)

    # empty doc: no tokens → NULL log_prob and perplexity
    assert rows[4]["n_tokens"] == 0
    assert rows[4]["log_prob"] is None
    assert rows[4]["perplexity"] is None


def test_lm_perplexity_external_train(spark, tiny_docs):
    """Scoring a doc with an unseen token against an external train
    corpus exercises the coalesce(cnt,0) unseen-gram path."""
    score = spark.createDataFrame([(10, "a z")], ["doc_id", "text"])
    k, V, N = 0.5, 2.0, 6.0
    p_first_a = (4 + k) / (N + k * V)
    p_az = (0 + k) / (4 + k * V)               # unseen bigram, known prev
    lp = math.log(p_first_a) + math.log(p_az)

    row = lm_perplexity(score, "doc_id", "text",
                        train=tiny_docs, k=k).collect()[0]
    assert row["n_tokens"] == 2
    assert row["log_prob"] == pytest.approx(lp, rel=1e-9)
    assert row["perplexity"] == pytest.approx(math.exp(-lp / 2), rel=1e-9)


def test_lm_self_train_is_default(spark, tiny_docs):
    a = lm_perplexity(tiny_docs, "doc_id", "text").collect()
    b = lm_perplexity(tiny_docs, "doc_id", "text", train=tiny_docs).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_lower_perplexity_for_in_distribution_text(spark):
    """A doc repeating the corpus's dominant pattern scores lower ppl
    than one made of rare transitions — the CCNet-selection premise."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)]
        + [(100, "the cat sat on the mat"), (101, "mat the on sat cat the")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["perplexity"]
            for r in lm_perplexity(docs, "doc_id", "text").collect()}
    assert rows[100] < rows[101]


def test_moore_lewis_hand_computed(spark):
    """In-domain = docs 1-2 ("a b" pattern); doc 3 repeats the pattern,
    doc 4 is background-only ("x y"). The in-domain-looking doc must
    score lower (more negative CE difference) than the background doc,
    and every component must equal the hand-computed add-k value."""
    from baselinr_spark.operators.ngramlm import (
        lm_perplexity,
        moore_lewis_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "x y")],
        ["doc_id", "text"],
    )
    in_dom = docs.filter(F.col("doc_id") <= 2)
    got = {r["doc_id"]: r
           for r in moore_lewis_scores(docs, "doc_id", "text",
                                       in_dom).collect()}
    assert set(got) == {1, 2, 3, 4}
    # components must agree with the two lm_perplexity passes
    pin = {r["doc_id"]: r for r in
           lm_perplexity(docs, "doc_id", "text", train=in_dom).collect()}
    pgen = {r["doc_id"]: r for r in
            lm_perplexity(docs, "doc_id", "text").collect()}
    for d in (1, 2, 3, 4):
        ce_in = -pin[d]["log_prob"] / pin[d]["n_tokens"]
        ce_gen = -pgen[d]["log_prob"] / pgen[d]["n_tokens"]
        assert got[d]["ce_in"] == pytest.approx(ce_in, rel=1e-12)
        assert got[d]["ce_gen"] == pytest.approx(ce_gen, rel=1e-12)
        assert got[d]["ml_score"] == pytest.approx(ce_in - ce_gen,
                                                   rel=1e-12)
    # the selection property: in-domain text ranks before background
    assert got[3]["ml_score"] < got[4]["ml_score"]
    # hand check one component: in-domain LM has V=2, N=4, c(a)=2,
    # c(b)=2, c(a,b)=2; doc 3 = [a, b]
    k = 0.5
    lp = math.log((2 + k) / (4 + k * 2)) + math.log((2 + k) / (2 + k * 2))
    assert got[3]["ce_in"] == pytest.approx(-lp / 2, rel=1e-12)


def test_moore_lewis_drops_empty_docs(spark):
    from baselinr_spark.operators.ngramlm import moore_lewis_scores

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "123 .")], ["doc_id", "text"]
    )
    out = moore_lewis_scores(docs, "doc_id", "text", docs).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_oov_rate_hand_computed(spark):
    """Vocab from docs 1-2 with min_count=2 keeps only 'a' (c=2; 'b'
    has c=1): doc 3 = [a, b, z] → 2 of 3 tokens OOV."""
    from baselinr_spark.operators.ngramlm import oov_rate

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "a b z")], ["doc_id", "text"]
    )
    vtrain = docs.filter(F.col("doc_id") <= 2)
    got = {r["doc_id"]: r
           for r in oov_rate(docs, "doc_id", "text", vtrain,
                             min_count=2).collect()}
    assert got[3]["n_tokens"] == 3 and got[3]["n_oov"] == 2
    assert got[3]["oov_rate"] == pytest.approx(2 / 3, rel=1e-12)
    assert got[1]["n_oov"] == 1  # 'b' fell under min_count
    assert got[2]["n_oov"] == 0 and got[2]["oov_rate"] == 0.0
