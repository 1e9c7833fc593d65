"""Lexicon topic bucketing (operators/taxonomy.py) on hand-built docs."""

import pytest

from baselinr_spark.operators.taxonomy import lexicon_topic_scores, topic_mixture

LEX = {
    "sports": ["football", "goal", "match"],
    "finance": ["stock", "market", "bond"],
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The football match ended with a late goal"),        # sports x3
        (2, "Stock market rallies as bond yields fall"),         # finance x3
        (3, "market match"),                                     # 1-1 tie
        (4, "nothing relevant here at all"),                     # -> other
        (5, "GOAL! goal, goal."),                                # case+punct
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_topic_assignment(docs):
    got = {r["doc_id"]: r for r in
           lexicon_topic_scores(docs, "doc_id", "text", LEX).collect()}
    assert got[1]["topic"] == "sports"
    assert got[1]["hits_sports"] == 3
    assert got[2]["topic"] == "finance"
    assert got[4]["topic"] == "other"
    assert got[4]["hits_sports"] == 0 and got[4]["hits_finance"] == 0


def test_tie_breaks_to_later_label(docs):
    got = {r["doc_id"]: r for r in
           lexicon_topic_scores(docs, "doc_id", "text", LEX).collect()}
    # 1 finance hit vs 1 sports hit -> struct-max tiebreak: 'sports'
    assert got[3]["hits_sports"] == 1 and got[3]["hits_finance"] == 1
    assert got[3]["topic"] == "sports"


def test_case_and_punctuation_boundaries(docs):
    got = {r["doc_id"]: r for r in
           lexicon_topic_scores(docs, "doc_id", "text", LEX).collect()}
    assert got[5]["hits_sports"] == 3  # lowercased, \b across punctuation


def test_min_hits_threshold(docs):
    got = {r["doc_id"]: r["topic"] for r in
           lexicon_topic_scores(docs, "doc_id", "text", LEX,
                                min_hits=2).collect()}
    assert got[3] == "other"  # best count 1 < 2
    assert got[1] == "sports"


def test_mixture_shares(docs):
    scored = lexicon_topic_scores(docs, "doc_id", "text", LEX)
    mix = {r["topic"]: r for r in topic_mixture(scored).collect()}
    assert mix["sports"]["n_docs"] == 3
    assert mix["sports"]["share"] == 0.6
    assert sum(r["n_docs"] for r in mix.values()) == 5


def test_zero_shuffle_scoring(docs):
    plan = (
        lexicon_topic_scores(docs, "doc_id", "text", LEX)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
