"""Distributed BPE tokenizer-training tests (operators/bpe.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from baselinr_spark.operators.bpe import (
    apply_merge,
    bpe_train,
    bpe_vocab,
    pair_counts,
    word_symbol_table,
)


def _words(spark, *texts):
    return word_symbol_table(
        spark.createDataFrame([Row(text=t) for t in texts]), "text"
    )


def test_word_symbol_table_counts_and_chars(spark):
    w = {r["word"]: r for r in _words(spark, "ab ab cd", "Ab! x-cd").collect()}
    assert w["ab"]["cnt"] == 3  # lowercased, punctuation-split
    assert w["cd"]["cnt"] == 2
    assert w["x"]["cnt"] == 1
    assert list(w["ab"]["syms"]) == ["a", "b"]


def test_pair_counts_weighted(spark):
    pc = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in pair_counts(_words(spark, "abc abc ab")).collect()
    }
    # 'abc' cnt=2 contributes (a,b) and (b,c) twice; 'ab' cnt=1 adds (a,b)
    assert pc[("a", "b")] == 3
    assert pc[("b", "c")] == 2


def test_apply_merge_is_greedy_leftmost(spark):
    # canonical BPE: a run of four identical symbols merges into TWO
    # pairs ('aaaa' -> aa aa), a run of three into one pair + leftover
    # ('aaa' -> aa a). A shared-separator string replace gets this wrong.
    w = apply_merge(_words(spark, "aaaa aaa baab"), "a", "a")
    syms = {r["word"]: list(r["syms"]) for r in w.collect()}
    assert syms["aaaa"] == ["aa", "aa"]
    assert syms["aaa"] == ["aa", "a"]
    assert syms["baab"] == ["b", "aa", "b"]


def test_apply_merge_no_remerge_within_pass(spark):
    # merged output never chains with the next element in the same pass:
    # (a,b) on 'abb' -> [ab, b], not [ab, b]->[abb]
    w = apply_merge(_words(spark, "abb"), "a", "b")
    assert list(w.collect()[0]["syms"]) == ["ab", "b"]


def test_bpe_train_merge_sequence_and_vocab(spark):
    # corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the
    # Sennrich et al. 2016 worked example (weighted by repetition).
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([Row(text=text)])
    merges, words = bpe_train(docs, n_merges=4)
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in merges.collect()]
    # (e,s) 9 → (es,t) 9 → (est appears; next best (l,o) 7) → (lo,w) 7
    assert got[0] == (1, "e", "s", 9)
    assert got[1] == (2, "es", "t", 9)
    assert got[2] == (3, "l", "o", 7)
    assert got[3] == (4, "lo", "w", 7)
    syms = {r["word"]: list(r["syms"]) for r in words.collect()}
    assert syms["newest"] == ["n", "e", "w", "est"]
    assert syms["low"] == ["low"]
    assert syms["lower"] == ["low", "e", "r"]
    vocab = {r["symbol"]: r["total_count"] for r in bpe_vocab(words).collect()}
    assert vocab["est"] == 9
    assert vocab["low"] == 7


def test_bpe_train_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([Row(text="a b c")])
    merges, words = bpe_train(docs, n_merges=5)
    assert merges.count() == 0  # all words single-char: nothing to merge
    assert words.count() == 3


def test_bpe_plan_has_no_corpus_rescans(spark):
    # the vocab table is localCheckpointed per round: the merge plan must
    # not re-read the input relation (corpus touched exactly once).
    docs = spark.createDataFrame([Row(text="ab ab cd cd cd")])
    _, words = bpe_train(docs, n_merges=2)
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan

def test_encode_token_counts(spark):
    from baselinr_spark.operators.bpe import encode_token_counts

    text = " ".join(["low"] * 2 + ["newest"])
    docs = spark.createDataFrame([Row(doc_id=1, text=text),
                                  Row(doc_id=2, text="low")])
    merges, words = bpe_train(docs, n_merges=4)
    out = {r["doc_id"]: r for r in
           encode_token_counts(docs, "doc_id", "text", words).collect()}
    syms = {r["word"]: list(r["syms"]) for r in words.collect()}
    exp1 = 2 * len(syms["low"]) + len(syms["newest"])
    assert (out[1]["n_words"], out[1]["n_tokens"]) == (3, exp1)
    assert (out[2]["n_words"], out[2]["n_tokens"]) == (1, len(syms["low"]))
