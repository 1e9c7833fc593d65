"""Tests for the final-session text/corpus operators: MOSS winnowing
fingerprints (operators/winnowing.py), script_profile / token_fertility
(operators/textanalysis.py), vocab_growth (operators/corpusstats.py),
and directed n-gram containment (operators/dedup.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.winnowing import (
    winnow_fingerprints,
    winnow_matches,
    winnow_summary,
)

K, W = 8, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    """Reference winnowing in plain Python (value-set semantics)."""
    s = " ".join(text.lower().split())
    if len(s) < k:
        return set()
    hs = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(s) - k + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank."),
    (2, "An entirely different sentence with no overlap whatsoever here."),
    # 3 quotes a >= k+w-1 = 11-char substring of doc 1 verbatim:
    (3, "He said: quick brown fox jumps over and then left quickly after."),
    (4, "short"),          # < k chars -> no fingerprints
    (5, "exactly8!"),       # 9 chars -> 2 grams (< w) -> 1 fingerprint
]


def test_fingerprints_match_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = winnow_fingerprints(df, "doc_id", "text").collect()
    by_id: dict[int, set] = {}
    for r in got:
        by_id.setdefault(r["id"], set()).add(r["fp"])
    for doc_id, text in DOCS:
        assert by_id.get(doc_id, set()) == _py_winnow(text), doc_id


def test_summary_density_and_degenerates(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = {r["id"]: r for r in winnow_summary(df, "doc_id", "text").collect()}
    # degenerate: text shorter than k
    assert rows[4]["n_grams"] == 0
    assert rows[4]["n_fingerprints"] == 0
    assert rows[4]["density"] is None
    # single-window degenerate
    assert rows[5]["n_grams"] == 2
    assert rows[5]["n_fingerprints"] == 1
    # normal doc: density within (0, 1], n_fingerprints = |py reference|
    for doc_id, text in DOCS[:3]:
        ref = _py_winnow(text)
        assert rows[doc_id]["n_fingerprints"] == len(ref)
        assert 0 < rows[doc_id]["density"] <= 1


def test_coverage_guarantee_shared_substring(spark):
    """Winnowing theorem: docs sharing a substring of length >= k+w-1
    share at least one selected fingerprint — doc 3 quotes 1, and the
    match survives winnow_matches with min_shared=1."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    fps = winnow_fingerprints(df, "doc_id", "text")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_matches(fps, min_shared=1).collect()
    }
    assert (1, 3) in pairs
    assert (1, 2) not in pairs and (2, 3) not in pairs


def test_matches_max_df_cut_removes_boilerplate(spark):
    """A fingerprint present in > max_df docs must not create pairs."""
    boiler = [(i, "this exact boilerplate footer sentence repeats everywhere")
              for i in range(10, 16)]
    df = spark.createDataFrame(boiler, "doc_id int, text string")
    fps = winnow_fingerprints(df, "doc_id", "text")
    assert winnow_matches(fps, min_shared=1, max_df=5).count() == 0
    # with the cut lifted the 6 identical docs pair up C(6,2) = 15 ways
    assert winnow_matches(fps, min_shared=1, max_df=100).count() == 15


def test_winnowing_stays_codegen(spark):
    """Per-document fingerprinting is pure expressions — no Python eval
    node in the plan (the hot path at corpus scale)."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = (
        winnow_summary(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_script_profile_dominant_and_purity(spark):
    from baselinr_spark.operators.textanalysis import script_profile

    rows = [
        (1, "hello world"),                  # pure latin
        (2, "Привет мир"),                   # pure cyrillic
        (3, "hello Привет hello again ok"),  # latin-dominant mix
        (4, "12345 !!!"),                    # no script chars at all
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in script_profile(df, "doc_id", "text").collect()}
    assert got[1]["dominant_script"] == "latin" and got[1]["script_purity"] == 1.0
    assert got[2]["dominant_script"] == "cyrillic" and got[2]["script_purity"] == 1.0
    assert got[3]["dominant_script"] == "latin"
    assert got[3]["n_latin"] == 17 and got[3]["n_cyrillic"] == 6
    assert abs(got[3]["script_purity"] - 17 / 23) < 1e-12
    assert got[4]["dominant_script"] is None and got[4]["script_purity"] is None


def test_token_fertility_hand_computed(spark):
    from baselinr_spark.operators.textanalysis import token_fertility

    rows = [
        # en: "don't stop" -> words 2; pre-tokens: don,',t,stop = 4
        (1, "en", "don't stop"),
        # en: "a b" -> words 2, tokens 2
        (2, "en", "a b"),
        # de: "straße" -> 1 word; tokens: stra,ß,e = 3
        (3, "de", "straße"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    got = {r["lang"]: r for r in token_fertility(df, "lang", "text").collect()}
    assert got["en"]["n_docs"] == 2
    assert got["en"]["n_words"] == 4 and got["en"]["n_tokens"] == 6
    assert abs(got["en"]["fertility"] - 6 / 4) < 1e-12
    assert got["de"]["n_words"] == 1 and got["de"]["n_tokens"] == 3
    assert abs(got["de"]["chars_per_token"] - 6 / 3) < 1e-12


def test_vocab_growth_first_seen_semantics(spark):
    from baselinr_spark.operators.corpusstats import vocab_growth

    rows = [
        (1, "a", "apple banana apple"),
        (2, "a", "banana cherry"),
        (3, "b", "apple durian"),      # durian is b's only new type
        (4, "c", "apple banana"),      # nothing new
    ]
    df = spark.createDataFrame(rows, "doc_id int, dt string, text string")
    got = {r["cohort"]: r for r in vocab_growth(df, "dt", "text").collect()}
    assert got["a"]["n_tokens"] == 5 and got["a"]["n_types"] == 3
    assert got["a"]["n_new_types"] == 3 and got["a"]["cum_vocab"] == 3
    assert got["b"]["n_new_types"] == 1 and got["b"]["cum_vocab"] == 4
    assert got["c"]["n_new_types"] == 0 and got["c"]["cum_vocab"] == 4
    assert abs(got["c"]["new_type_rate"]) < 1e-12


def test_ngram_containment_asymmetric_quote(spark):
    """A fragment fully contained in a superset scores containment 1.0
    in the fragment->superset direction but low the other way."""
    from baselinr_spark.operators.dedup import ngram_containment_pairs

    frag = "alpha beta gamma delta"
    sup = frag + " epsilon zeta eta theta iota kappa lamda mu nu xi"
    rows = [(1, sup), (2, frag), (3, "totally unrelated words only here")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(
            df, "doc_id", "text", shingle_n=2, threshold=0.6, max_df=100
        ).collect()
    }
    assert got[(2, 1)] == pytest.approx(1.0)   # fragment -> superset
    assert (1, 2) not in got                    # 3/13 < 0.6 threshold
    assert all(3 not in p for p in got)


def test_source_containment_hand_computed(spark):
    """Source A: 'a b c d' -> trigrams {'a b c','b c d'}; source B:
    'a b c x' -> {'a b c','b c x'}. Each direction shares exactly
    'a b c': containment 1/2 both ways, asymmetric sizes verified
    with a second B doc adding a new shingle (B grows to 3, A->B
    stays 1/2, B->A drops to 1/3)."""
    from baselinr_spark.operators.dedup import source_containment

    df = spark.createDataFrame(
        [("A", "a b c d"), ("B", "a b c x")], ["source", "text"]
    )
    got = {(r["src_a"], r["src_b"]): r
           for r in source_containment(df, "source", "text").collect()}
    assert got[("A", "B")]["n_shingles_a"] == 2
    assert got[("A", "B")]["n_common"] == 1
    assert abs(got[("A", "B")]["containment"] - 0.5) < 1e-12
    assert abs(got[("B", "A")]["containment"] - 0.5) < 1e-12

    df2 = spark.createDataFrame(
        [("A", "a b c d"), ("B", "a b c x"), ("B", "p q r")],
        ["source", "text"],
    )
    got2 = {(r["src_a"], r["src_b"]): r
            for r in source_containment(df2, "source", "text").collect()}
    assert got2[("B", "A")]["n_shingles_a"] == 3
    assert abs(got2[("B", "A")]["containment"] - 1.0 / 3.0) < 1e-12
    assert abs(got2[("A", "B")]["containment"] - 0.5) < 1e-12


def test_source_containment_short_text_and_disjoint(spark):
    """Docs with < n words fall back to the whole-text shingle (same
    spec as minhash oracles); fully disjoint sources emit no rows."""
    from baselinr_spark.operators.dedup import source_containment

    df = spark.createDataFrame(
        [("A", "hello"), ("B", "hello"), ("C", "unrelated words here")],
        ["source", "text"],
    )
    got = {(r["src_a"], r["src_b"]): r
           for r in source_containment(df, "source", "text").collect()}
    assert abs(got[("A", "B")]["containment"] - 1.0) < 1e-12
    assert not any("C" in k for k in got)
