"""Tests for corpus-level line dedup, paragraph dedup, and
training-data selection (DSIR, temperature mixture, domain ops)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from baselinr_spark.operators.linededup import line_dedup, paragraph_dedup
from baselinr_spark.operators.selection import (
    domain_blocklist_filter,
    domain_stats,
    dsir_log_weights,
    dsir_resample,
    temperature_mixture_rates,
    temperature_mixture_sample,
)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="unique first line here\nshared boilerplate line\nx"),
            Row(doc_id=2, text="shared boilerplate line\nanother unique line two"),
            Row(doc_id=3, text="shared boilerplate line\nshared boilerplate line"),
            Row(doc_id=4, text="tiny\nok"),
        ]
    )


def test_line_dedup_keeps_first_occurrence(pages):
    out = {r["doc_id"]: r for r in line_dedup(pages, "doc_id", "text").collect()}
    # doc 1 holds the first occurrence of the shared line; 'x' is short → kept
    assert out[1]["text_dedup"] == "unique first line here\nshared boilerplate line\nx"
    assert out[1]["n_lines_dropped"] == 0
    # doc 2 loses the repeat, keeps its unique line
    assert out[2]["text_dedup"] == "another unique line two"
    assert out[2]["n_lines_dropped"] == 1
    # doc 3 loses both occurrences (both are corpus repeats)
    assert out[3]["text_dedup"] == ""
    assert out[3]["n_lines_dropped"] == 2
    # doc 4: both lines below min_line_chars → untouched
    assert out[4]["text_dedup"] == "tiny\nok"
    assert out[4]["n_lines_dropped"] == 0


def test_line_dedup_no_vanishing_docs(pages):
    assert line_dedup(pages, "doc_id", "text").count() == pages.count()


def test_paragraph_dedup_order_preserving(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="b\na\nb\nc\na"), Row(doc_id=2, text="solo")]
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text_dedup"] == "b\na\nc"
    assert out[1]["n_paras_dropped"] == 2
    assert out[2]["text_dedup"] == "solo"
    assert out[2]["n_paras_dropped"] == 0


@pytest.fixture(scope="module")
def mini_corpus(spark):
    rows = []
    for i in range(40):
        if i % 4 == 0:
            rows.append(Row(doc_id=i, lang="en", source=f"src{i % 3}",
                            text="the quick brown fox jumps over the lazy dog"))
        else:
            rows.append(Row(doc_id=i, lang="de" if i % 2 else "fr",
                            source=f"src{i % 3}",
                            text=f"zzz qqq www token{i} noise noise noise"))
    return spark.createDataFrame(rows)


def test_dsir_weights_upweight_target_like_docs(mini_corpus):
    w = dsir_log_weights(
        mini_corpus, "doc_id", "text", F.col("lang") == "en", n_buckets=64
    ).collect()
    by_id = {r["doc_id"]: r["log_weight"] for r in w}
    target_like = [v for k, v in by_id.items() if k % 4 == 0]
    rest = [v for k, v in by_id.items() if k % 4 != 0]
    assert min(target_like) > max(rest)
    assert all(math.isfinite(v) for v in by_id.values())


def test_dsir_resample_deterministic_topk(mini_corpus):
    w = dsir_log_weights(
        mini_corpus, "doc_id", "text", F.col("lang") == "en", n_buckets=64
    )
    a = [r["doc_id"] for r in dsir_resample(w, "doc_id", k=5).collect()]
    b = [r["doc_id"] for r in dsir_resample(w, "doc_id", k=5).collect()]
    assert a == b and len(a) == 5
    # softmax-weighted sampling should pick mostly target-like docs
    assert sum(1 for d in a if d % 4 == 0) >= 4


def test_temperature_rates_upweight_tail(mini_corpus):
    rates = {
        r["lang"]: r
        for r in temperature_mixture_rates(
            mini_corpus, "lang", alpha=0.3, target_total=20
        ).collect()
    }
    # mix probabilities sum to 1; minority langs get rate boosts
    assert abs(sum(r["mix_prob"] for r in rates.values()) - 1.0) < 1e-9
    # en has 10 docs, de 15, fr 15 → alpha<1 compresses: en rate > de rate
    assert rates["en"]["sample_rate"] > rates["de"]["sample_rate"]
    for r in rates.values():
        assert 0.0 < r["sample_rate"] <= 1.0


def test_temperature_sample_deterministic_and_bounded(mini_corpus):
    s1 = temperature_mixture_sample(
        mini_corpus, "doc_id", "lang", alpha=0.3, target_total=20
    )
    a = sorted(r["doc_id"] for r in s1.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture_sample(
            mini_corpus, "doc_id", "lang", alpha=0.3, target_total=20
        ).collect()
    )
    assert a == b
    assert 0 < len(a) <= 40


def test_domain_stats_and_blocklist(mini_corpus, spark):
    stats = {r["source"]: r for r in domain_stats(mini_corpus, "source", "text").collect()}
    assert abs(sum(r["corpus_share"] for r in stats.values()) - 1.0) < 1e-9
    assert stats["src0"]["n_docs"] == 14
    block = spark.createDataFrame([Row(source="src0")])
    kept = domain_blocklist_filter(mini_corpus, "source", block)
    assert kept.count() == 40 - 14
    assert kept.filter(F.col("source") == "src0").count() == 0


def test_duplicate_spans_detects_planted_overlap(spark):
    from baselinr_spark.operators.dedup import duplicate_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        Row(doc_id=1, text="one two three " + shared + " four five six"),
        Row(doc_id=2, text="seven eight " + shared + " nine ten"),
        Row(doc_id=3, text="totally different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows)
    spans = duplicate_spans(df, "doc_id", "text", shingle_n=8, min_docs=2)
    out = {r["id"]: r for r in spans.collect()}
    # docs 1 and 2 share a 10-word run -> 3 consecutive 8-shingles each
    assert set(out) == {1, 2}
    # doc 1: shared words occupy positions 3..12
    assert out[1]["span_start"] == 3 and out[1]["span_end"] == 12
    assert out[1]["n_shingles"] == 3
    # doc 2: shared words occupy positions 2..11
    assert out[2]["span_start"] == 2 and out[2]["span_end"] == 11


def test_duplicate_spans_merges_islands(spark):
    from baselinr_spark.operators.dedup import duplicate_spans

    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "x1 x2 x3 x4 x5 x6 x7 x8"
    rows = [
        Row(doc_id=1, text=a + " gapword gapword2 gapword3 " + b),
        Row(doc_id=2, text=a), Row(doc_id=3, text=b),
    ]
    spans = duplicate_spans(
        spark.createDataFrame(rows), "doc_id", "text", shingle_n=8, min_docs=2
    )
    doc1 = sorted(
        [(r["span_start"], r["span_end"]) for r in spans.collect() if r["id"] == 1]
    )
    # two separate islands, not merged across the gap
    assert doc1 == [(0, 7), (11, 18)]


def test_duplicate_spans_disjoint_when_gap_under_shingle(spark):
    """Duplicated start positions closer than shingle_n have overlapping
    word coverage and must merge into ONE span — summing span lengths
    then equals the true duplicated-word footprint (no double count)."""
    from baselinr_spark.operators.dedup import duplicate_spans

    w = [f"w{i}" for i in range(12)]
    rows = [
        Row(doc_id=1, text=" ".join(w)),          # positions 0..11
        Row(doc_id=2, text=" ".join(w[:8])),      # shares shingle at pos 0
        Row(doc_id=3, text=" ".join(w[4:12])),    # shares shingle at pos 4
    ]
    spans = duplicate_spans(
        spark.createDataFrame(rows), "doc_id", "text", shingle_n=8, min_docs=2
    )
    doc1 = sorted(
        [
            (r["span_start"], r["span_end"], r["n_shingles"])
            for r in spans.collect()
            if r["id"] == 1
        ]
    )
    # dup positions {0, 4}: gap 4 < 8 -> one merged span covering 0..11
    assert doc1 == [(0, 11, 2)]


def test_cluster_balanced_sample_quota_and_determinism(spark):
    import random

    from baselinr_spark.operators.selection import cluster_balanced_sample

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    out = cluster_balanced_sample(df, "vec_id", "embedding", n_clusters=4, quota=5)
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault(r["centroid_id"], []).append(r["vec_id"])
    assert all(len(v) <= 5 for v in per.values())
    assert len(per) == 4  # 200 random vecs fill every cluster
    again = cluster_balanced_sample(df, "vec_id", "embedding", n_clusters=4, quota=5)
    assert sorted(r["vec_id"] for r in again.collect()) == sorted(
        r["vec_id"] for r in got
    )


def test_score_buckets_terciles(spark):
    from pyspark.sql import Row

    from baselinr_spark.operators.selection import bucket_rates, score_buckets

    # lang 'a': scores 1..9 -> cuts at ~3.67/6.33: head {1,2,3},
    # middle {4,5,6}, tail {7,8,9}; lang 'b' all-equal -> all head.
    rows = [Row(doc_id=i, lang="a", score=float(i)) for i in range(1, 10)]
    rows += [Row(doc_id=100 + i, lang="b", score=5.0) for i in range(3)]
    b = score_buckets(spark.createDataFrame(rows), ["lang"], "score")
    got = {r["doc_id"]: r["bucket"] for r in b.collect()}
    assert [got[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert all(got[100 + i] == "head" for i in range(3))

    rates = {
        (r["lang"], r["bucket"]): (r["n_docs"], r["fraction"])
        for r in bucket_rates(b, ["lang"]).collect()
    }
    assert rates[("a", "head")] == (3, 3 / 9)
    assert rates[("b", "head")] == (3, 1.0)
    assert ("b", "tail") not in rates


def test_weighted_sample_proportional_and_deterministic(spark):
    from baselinr_spark.operators.selection import weighted_sample

    # heavy id gets weight 1000, light ids weight 1: over one draw the
    # heavy id must ALWAYS be in a k=100-of-1000 sample (p_miss < 1e-40)
    rows = [(0, 100000.0)] + [(i, 1.0) for i in range(1, 1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, "id", "w", k=100)
    ids = {r["id"] for r in out.collect()}
    assert 0 in ids and len(ids) == 100
    # deterministic replay
    ids2 = {r["id"] for r in weighted_sample(df, "id", "w", k=100).collect()}
    assert ids == ids2
    # non-positive / null weights can never win
    bad = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)], "id long, w double")
    assert [r["id"] for r in
            weighted_sample(bad, "id", "w", k=10).collect()] == [4]


def test_train_val_test_split_stability_and_strata(spark):
    from baselinr_spark.operators.selection import train_val_test_split
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(3000)],
        "id long, lang string",
    )
    out = train_val_test_split(df, "id", val_frac=0.1, test_frac=0.2,
                               strata_cols=("lang",))
    frac = {r["split"]: r["n"] for r in
            out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(frac["val"] / 3000 - 0.1) < 0.03
    assert abs(frac["test"] / 3000 - 0.2) < 0.03
    # growth stability: adding rows never changes existing assignments
    small = {r["id"]: r["split"] for r in
             train_val_test_split(df.filter("id < 1000"), "id",
                                  val_frac=0.1, test_frac=0.2,
                                  strata_cols=("lang",)).collect()}
    full = {r["id"]: r["split"] for r in out.collect()}
    assert all(full[i] == s for i, s in small.items())
    with _pytest.raises(ValueError, match="sum < 1"):
        train_val_test_split(df, "id", val_frac=0.6, test_frac=0.5)


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from baselinr_spark.operators.dedup import remove_duplicate_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        Row(doc_id=1, text="one two three " + shared + " four five six"),
        Row(doc_id=2, text="seven eight " + shared + " nine ten"),
        Row(doc_id=3, text="totally different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["id"]: r
        for r in remove_duplicate_spans(
            df, "doc_id", "text", shingle_n=8, min_docs=2
        ).collect()
    }
    # doc 1 holds the first occurrence (min id) -> untouched
    assert out[1]["n_removed_words"] == 0
    assert out[1]["clean_text"] == "one two three " + shared + " four five six"
    # doc 2 loses the 10 shared words (positions 2..11)
    assert out[2]["n_removed_words"] == 10
    assert out[2]["clean_text"] == "seven eight nine ten"
    # doc 3 untouched
    assert out[3]["n_removed_words"] == 0
    assert out[3]["n_words"] == 9


def test_remove_duplicate_spans_within_doc_repeat(spark):
    """A shingle repeated INSIDE one document: the first position is
    canonical, later repeats are removed."""
    from baselinr_spark.operators.dedup import remove_duplicate_spans

    run = " ".join(f"r{i}" for i in range(8))
    rows = [Row(doc_id=1, text=run + " middle words here " + run)]
    df = spark.createDataFrame(rows)
    out = remove_duplicate_spans(
        df, "doc_id", "text", shingle_n=8, min_docs=1
    ).collect()[0]
    assert out["n_removed_words"] == 8
    assert out["clean_text"] == run + " middle words here"


def test_remove_duplicate_spans_footprint_matches_duplicate_spans(spark):
    """On docs that are NOT canonical for any shared shingle, the words
    removed equal the duplicate_spans footprint for that doc."""
    from baselinr_spark.operators.dedup import duplicate_spans, remove_duplicate_spans

    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = [
        Row(doc_id=1, text=a + " tail1 tail2"),
        Row(doc_id=2, text="head1 " + a + " tail3"),
    ]
    df = spark.createDataFrame(rows)
    spans = {
        r["id"]: (r["span_end"] - r["span_start"] + 1)
        for r in duplicate_spans(df, "doc_id", "text", shingle_n=8, min_docs=2).collect()
    }
    removed = {
        r["id"]: r["n_removed_words"]
        for r in remove_duplicate_spans(
            df, "doc_id", "text", shingle_n=8, min_docs=2
        ).collect()
    }
    assert removed[2] == spans[2]
    assert removed[1] == 0  # doc 1 is canonical (min id)


def test_shingle_novelty_planted_overlap(spark):
    from baselinr_spark.operators.dedup import shingle_novelty

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        Row(doc_id=1, text="one two three " + shared + " four five six"),
        Row(doc_id=2, text="seven eight " + shared + " nine ten"),
        Row(doc_id=3, text="totally different words with no overlap at all here"),
        Row(doc_id=4, text="short text"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["id"]: r
        for r in shingle_novelty(df, "doc_id", "text", shingle_n=8, min_docs=2).collect()
    }
    # doc 1: 16 words -> 9 shingles; the 10 shared words contribute 3
    # shingles present in both docs
    assert out[1]["n_shingles"] == 9 and out[1]["n_dup_shingles"] == 3
    assert out[1]["novelty"] == pytest.approx(1 - 3 / 9)
    assert out[2]["n_shingles"] == 7 and out[2]["n_dup_shingles"] == 3
    # doc 3: all novel
    assert out[3]["n_dup_shingles"] == 0 and out[3]["novelty"] == 1.0
    # doc 4: too short for one shingle -> NULL novelty, zero counts
    assert out[4]["n_shingles"] == 0 and out[4]["novelty"] is None


# --- pareto_quality_sample (GPT-3 Appendix A stochastic quality filter) ---

def test_pareto_sample_score_one_always_kept(spark):
    from baselinr_spark.operators.selection import pareto_quality_sample

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(200)], ["doc_id", "score"]
    )
    out = pareto_quality_sample(df, "doc_id", "score")
    # 1 - score = 0 and the Pareto draw is strictly positive for u>0
    assert out.count() == 200


def test_pareto_sample_monotone_in_score(spark):
    """Same id (same draw): kept at score s => kept at every s' > s."""
    from baselinr_spark.operators.selection import pareto_quality_sample

    ids = list(range(500))
    lo = spark.createDataFrame([(i, 0.3) for i in ids], ["doc_id", "score"])
    hi = spark.createDataFrame([(i, 0.8) for i in ids], ["doc_id", "score"])
    kept_lo = {r["doc_id"] for r in
               pareto_quality_sample(lo, "doc_id", "score").collect()}
    kept_hi = {r["doc_id"] for r in
               pareto_quality_sample(hi, "doc_id", "score").collect()}
    assert kept_lo <= kept_hi


def test_pareto_sample_rate_and_determinism(spark):
    from baselinr_spark.operators.selection import pareto_quality_sample

    df = spark.createDataFrame(
        [(i, 0.5) for i in range(2000)], ["doc_id", "score"]
    )
    kept = {r["doc_id"] for r in
            pareto_quality_sample(df, "doc_id", "score").collect()}
    # P(keep | score=.5, alpha=9) = (2 - 0.5)^-9 ~ 0.026 -> ~52 of 2000
    assert 10 <= len(kept) <= 150
    # partitioning-independent: same kept set on a repartitioned input
    kept2 = {r["doc_id"] for r in pareto_quality_sample(
        df.repartition(13), "doc_id", "score").collect()}
    assert kept == kept2


def test_domain_token_cap_keeps_best_within_budget(spark):
    from baselinr_spark.operators.selection import domain_token_cap

    rows = [  # domain a: scores 0.9/0.5/0.1 with 30/30/30 tokens, cap 60
        ("a", 1, 0.5, 30), ("a", 2, 0.9, 30), ("a", 3, 0.1, 30),
        ("b", 4, 0.2, 100),  # single doc over cap -> still kept (rank 1)
    ]
    df = spark.createDataFrame(rows, ["dom", "id", "q", "tok"])
    out = {r["id"]: r for r in domain_token_cap(
        df, "dom", "id", "q", "tok", cap_tokens=60).collect()}
    assert out[2]["rank"] == 1 and out[2]["keep"]          # best doc
    assert out[1]["rank"] == 2 and out[1]["keep"]          # cum 60 <= 60
    assert out[3]["rank"] == 3 and not out[3]["keep"]      # cum 90 > 60
    assert out[4]["rank"] == 1 and out[4]["keep"]          # top-1 guarantee
    assert out[4]["cum_tokens"] == 100


def test_domain_token_cap_tie_breaks_min_id(spark):
    from baselinr_spark.operators.selection import domain_token_cap

    rows = [("a", 9, 0.5, 10), ("a", 2, 0.5, 10)]
    df = spark.createDataFrame(rows, ["dom", "id", "q", "tok"])
    out = {r["id"]: r for r in domain_token_cap(
        df, "dom", "id", "q", "tok", cap_tokens=10).collect()}
    assert out[2]["rank"] == 1 and out[2]["keep"]
    assert out[9]["rank"] == 2 and not out[9]["keep"]


def test_snis_diagnostics_hand_computed(spark):
    """weights (1,1,2): ESS = 16/6; weighted mean of x=(10,20,30) is
    (10+20+60)/4 = 22.5; negative/null weights zeroed."""
    from baselinr_spark.operators.selection import snis_diagnostics

    rows = [(1.0, 10.0), (1.0, 20.0), (2.0, 30.0), (-5.0, 40.0),
            (None, 50.0)]
    df = spark.createDataFrame(rows, ["w", "x"])
    (r,) = snis_diagnostics(df, "w", ["x"]).collect()
    assert r["n"] == 5
    assert abs(r["sum_w"] - 4.0) < 1e-12
    assert abs(r["ess"] - 16.0 / 6.0) < 1e-12
    assert abs(r["ess_frac"] - 16.0 / 30.0) < 1e-12
    assert abs(r["max_w_share"] - 0.5) < 1e-12
    assert abs(r["wmean_x"] - 22.5) < 1e-12
    assert abs(r["mean_x"] - 30.0) < 1e-12


def test_epoch_allocation_plan_hand_computed(spark):
    """Budget 100, weights 3:1 -> targets 75/25; source a has 50
    tokens available -> 1.5 epochs (repeated), b has 100 -> 0.25."""
    from baselinr_spark.operators.selection import epoch_allocation_plan

    st = spark.createDataFrame([("a", 50), ("b", 100)],
                               ["source", "tokens"])
    wt = spark.createDataFrame([("a", 3.0), ("b", 1.0)],
                               ["source", "weight"])
    out = {r["source"]: r for r in epoch_allocation_plan(
        st, wt, budget_tokens=100).collect()}
    assert abs(out["a"]["target_tokens"] - 75.0) < 1e-12
    assert abs(out["a"]["epochs"] - 1.5) < 1e-12 and out["a"]["repeated"]
    assert abs(out["b"]["epochs"] - 0.25) < 1e-12 and not out["b"]["repeated"]


def test_quantile_normalize_scores_maps_rank_to_global(spark):
    """Group a scores (1,2), group b scores (10,20): after matching,
    a's median-rank scores land on the global scores with the same
    cumulative rank; one global cutoff then keeps equal fractions."""
    from baselinr_spark.operators.selection import quantile_normalize_scores

    rows = [("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0)]
    df = spark.createDataFrame(rows, ["g", "s"])
    out = {(r["grp"], r["s"]): r for r in
           quantile_normalize_scores(df, "g", "s").collect()}
    # global ECDF: 1.0->.25, 2.0->.5, 10.0->.75, 20.0->1.0
    # a: s=1 p=.5 -> min global with F>=.5 = 2.0 ; s=2 p=1 -> 20.0
    assert out[("a", 1.0)]["s_norm"] == 2.0
    assert out[("a", 2.0)]["s_norm"] == 20.0
    # b: s=10 p=.5 -> 2.0 ; s=20 p=1 -> 20.0  (same ranks, same images)
    assert out[("b", 10.0)]["s_norm"] == 2.0
    assert out[("b", 20.0)]["s_norm"] == 20.0


def test_quantile_normalize_identity_on_single_group(spark):
    """With one group the map is the identity on distinct scores."""
    from baselinr_spark.operators.selection import quantile_normalize_scores

    rows = [("x", float(v)) for v in (5, 7, 7, 9)]
    df = spark.createDataFrame(rows, ["g", "s"])
    for r in quantile_normalize_scores(df, "g", "s").collect():
        assert r["s_norm"] == r["s"]


def test_split_leakage_hand_computed(spark):
    """Three copies of text X across train/train/val -> one 'train+val'
    group of 3 docs; unique text Y contributes nothing; two copies of Z
    both in test -> a 'test' (non-leaking) group of 2."""
    from baselinr_spark.operators.selection import split_leakage

    rows = [
        ("x words", "train"), ("X  words", "train"), ("x words", "val"),
        ("y alone", "test"),
        ("z dup", "test"), ("z dup", "test"),
    ]
    df = spark.createDataFrame(rows, ["text", "split"])
    got = {r["splits"]: r for r in split_leakage(df, "text").collect()}
    assert got["train+val"]["n_groups"] == 1
    assert got["train+val"]["n_docs"] == 3
    assert got["test"]["n_groups"] == 1 and got["test"]["n_docs"] == 2
    assert "train" not in got  # y is unique -> filtered by group size
