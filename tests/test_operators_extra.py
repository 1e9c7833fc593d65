"""Unit tests for baseline selection, schema drift, type inference and
the fused scoring UDF — hand-computed expectations in the style of the
reference's test_drift_strategies.py / test_baseline_selector.py."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _daily(spark, values, start="2025-01-01"):
    d0 = dt.date.fromisoformat(start)
    rows = [(d0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, schema="day date, n double")


def test_moving_average_baseline(spark):
    from baselinr_spark.operators.baseline import moving_average_baseline

    df = _daily(spark, [10, 20, 30, 40])
    out = {r["day"].isoformat(): (r["baseline"], r["n_prior"])
           for r in moving_average_baseline(df, "day", "n", n=7).collect()}
    assert out["2025-01-01"] == (None, 0)
    assert out["2025-01-02"] == (10.0, 1)
    assert out["2025-01-04"] == (20.0, 3)  # mean(10,20,30)


def test_stable_window_baseline(spark):
    from baselinr_spark.operators.baseline import stable_window_baseline

    # reference semantics (baseline_selector.py:303-316): window of 5
    # drift scores, baseline = mean of the 6 runs spanning them.
    # series 10,50,5,80,100,100,100,100,100 → |pct| changes
    # 400,90,1500,25,0,0,0,0; best 5-change window = (25,0,0,0,0)/5 = 5.0
    # ending day 9, spanning runs 80,100,100,100,100,100 → 580/6
    df = _daily(spark, [10, 50, 5, 80, 100, 100, 100, 100, 100])
    row = stable_window_baseline(df, "day", "n", window=5).collect()[0]
    assert abs(row["baseline"] - 580.0 / 6.0) < 1e-9
    assert row["window_score"] == 5.0
    assert row["window_end_ts"].isoformat() == "2025-01-09"


def test_stable_window_baseline_short_history(spark):
    from baselinr_spark.operators.baseline import stable_window_baseline

    # 4 runs → effective window = min(5, n−1) = 3 changes over all 4 runs
    # (reference: window_size = min(5, len(runs) − 1)); baseline = mean of
    # 10,12,11,13 = 11.5, score = (20 + 8.333333… + 18.181818…)/3
    df = _daily(spark, [10, 12, 11, 13])
    row = stable_window_baseline(df, "day", "n", window=5).collect()[0]
    assert abs(row["baseline"] - 11.5) < 1e-9
    expected = (20.0 + 100.0 / 12.0 + 200.0 / 11.0) / 3.0
    assert abs(row["window_score"] - expected) < 1e-9

    # < 3 runs → no stable window (reference falls back to last run)
    tiny = _daily(spark, [10, 12])
    assert stable_window_baseline(tiny, "day", "n", window=5).count() == 0


def test_auto_baseline_decision_high_cv(spark):
    from baselinr_spark.operators.baseline import auto_baseline_decision

    noisy = _daily(spark, [10, 200, 5, 300, 8, 250, 12])
    row = auto_baseline_decision(noisy, "day", "n").collect()[0]
    assert row["cv"] > 0.2 and row["decision"] == "moving_average"

    flat = _daily(spark, [100, 101, 100, 99, 100, 101, 100])
    row = auto_baseline_decision(flat, "day", "n").collect()[0]
    assert row["decision"] in ("last_run", "prior_period")


def test_schema_diff_and_renames(spark):
    from baselinr_spark.operators.schema_drift import rename_candidates, schema_diff

    cur = spark.createDataFrame(
        [("id", "bigint"), ("user_name", "string"), ("amount", "double"),
         ("created", "timestamp_ntz")],
        schema="column_name string, data_type string",
    )
    base = spark.createDataFrame(
        [("id", "bigint"), ("username", "varchar"), ("amount", "bigint"),
         ("created", "timestamp")],
        schema="column_name string, data_type string",
    )
    diff = schema_diff(cur, base)
    status = {r["column_name"]: r["status"] for r in diff.collect()}
    assert status == {"id": "unchanged", "user_name": "added",
                      "username": "removed", "amount": "type_changed",
                      "created": "unchanged"}  # ntz normalized

    ren = rename_candidates(diff).collect()
    assert len(ren) == 1
    assert (ren[0]["from_col"], ren[0]["to_col"]) == ("username", "user_name")
    assert ren[0]["similarity"] >= 0.7


def test_infer_semantic_types(spark):
    from baselinr_spark.operators.typeinfer import infer_semantic_types

    pdf = pd.DataFrame({
        "a_int": ["1", "42", "-7", "1000"],
        "a_num": ["1.5", "2.25", "-0.5", "3.0"],
        "a_date": ["2024-01-01", "2024-06-05", "2023-12-31", "2024-02-29"],
        "a_email": ["x@y.com", "a.b@c.org", "q@r.io", "m@n.co"],
        "a_bool": ["true", "false", "TRUE", "no"],
        "a_str": ["hello", "2024-01-01", "x@y.com", "banana"],
    })
    df = spark.createDataFrame(pdf)
    out = {r["column_name"]: r["inferred_type"]
           for r in infer_semantic_types(df, list(pdf.columns)).collect()}
    assert out == {"a_int": "boolean" if False else "integer",
                   "a_num": "numeric", "a_date": "date", "a_email": "email",
                   "a_bool": "boolean", "a_str": "string"}


def test_fused_scoring_matches_individual_udfs(spark, pages_pdf):
    """The fused scoring UDF (one Arrow round trip) must equal the three
    standalone implementations row-for-row."""
    from baselinr_spark.functions.langid import build_model, score_text
    from baselinr_spark.functions.perplexity import build_model as ppl_model
    from baselinr_spark.functions.perplexity import perplexity
    from baselinr_spark.functions.scoring import make_scoring_udf
    from baselinr_spark.functions.scrub import scrub_python

    sample = pages_pdf.head(60)
    df = spark.createDataFrame(sample[["url", "text"]])
    udf = make_scoring_udf(spark)
    got = (
        df.withColumn("s", udf(F.col("text")))
        .select("url", "s.*")
        .toPandas()
        .set_index("url")
    )
    w = build_model()
    pm = ppl_model()
    for _, row in sample.iterrows():
        lang, conf = score_text(row["text"], w)
        g = got.loc[row["url"]]
        assert g["lang_pred"] == lang
        assert g["lang_conf"] == pytest.approx(conf, rel=1e-12)
        assert g["perplexity"] == pytest.approx(perplexity(row["text"], pm), rel=1e-12)
        # fused-UDF contract: NULL scrubbed_text means "scrub was the
        # identity" (the caller coalesces with the original column)
        gs = g["scrubbed_text"]
        assert (row["text"] if gs is None else gs) == scrub_python(row["text"])


def test_langid_batch_matches_dense_reference(pages_pdf):
    """Guard the reduceat batching against an independent dense
    per-document formulation (gather + sum + softmax, the pre-batching
    spec), including the edge tiers: falsy text, <3-byte text."""
    import numpy as np

    from baselinr_spark.functions import synthlang as sl
    from baselinr_spark.functions.langid import (
        CLASSES, _trigram_buckets, build_model, langid_batch,
    )

    w = build_model()

    def dense(text):
        if not text:
            return sl.UNKNOWN_LANG, 0.0
        ids = _trigram_buckets(text)
        logits = (w[:, ids].sum(axis=1) if ids.size
                  else np.zeros(len(CLASSES)))
        z = logits / max(float(ids.size), 1.0)
        z = z - z.max()
        p = np.exp(z)
        p /= p.sum()
        i = int(np.argmax(p))
        return CLASSES[i], float(p[i])

    texts = list(pages_pdf["text"].head(80)) + ["", None, "ab", "abc", "é"]
    preds, confs = langid_batch(texts, w)
    for t, lang, conf in zip(texts, preds, confs):
        dl, dc = dense(t)
        assert lang == dl
        assert conf == pytest.approx(dc, rel=1e-9)


def test_langid_batch_chunking_boundary(pages_pdf):
    """Forcing multiple reduceat chunks must not change any score."""
    import baselinr_spark.functions.langid as li

    texts = list(pages_pdf["text"].head(40))
    one = li.langid_batch(texts)
    old = li._CHUNK_IDS
    li._CHUNK_IDS = 1000  # ~1 doc per chunk
    try:
        many = li.langid_batch(texts)
    finally:
        li._CHUNK_IDS = old
    assert one[0] == many[0]
    assert one[1].tolist() == many[1].tolist()


def test_absolute_threshold_strategy(spark):
    from baselinr_spark.operators.drift import absolute_threshold

    df = spark.createDataFrame(
        [("m1", 100.0, 104.0), ("m2", 100.0, 110.0), ("m3", 100.0, 120.0),
         ("m4", 100.0, 135.0), ("m5", 100.0, 65.0), ("m6", 0.0, 5.0)],
        schema="metric_name string, base_value double, cur_value double",
    )
    out = {r["metric_name"]: (r["change_pct"], r["drift"], r["severity"])
           for r in absolute_threshold(df).collect()}
    assert out["m1"] == (4.0, False, "none")
    assert out["m2"] == (10.0, True, "low")
    assert out["m3"] == (20.0, True, "medium")
    assert out["m4"] == (35.0, True, "high")
    assert out["m5"] == (-35.0, True, "high")
    # reference strategies.py:131-137: baseline == 0 → change_percent
    # None, drift_detected False
    assert out["m6"] == (None, False, "none")


def test_typed_thresholds_and_ignore_matrix(spark):
    from baselinr_spark.operators.drift import absolute_threshold

    df = spark.createDataFrame(
        [
            # numeric mean: 10/25/50 bands — 20% change is 'low' (generic
            # 5/15/30 would say 'medium')
            ("c1", "DOUBLE", "mean", 100.0, 120.0),
            # categorical distinct_count: 2/5/10 — 6% change is 'medium'
            ("c2", "VARCHAR(10)", "distinct_count", 100.0, 106.0),
            # categorical mean is in the ignore matrix → row dropped
            ("c2", "VARCHAR(10)", "mean", 1.0, 2.0),
            # numeric stddev: 3/8/15 — 4% is 'low'
            ("c1", "DOUBLE", "stddev", 100.0, 104.0),
        ],
        schema="column_name string, column_type string, metric_name string,"
               " base_value double, cur_value double",
    )
    out = {(r["column_name"], r["metric_name"]): (r["drift"], r["severity"])
           for r in absolute_threshold(df, type_col="column_type").collect()}
    assert out[("c1", "mean")] == (True, "low")
    assert out[("c2", "distinct_count")] == (True, "medium")
    assert out[("c1", "stddev")] == (True, "low")
    assert ("c2", "mean") not in out and len(out) == 3


def test_perplexity_fast_path_bit_identical(pages_pdf):
    """The memoized string-key scorer must produce bit-identical floats to
    the reference-shaped _word_logprob path."""
    import math

    from baselinr_spark.functions import perplexity as P

    model = P.build_model()
    counts, total = model
    memo: dict = {}
    for text in pages_pdf["text"].head(100):
        toks = P.tokenize(text)
        if not toks:
            continue
        slow = math.exp(
            -sum(P._word_logprob(counts, total, toks, i)
                 for i in range(len(toks))) / len(toks)
        )
        assert P.perplexity(text, model, memo) == slow


def test_perplexity_batch_bit_identical(pages_pdf):
    """The vectorized batch scorer must equal the scalar path float-for-
    float (same tokens, same crc keys, same log/sum order)."""
    import math

    from baselinr_spark.functions import perplexity as P

    model = P.build_model()
    texts = list(pages_pdf["text"].head(300)) + ["", None, "!!! ???", "a"]
    got = P.perplexity_batch(texts, model)
    memo: dict = {}
    for t, g in zip(texts, got):
        e = P.perplexity(t, model, memo)
        assert g == e or (math.isinf(g) and math.isinf(e)), repr(t)[:60]


def test_tokenize_fast_equivalence(pages_pdf):
    """tokenize_fast (single findall) must produce exactly the tokens of
    the split+edge-strip spec, including punctuation-heavy edge cases."""
    from baselinr_spark.functions.perplexity import tokenize, tokenize_fast

    cases = [
        "", " ", "!!!", "--ab--cd--", "a", "a!b!", "Hello, WORLD!",
        "x\ty\nz", "..7..", "a--b c--d", " weird spaces ",
        "ümlaut café 1-2-3", "trailing. (parens) [brackets]",
    ] + list(pages_pdf["text"].head(200))
    for t in cases:
        assert tokenize(t) == tokenize_fast(t), repr(t)[:60]


def test_freshness_score_thresholds(spark):
    from baselinr_spark.operators.quality import freshness_score_col

    df = spark.createDataFrame(
        [(1.0,), (24.0,), (25.0,), (48.0,), (100.0,), (168.0,), (192.0,),
         (168.0 + 144.0,), (10000.0,), (None,)],
        schema="hours double",
    )
    out = [r["s"] for r in df.select(
        freshness_score_col(F.col("hours")).alias("s")).collect()]
    #            ≤24  =24  ≤48  =48  ≤168  =168  +1day  +6days floor  null
    assert out == [100.0, 100.0, 80.0, 80.0, 60.0, 60.0, 50.0, 0.0, 0.0, 0.0]


def test_adversarial_skew_bounded(spark):
    """1k byte-identical boilerplate docs must NOT go quadratic: the
    LSH bucket caps drop the degenerate bucket, and the n-gram DF cut
    removes the corpus-frequent shingle before the self-join."""
    from baselinr_spark.operators.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_pairs,
    )

    rows = [(i, "the the the the the the the the") for i in range(1000)]
    rows += [(10_000 + i, f"unique document number {i} alpha beta gamma delta")
             for i in range(20)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")

    # all 1000 boilerplate docs share every band key → bucket size 1000
    # > cap → dropped; remaining pairs come only from the 20 unique docs
    mh = minhash_lsh_pairs(df, "doc_id", "text", max_bucket=100)
    assert mh.filter(F.col("id_b") < 10_000).count() == 0

    sp = simhash_near_pairs(df, "doc_id", "text", max_bucket=100)
    assert sp.filter(F.col("id_b") < 10_000).count() == 0

    # 'the' appears in 1000/1020 docs > 50% → cut; the boilerplate docs
    # then have no shingles at all, so zero pairs among them
    ng = ngram_jaccard_pairs(df, "doc_id", "text", shingle_n=1)
    assert ng.filter(F.col("id_b") < 10_000).count() == 0


def test_lsh_bucket_cap_preserves_small_buckets(spark):
    """With no degenerate bucket, the cap is a no-op: near-identical doc
    pairs still surface."""
    from baselinr_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, f"totally distinct text number {i} {'x' * (i % 7)} "
                f"suffix {i * 17}") for i in range(30)]
    rows.append((999, rows[0][1]))  # exact copy of doc 0
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = minhash_lsh_pairs(df, "doc_id", "text", max_bucket=10_000)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert (0, 999) in pairs


def test_column_matcher_semantics():
    from baselinr_spark.operators.column_matcher import (
        ColumnPattern, find_matching_pattern, select_columns,
    )

    cols = ["id", "user_name", "user_email", "amount", "created_at"]
    # no patterns → everything (reference column_matcher.py:125)
    assert select_columns(cols) == cols
    assert select_columns(cols, include_defaults=False) == []
    # wildcard + disabled catch-all: first match wins
    pats = [ColumnPattern("user_*"), ColumnPattern("*", enabled=False)]
    assert select_columns(cols, pats) == ["user_name", "user_email"]
    # regex patterns use re.match
    pats = [ColumnPattern(r".*_(name|at)$", pattern_type="regex"),
            ColumnPattern("*", enabled=False)]
    assert select_columns(cols, pats) == ["user_name", "created_at"]
    # invalid regex falls back to literal (column_matcher.py:66-72)
    bad = ColumnPattern("amount(", pattern_type="regex")
    assert find_matching_pattern("amount(", [bad]) is bad
    assert find_matching_pattern("amount", [bad]) is None
    # unmatched columns follow include_defaults
    pats = [ColumnPattern("id", pattern_type="literal", enabled=False)]
    assert select_columns(cols, pats) == cols[1:]
    assert select_columns(cols, pats, include_defaults=False) == []


def test_lsh_verified_pairs_subset_of_exact(spark):
    """LSH+verify returns a subset of the exact all-pairs Jaccard result,
    with identical jaccard values, and finds the near-identical pair."""
    import pandas as pd

    from baselinr_spark.operators.dedup import (
        lsh_verified_pairs, ngram_jaccard_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            base,
            base + " again",                      # near-dup of 0
            "completely different words here about spark and parquet",
            "another unrelated document regarding streaming state",
        ],
    }))
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3,
                                     threshold=0.5, max_df_frac=1.0).collect()
    }
    ver = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_verified_pairs(docs, "doc_id", "text",
                                    threshold=0.5).collect()
    }
    assert (0, 1) in ver                      # planted near-dup found
    assert set(ver) <= set(exact)             # no false positives survive
    for pair, j in ver.items():
        assert abs(j - exact[pair]) < 1e-12   # verification is exact


def test_stratified_hash_sample_deterministic(spark):
    import pandas as pd

    from baselinr_spark.operators.profiling import stratified_hash_sample

    df = spark.createDataFrame(pd.DataFrame({
        "k": range(2000),
        "stratum": ["a" if i % 2 == 0 else "b" for i in range(2000)],
    }))
    s1 = stratified_hash_sample(df, "stratum", "k", {"a": 0.5})
    s2 = stratified_hash_sample(df, "stratum", "k", {"a": 0.5})
    r1 = {r["k"] for r in s1.collect()}
    assert r1 == {r["k"] for r in s2.collect()}          # reproducible
    assert all(k % 2 == 0 for k in r1)                   # default 0 drops b
    assert 0.35 < len(r1) / 1000 < 0.65                  # ~fraction of a


def test_connected_components_and_dedup(spark):
    import pandas as pd

    from baselinr_spark.operators.dedup import (
        connected_components, dedup_by_components,
    )

    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated pair
    pairs = spark.createDataFrame(pd.DataFrame({
        "id_a": [1, 2, 3, 10, 11, 10, 20],
        "id_b": [2, 3, 4, 11, 12, 12, 21],
    }))
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert {comp[i] for i in (1, 2, 3, 4)} == {1}
    assert {comp[i] for i in (10, 11, 12)} == {10}
    assert comp[20] == 20 and comp[21] == 20

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 10, 11, 12, 20, 21, 99],
        "text": ["t"] * 10,
    }))
    kept = sorted(
        r["doc_id"]
        for r in dedup_by_components(
            docs, connected_components(pairs), "doc_id").collect()
    )
    # one canonical per component + the unclustered doc 99
    assert kept == [1, 10, 20, 99]


def test_ngram_contamination_planted(spark):
    from baselinr_spark.operators.dedup import ngram_contamination

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    train = spark.createDataFrame(
        [(1, base),  # verbatim benchmark copy
         (2, base.replace("quick", "slow")),  # near-copy, shares 8-grams
         (3, "completely unrelated text about spark dataframes and "
             "parquet files in a warehouse")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame([(100, base)], "doc_id bigint, text string")

    out = {r["train_id"]: r for r in ngram_contamination(
        train, bench, "doc_id", "text", n=8, min_hits=1).collect()}
    assert 1 in out and out[1]["benchmark_id"] == 100
    # verbatim copy: every train 8-gram hits → contamination 1.0
    assert out[1]["contamination_frac"] == 1.0
    assert out[1]["n_hits"] == out[1]["train_ngrams"]
    assert 2 in out and 0 < out[2]["contamination_frac"] < 1.0
    assert 3 not in out

    # min_hits raises the bar past the near-copy's overlap? no — it
    # shares many 8-grams; but an absurd bar drops everything
    strict = ngram_contamination(train, bench, "doc_id", "text",
                                 n=8, min_hits=10**6).collect()
    assert strict == []

    # scale shape: benchmark side is broadcast (no shuffle of the
    # training n-grams into a sort-merge join)
    plan = ngram_contamination(train, bench, "doc_id", "text", n=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


# --- soft_dedup_weights (SoftDeDup duplicate down-weighting) ---

def test_soft_dedup_weights_hand_case(spark):
    from baselinr_spark.operators.dedup import soft_dedup_weights

    df = spark.createDataFrame(
        [
            (1, "x y"),
            (2, "X  y"),      # normalizes to "x y" -> dup of 1
            (3, "z"),
            (4, "w"),
            (5, "w"),
        ],
        ["doc_id", "text"],
    )
    out = soft_dedup_weights(df, "doc_id", "text").collect()
    # row-count preserving: every document keeps a row
    assert len(out) == 5
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_copies"] == 2 and by_id[1]["sample_weight"] == 0.5
    assert by_id[2]["text_hash"] == by_id[1]["text_hash"]
    assert by_id[3]["n_copies"] == 1 and by_id[3]["sample_weight"] == 1.0
    assert by_id[4]["sample_weight"] == 0.5 and by_id[5]["sample_weight"] == 0.5


def test_soft_dedup_group_mass_is_one(spark):
    """Each duplicate group contributes expected mass of exactly ONE
    document — the SoftDeDup invariant."""
    from pyspark.sql import functions as F

    from baselinr_spark.operators.dedup import soft_dedup_weights

    df = spark.createDataFrame(
        [(i, "dup text" if i % 3 == 0 else f"unique {i}") for i in range(30)],
        ["doc_id", "text"],
    )
    out = soft_dedup_weights(df, "doc_id", "text")
    sums = out.groupBy("text_hash").agg(
        F.round(F.sum("sample_weight"), 9).alias("mass")).collect()
    assert all(r["mass"] == 1.0 for r in sums)


# --- kneser_ney_bigram ---

def test_kneser_ney_hand_computed(spark):
    import pytest as _pt

    from baselinr_spark.operators.ngramlm import kneser_ney_bigram

    # tokens: doc1=[a,b,a], doc2=[b,a] -> bigrams (a,b):1, (b,a):2
    df = spark.createDataFrame([(1, "a b a"), (2, "b a")], ["doc_id", "text"])
    got = {(r["prev"], r["gram"]): r for r in
           kneser_ney_bigram(df, "text").collect()}
    # T=2 bigram types; ctx a: c=1, succ=1; ctx b: c=2, succ=1;
    # cont a: 1, cont b: 1; d=0.75
    assert got[("a", "b")]["cnt"] == 1
    assert got[("a", "b")]["p_kn"] == _pt.approx(
        max(1 - 0.75, 0) / 1 + 0.75 * 1 / 1 * (1 / 2))   # 0.625
    assert got[("b", "a")]["p_kn"] == _pt.approx(
        max(2 - 0.75, 0) / 2 + 0.75 * 1 / 2 * (1 / 2))   # 0.8125


def test_kneser_ney_mass_conservation(spark):
    """When every vocabulary gram is observed as a successor of v, the
    smoothed distribution over v's successors sums to exactly 1."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from baselinr_spark.operators.ngramlm import kneser_ney_bigram

    # 'a a a b': bigrams (a,a):2, (a,b):1 -> successors of 'a' = {a, b}
    # = the whole vocab, and sum p_KN(.|a) must be 1
    df = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    out = kneser_ney_bigram(df, "text")
    s = out.filter(F.col("prev") == "a").agg(F.sum("p_kn")).collect()[0][0]
    assert s == _pt.approx(1.0)


def test_discover_stopwords_hand_computed(spark):
    """4 en docs: 'the' in 4/4 (df 1.0), 'cat' in 2/4 (0.5, in-doc
    repeats counted once), 'dog' in 1/4 (0.25 — ON the threshold,
    kept), 'rare' in 1/4 but top_k=3 cuts after the tie-break; one fr
    doc ranks independently."""
    from baselinr_spark.operators.textanalysis import discover_stopwords

    docs = spark.createDataFrame(
        [
            (1, "the cat cat sat", "en"),
            (2, "the cat", "en"),
            (3, "the dog", "en"),
            (4, "the and and", "en"),
            (5, "le chat", "fr"),
        ],
        ["doc_id", "text", "lang"],
    )
    rows = discover_stopwords(docs, "text", "lang", top_k=3,
                              min_df_ratio=0.25).collect()
    en = {r["term"]: r for r in rows if r["lang"] == "en"}
    fr = {r["term"]: r for r in rows if r["lang"] == "fr"}
    # en ranking: the (4), cat (2), then df=1 ties 'and'/'dog'/'sat'
    # break alphabetically -> 'and' takes rank 3
    assert list(sorted(en, key=lambda t: en[t]["rank"])) == ["the", "cat", "and"]
    assert en["the"]["doc_freq"] == 4 and en["the"]["df_ratio"] == 1.0
    assert en["cat"]["doc_freq"] == 2 and en["cat"]["df_ratio"] == 0.5
    assert en["and"]["doc_freq"] == 1 and en["and"]["df_ratio"] == 0.25
    assert fr["chat"]["df_ratio"] == 1.0 and len(fr) == 2


def test_mann_whitney_hand_computed(spark):
    """base {1,2,3} vs cur {2,3,4}: U1=2, tie-corrected z=-1.12367,
    two-sided p~=0.2613, rank-biserial -5/9 (hand-worked midranks:
    1, 2.5, 2.5, 4.5, 4.5, 6)."""
    import math

    from baselinr_spark.operators.drift import mann_whitney_from_counts

    base = spark.createDataFrame([(1.0, 1), (2.0, 1), (3.0, 1)],
                                 ["value", "count"])
    cur = spark.createDataFrame([(2.0, 1), (3.0, 1), (4.0, 1)],
                                ["value", "count"])
    (row,) = mann_whitney_from_counts(base, cur).collect()
    assert row["u"] == 2.0
    assert row["n_base"] == 3 and row["n_cur"] == 3
    sigma = math.sqrt(9 / 12 * (7 - 12 / 30))
    assert abs(row["z"] - (2 - 4.5) / sigma) < 1e-9
    assert abs(row["p_value"] - 0.2613) < 2e-3  # vs scipy two-sided
    assert abs(row["rank_biserial"] - (-5 / 9)) < 1e-9
    assert not row["drift"] and row["severity"] == "none"


def test_mann_whitney_disjoint_shift_drifts(spark):
    """Completely separated cohorts (all base < all cur), n=30 each:
    U1=0, |rank-biserial|=1, p << 0.05 -> drift, severity high."""
    from baselinr_spark.operators.drift import mann_whitney_from_counts

    base = spark.createDataFrame([(float(v), 10) for v in (1, 2, 3)],
                                 ["value", "count"])
    cur = spark.createDataFrame([(float(v), 10) for v in (11, 12, 13)],
                                ["value", "count"])
    (row,) = mann_whitney_from_counts(base, cur).collect()
    assert row["u"] == 0.0
    assert row["rank_biserial"] == -1.0
    assert row["p_value"] < 1e-6
    assert row["drift"] and row["severity"] == "high"


def test_ht_estimate_hand_computed(spark):
    """(10, p=.5), (20, p=.5), (30, p=.25), (NULL, p=.5):
    est_count = 2+2+4+2 = 10; est_total = 20+40+120 = 180;
    est_mean = 180/8 (NULL row excluded from the value weights);
    var_total = 200+800+10800 = 11800."""
    import math

    from baselinr_spark.operators.profiling import ht_estimate

    s = spark.createDataFrame(
        [(10.0, 0.5), (20.0, 0.5), (30.0, 0.25), (None, 0.5)],
        "v double, p double")
    (row,) = ht_estimate(s, "v", "p").collect()
    assert row["n_sampled"] == 4
    assert abs(row["est_count"] - 10.0) < 1e-9
    assert abs(row["est_total"] - 180.0) < 1e-9
    assert abs(row["est_mean"] - 180.0 / 8.0) < 1e-9
    assert abs(row["var_total"] - 11800.0) < 1e-9
    assert abs(row["se_total"] - math.sqrt(11800.0)) < 1e-9


def test_cusum_hand_computed(spark):
    """baseline [10,12,11] -> mu0=11, sigma0=sqrt(2/3); planted
    up-shift at t=5..6 accumulates in s_pos and alarms once it crosses
    h = 4*sigma0."""
    import math

    from baselinr_spark.operators.anomaly import cusum_series

    series = [(1, 10.0), (2, 12.0), (3, 11.0), (4, 11.0), (5, 15.0),
              (6, 15.0)]
    df = spark.createDataFrame(series, ["ts", "value"])
    rows = {r["ts"]: r for r in cusum_series(df, baseline_n=3).collect()}
    sigma0 = math.sqrt(2.0 / 3.0)
    k = 0.5 * sigma0
    h = 4.0 * sigma0
    assert abs(rows[1]["mu0"] - 11.0) < 1e-9
    assert abs(rows[1]["sigma0"] - sigma0) < 1e-9
    # hand recursion
    sp = 0.0
    expect = {}
    for t, v in series:
        sp = max(0.0, sp + (v - 11.0 - k))
        expect[t] = sp
    for t, _ in series:
        assert abs(rows[t]["s_pos"] - expect[t]) < 1e-9, t
        assert rows[t]["alarm"] == (expect[t] > h)
    assert not rows[4]["alarm"] and rows[5]["alarm"] and rows[6]["alarm"]


def test_cusum_constant_baseline_degenerate(spark):
    """sigma0 = 0 -> k = h = 0: ANY deviation alarms immediately
    (explicit degenerate case, not NULL)."""
    from baselinr_spark.operators.anomaly import cusum_series

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 10.0), (4, 10.5)], ["ts", "value"])
    rows = {r["ts"]: r for r in
            cusum_series(df, baseline_n=3).collect()}
    assert rows[1]["sigma0"] == 0.0
    assert not rows[3]["alarm"] and rows[4]["alarm"]


def test_bh_fdr_textbook(spark):
    """p = {.005, .01, .03, .04}, m=4: raw m*p/i = .02 .02 .04 .04;
    step-up q = .02 .02 .04 .04; alpha=.03 rejects exactly the two
    smallest."""
    from baselinr_spark.operators.drift import bh_fdr

    tests = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        ["test_id", "p_value"])
    rows = {r["test_id"]: r for r in bh_fdr(tests, alpha=0.03).collect()}
    assert abs(rows["d"]["q_value"] - 0.02) < 1e-12
    assert abs(rows["a"]["q_value"] - 0.02) < 1e-12
    assert abs(rows["c"]["q_value"] - 0.04) < 1e-12
    assert abs(rows["b"]["q_value"] - 0.04) < 1e-12
    assert rows["d"]["reject"] and rows["a"]["reject"]
    assert not rows["c"]["reject"] and not rows["b"]["reject"]
    assert [rows[t]["rank"] for t in ("d", "a", "c", "b")] == [1, 2, 3, 4]


def test_bh_fdr_q_monotone_and_capped(spark):
    from baselinr_spark.operators.drift import bh_fdr

    tests = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate([0.001, 0.2, 0.5, 0.9, 0.99])],
        ["test_id", "p_value"])
    rows = sorted(bh_fdr(tests).collect(), key=lambda r: r["rank"])
    qs = [r["q_value"] for r in rows]
    assert qs == sorted(qs)          # step-up q is monotone in rank
    assert all(q <= 1.0 for q in qs)  # capped


def test_wasserstein_hand_computed(spark):
    """base: value 0 (x3), 1 (x1); cur: value 0 (x1), 1 (x3).
    F_base = .75 at v=0; F_cur = .25; |diff| * (1-0) = 0.5 = W1.
    Range 1 -> normalized 0.5 -> severity high."""
    from baselinr_spark.operators.drift import wasserstein_from_counts

    base = spark.createDataFrame([(0.0, 3), (1.0, 1)], ["value", "count"])
    cur = spark.createDataFrame([(0.0, 1), (1.0, 3)], ["value", "count"])
    (row,) = wasserstein_from_counts(base, cur).collect()
    assert abs(row["w1"] - 0.5) < 1e-12
    assert abs(row["w1_normalized"] - 0.5) < 1e-12
    assert row["severity"] == "high"
    assert row["n_base"] == 4 and row["n_cur"] == 4


def test_wasserstein_identical_is_zero(spark):
    from baselinr_spark.operators.drift import wasserstein_from_counts

    d = spark.createDataFrame([(1.0, 2), (5.0, 3)], ["value", "count"])
    (row,) = wasserstein_from_counts(d, d).collect()
    assert row["w1"] == 0.0 and row["severity"] == "none"


def test_wasserstein_shift_equals_offset(spark):
    """Pure location shift of a point mass: W1 = the shift size."""
    from baselinr_spark.operators.drift import wasserstein_from_counts

    base = spark.createDataFrame([(2.0, 5)], ["value", "count"])
    cur = spark.createDataFrame([(7.0, 5)], ["value", "count"])
    (row,) = wasserstein_from_counts(base, cur).collect()
    assert abs(row["w1"] - 5.0) < 1e-12


def test_neyman_allocation_hand_computed(spark):
    """Stratum a: 4 rows of spread values (sigma 2.582); stratum b: 4
    constant rows (sigma 0 -> min_per_stratum floor). Budget 10: all
    weighted budget goes to a (capped at N_a = 4), b gets the floor 2."""
    from baselinr_spark.operators.profiling import neyman_allocation

    rows = [("a", 1.0), ("a", 3.0), ("a", 5.0), ("a", 7.0),
            ("b", 2.0), ("b", 2.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, ["s", "v"])
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "s", "v", total_budget=10).collect()}
    assert out["a"]["n_alloc"] == 4          # floor(10*1.0) capped at N=4
    assert out["b"]["n_alloc"] == 2          # sigma 0 -> min_per_stratum
    assert abs(out["a"]["fraction"] - 1.0) < 1e-12
    assert abs(out["b"]["fraction"] - 0.5) < 1e-12
    assert out["b"]["weight"] == 0.0


def test_kruskal_wallis_hand_computed(spark):
    """3 groups, no ties: a={1,2}, b={3,4}, c={5,6}. Ranks 1..6;
    R_a=3, R_b=7, R_c=11. H = 12/(6*7) * (9/2+49/2+121/2) - 21
    = 2/7 * 89.5 - 21 = 4.5714...; no ties -> correction 1."""
    from baselinr_spark.operators.drift import kruskal_wallis_from_counts

    rows = [("a", 1.0, 1), ("a", 2.0, 1), ("b", 3.0, 1), ("b", 4.0, 1),
            ("c", 5.0, 1), ("c", 6.0, 1)]
    df = spark.createDataFrame(rows, ["grp", "value", "count"])
    (r,) = kruskal_wallis_from_counts(df).collect()
    h = 12.0 / 42.0 * (9.0 / 2 + 49.0 / 2 + 121.0 / 2) - 21.0
    assert abs(r["h"] - h) < 1e-9
    assert abs(r["h_corrected"] - h) < 1e-9  # no ties
    assert r["dof"] == 2 and r["n_total"] == 6 and r["n_groups"] == 3
    assert 0.0 < r["p_value"] < 1.0


def test_kruskal_wallis_identical_groups_no_drift(spark):
    """All groups share one distribution -> H ~ 0, p ~ 1, no drift."""
    from baselinr_spark.operators.drift import kruskal_wallis_from_counts

    rows = [(g, v, 10) for g in ("a", "b", "c") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, ["grp", "value", "count"])
    (r,) = kruskal_wallis_from_counts(df).collect()
    assert abs(r["h_corrected"]) < 1e-9
    assert not r["drift"]


def test_kruskal_wallis_separated_groups_drift(spark):
    from baselinr_spark.operators.drift import kruskal_wallis_from_counts

    rows = [("a", 1.0, 20), ("b", 10.0, 20), ("c", 20.0, 20)]
    df = spark.createDataFrame(rows, ["grp", "value", "count"])
    (r,) = kruskal_wallis_from_counts(df).collect()
    assert r["p_value"] < 1e-6 and r["drift"]


def test_psi_source_vs_rest_opposed_parts(spark):
    """Two sources with mirrored bucket mixes: each part's PSI vs the
    rest equals the closed-form two-bucket PSI, symmetric by design."""
    import math

    from baselinr_spark.operators.drift import psi_source_vs_rest

    rows = [("A", "x", 90.0), ("A", "y", 10.0),
            ("B", "x", 10.0), ("B", "y", 90.0)]
    df = spark.createDataFrame(rows, ["part", "bucket", "count"])
    out = {r["part"]: r for r in psi_source_vs_rest(df, "part").collect()}
    expected = (0.9 - 0.1) * math.log(0.9 / 0.1) * 2
    for p in ("A", "B"):
        assert abs(out[p]["psi"] - expected) < 1e-9
        assert out[p]["drift"] and out[p]["severity"] == "high"


def test_psi_source_vs_rest_uniform_is_zero(spark):
    from baselinr_spark.operators.drift import psi_source_vs_rest

    rows = [(p, b, 50.0) for p in ("A", "B", "C") for b in ("x", "y")]
    df = spark.createDataFrame(rows, ["part", "bucket", "count"])
    for r in psi_source_vs_rest(df, "part").collect():
        assert abs(r["psi"]) < 1e-12
        assert not r["drift"] and r["severity"] == "none"


def test_psi_source_vs_rest_missing_bucket_floored(spark):
    """A part that never emits a bucket hits the 1e-4 prob floor, same
    as the reference's missing-bucket handling."""
    import math

    from baselinr_spark.operators.drift import psi_source_vs_rest

    rows = [("A", "x", 100.0), ("B", "x", 100.0), ("B", "y", 100.0)]
    df = spark.createDataFrame(rows, ["part", "bucket", "count"])
    out = {r["part"]: r for r in psi_source_vs_rest(df, "part").collect()}
    exp_a = (1.0 - 0.5) * math.log(1.0 / 0.5) + (1e-4 - 0.5) * math.log(1e-4 / 0.5)
    assert abs(out["A"]["psi"] - exp_a) < 1e-9
    assert out["A"]["severity"] == "high"


def test_feature_corr_matrix_exact_pairs(spark):
    """y = 2x exactly -> r = 1; z anti-correlates x -> r = -1; NULLs
    drop the pair from both n_both and the estimate."""
    from baselinr_spark.operators.profiling import feature_corr_matrix

    rows = [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0),
            (4.0, None, 0.0)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = {(r["col_a"], r["col_b"]): r
           for r in feature_corr_matrix(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")]["n_both"] == 3
    assert abs(out[("x", "y")]["r"] - 1.0) < 1e-12
    assert out[("x", "z")]["n_both"] == 4
    assert abs(out[("x", "z")]["r"] + 1.0) < 1e-12


def test_feature_corr_matrix_constant_is_null(spark):
    from baselinr_spark.operators.profiling import feature_corr_matrix

    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], ["x", "c"])
    (r,) = feature_corr_matrix(df, ["x", "c"]).collect()
    assert r["r"] is None and r["n_both"] == 2


def test_sprt_hand_computed_accepts_h1(spark):
    """p0=.2, p1=.8 symmetric: each success adds ln4, each failure
    subtracts ln4. Day2 (4/4 cumulative) has llr=4ln4≈5.55, safely
    over upper=ln(16)≈2.77 -> accept_h1; day3's 4 straight failures
    pull the llr back to exactly 0 -> continue."""
    import math

    from baselinr_spark.operators.anomaly import sprt_binomial

    daily = spark.createDataFrame(
        [("2024-01-01", 2, 2), ("2024-01-02", 2, 2), ("2024-01-03", 0, 4)],
        ["day", "k", "n"],
    )
    out = {r["day"]: r
           for r in sprt_binomial(daily, "day", "k", "n",
                                  p0=0.2, p1=0.8,
                                  alpha=0.05, beta=0.2).collect()}
    ln4 = math.log(4.0)
    assert abs(out["2024-01-01"]["llr"] - 2 * ln4) < 1e-12
    assert abs(out["2024-01-02"]["llr"] - 4 * ln4) < 1e-12
    assert out["2024-01-02"]["decision"] == "accept_h1"
    # day 3: 4 failures subtract 4 ln4 -> llr back to 0 -> continue
    assert abs(out["2024-01-03"]["llr"]) < 1e-9
    assert out["2024-01-03"]["decision"] == "continue"
    assert abs(out["2024-01-01"]["upper"] - math.log(0.8 / 0.05)) < 1e-12
    assert abs(out["2024-01-01"]["lower"] - math.log(0.2 / 0.95)) < 1e-12


def test_metric_state_merge_equals_direct_profile(spark):
    """Merging per-partition states reproduces the direct whole-table
    mean/variance/min/max exactly (the algebraic-merge guarantee)."""
    import statistics

    from baselinr_spark.operators.profiling import (
        merge_metric_states,
        metric_states,
    )

    vals = [1.0, 2.0, 3.0, 10.0, 20.0, None, 5.5, 0.25]
    rows = [("p%d" % (i % 3), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "part string, v double")
    (m,) = merge_metric_states(metric_states(df, "part", "v")).collect()
    clean = [v for v in vals if v is not None]
    assert m["n"] == 8 and m["n_null"] == 1
    assert abs(m["mean"] - statistics.mean(clean)) < 1e-12
    assert abs(m["variance"] - statistics.variance(clean)) < 1e-9
    assert m["min"] == 0.25 and m["max"] == 20.0


def test_metric_state_merge_degenerate(spark):
    """All-null partition: mean/variance NULL, counts still merge."""
    from baselinr_spark.operators.profiling import (
        merge_metric_states,
        metric_states,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", None)], "part string, v double"
    )
    (m,) = merge_metric_states(metric_states(df, "part", "v")).collect()
    assert m["n"] == 2 and m["n_null"] == 2
    assert m["mean"] is None and m["variance"] is None
