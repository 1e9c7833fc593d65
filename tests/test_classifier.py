"""Hashed NB classifier: hand-computed log-odds on a tiny corpus with
a bucket space large enough to be collision-free, plus incremental
exact dedup semantics (cross-batch drop, intra-batch min-id winner,
seen-state append contract)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.classifier import nb_score, nb_train, nb_train_score
from baselinr_spark.operators.dedup import incremental_exact_dedup

B = 4096


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _grams(text: str) -> list[str]:
    ws = text.lower().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _expected_log_odds(docs, k=1.0):
    """Reference NB in plain Python: add-k over the full bucket space."""
    from collections import Counter

    p_cnt, n_cnt = Counter(), Counter()
    p_docs = sum(1 for _, _, y in docs if y)
    n_docs = sum(1 for _, _, y in docs if not y)
    for _, text, y in docs:
        for g in _grams(text):
            (p_cnt if y else n_cnt)[_bucket(g)] += 1
    p_tot, n_tot = sum(p_cnt.values()), sum(n_cnt.values())
    prior = math.log(p_docs) - math.log(n_docs)

    def llr(b):
        return math.log((p_cnt[b] + k) / (p_tot + k * B)) - math.log(
            (n_cnt[b] + k) / (n_tot + k * B)
        )

    out = {}
    for did, text, _ in docs:
        s = prior
        for g in _grams(text):
            s += llr(_bucket(g))
        out[did] = s
    return out


DOCS = [
    (1, "good clean prose sentence flows well", True),
    (2, "buy now spam offer buy spam", False),
    (3, "clean prose reads well here", True),
    (4, "offer now spam now buy", False),
    (5, "prose sentence good and clean", True),
    (6, "spam offer spam buy now now", False),
]


def test_matches_hand_computed_nb(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y boolean")
    out = nb_train_score(df, "doc_id", "text", "y", n_buckets=B)
    got = {r["doc_id"]: r["log_odds"] for r in out.collect()}
    want = _expected_log_odds(DOCS)
    assert got.keys() == want.keys()
    for did in want:
        assert got[did] == pytest.approx(want[did], rel=1e-9)
    preds = {r["doc_id"]: r["pred"] for r in out.collect()}
    assert all(preds[d] == (y is True) for d, _, y in DOCS)


def test_model_is_dense_and_reusable(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y boolean")
    model = nb_train(df, "doc_id", "text", "y", n_buckets=64)
    assert model.count() == 64  # full bucket space, seen or not
    # scoring UNSEEN text still works and empty text scores the prior
    new = spark.createDataFrame(
        [(10, "totally novel wording"), (11, "")], "doc_id long, text string"
    )
    scored = {r["doc_id"]: r["log_odds"] for r in
              nb_score(new, model, "doc_id", "text", n_buckets=64).collect()}
    assert scored[11] == pytest.approx(math.log(3) - math.log(3))
    assert math.isfinite(scored[10])


def test_score_plan_broadcasts_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, y boolean")
    model = nb_train(df, "doc_id", "text", "y", n_buckets=64)
    plan = (
        nb_score(df, model, "doc_id", "text", n_buckets=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_batches(spark):
    b1 = spark.createDataFrame(
        [(1, "hello world"), (2, "HELLO   world"), (3, "unique one")],
        "id long, text string",
    )
    kept1, seen1 = incremental_exact_dedup(b1, None, "id", "text")
    assert sorted(r["id"] for r in kept1.collect()) == [1, 3]
    assert seen1.count() == 2
    assert set(seen1.columns) == {"text_hash", "first_id"}

    b2 = spark.createDataFrame(
        [(4, "hello world"),      # dup of seen -> drop
         (5, "brand new"),        # new -> keep (min id of its group)
         (6, "brand  NEW"),       # intra-batch dup of 5 -> drop
         (7, "unique one"),       # dup of seen -> drop
         (8, "another fresh")],   # new -> keep
        "id long, text string",
    )
    kept2, seen2 = incremental_exact_dedup(b2, seen1, "id", "text")
    assert sorted(r["id"] for r in kept2.collect()) == [5, 8]
    # delta = exactly the kept rows' hashes (append-only contract)
    assert sorted(r["first_id"] for r in seen2.collect()) == [5, 8]
    # kept rows carry the original payload columns, no helper columns
    assert set(kept2.columns) == {"id", "text"}


def test_incremental_dedup_equals_full_rerun(spark):
    """Batch-by-batch dedup keeps exactly the same ids a full-corpus
    exact dedup would (union of batches, min id per hash) when ids are
    assigned in batch order."""
    from baselinr_spark.operators.dedup import exact_dedup

    rows1 = [(i, f"text number {i % 4}") for i in range(8)]
    rows2 = [(i, f"text number {i % 6}") for i in range(8, 20)]
    b1 = spark.createDataFrame(rows1, "id long, text string")
    b2 = spark.createDataFrame(rows2, "id long, text string")
    kept1, seen = incremental_exact_dedup(b1, None, "id", "text")
    kept2, _ = incremental_exact_dedup(b2, seen, "id", "text")
    inc_ids = sorted(
        [r["id"] for r in kept1.collect()] + [r["id"] for r in kept2.collect()]
    )
    full = exact_dedup(b1.unionByName(b2), "id", "text")
    assert inc_ids == sorted(r["id"] for r in full.collect())
