"""Contrastive triplet mining (operators/triplets.py)."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.triplets import contrastive_triplets


@pytest.fixture(scope="module")
def corpus(spark):
    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (4, 5)], ["id_a", "id_b"]
    )
    return ids, pairs


def test_triplet_invariants(corpus):
    ids, pairs = corpus
    out = contrastive_triplets(pairs, ids, "doc_id",
                               ids_are_dense=True).collect()
    assert len(out) == 3  # one triplet per pair
    valid = set(range(20))
    for r in out:
        assert r["negative"] in valid
        assert r["negative"] != r["anchor"]
        assert r["negative"] != r["positive"]


def test_triplet_determinism(corpus):
    ids, pairs = corpus
    a = sorted(map(tuple, contrastive_triplets(
        pairs, ids, "doc_id", ids_are_dense=True).collect()))
    b = sorted(map(tuple, contrastive_triplets(
        pairs, ids, "doc_id", ids_are_dense=True).collect()))
    assert a == b


def test_reroll_on_collision(spark):
    """n=3 corpus with the pair (0, 1): whatever roll 0 gives, the
    final negative must be doc 2 (the only non-colliding choice) or
    the pair is dropped — with 3 rolls over mod 3 the chance all three
    collide is tiny but deterministic; assert the actual behavior."""
    ids = spark.range(3).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    out = contrastive_triplets(pairs, ids, "doc_id",
                               ids_are_dense=True).collect()
    assert len(out) <= 1
    if out:
        assert out[0]["negative"] == 2


def test_dense_and_ranked_agree_on_dense_ids(corpus):
    ids, pairs = corpus
    dense = sorted(map(tuple, contrastive_triplets(
        pairs, ids, "doc_id", ids_are_dense=True).collect()))
    ranked = sorted(map(tuple, contrastive_triplets(
        pairs, ids, "doc_id", ids_are_dense=False).collect()))
    assert dense == ranked  # rank of a dense id IS the id


def test_sorted_ranks_match_global_window(spark):
    """The distributed rank construction must reproduce the exact
    row_number-over-sorted-order assignment for generic (string) ids."""
    from pyspark.sql import Window as W

    from baselinr_spark.operators.triplets import _sorted_ranks

    vals = [f"doc-{i:03d}" for i in (7, 3, 19, 0, 42, 8, 15, 1, 99, 23)]
    ids = spark.createDataFrame([(v,) for v in vals], ["__nid"])
    got = {r["__nid"]: r["__rank"] for r in _sorted_ranks(ids).collect()}
    expect = {v: i for i, v in enumerate(sorted(vals))}
    assert got == expect


def test_ranked_path_has_no_corpus_window(spark):
    """Plan shape: the generic-id rank path must range-repartition the
    id table instead of funnelling it through an unpartitioned
    row_number window (the only Window allowed is over the
    O(partitions) per-bucket count rows)."""
    import io
    from contextlib import redirect_stdout

    ids = spark.range(100).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    out = contrastive_triplets(pairs, ids, "doc_id", ids_are_dense=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" in plan.lower()
    # any window in the plan must consume the per-partition count
    # aggregate, never a row_number over the raw id projection
    assert "row_number" not in plan.lower()
