"""Content-defined chunking (operators/cdc.py): tiling, shift
invariance, and dup-exposure invariants."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.cdc import (
    cdc_chunks,
    cdc_doc_summary,
    cdc_dup_chunks,
)

LONG_A = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the rain keeps falling on the old tin roof"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, LONG_A),
        (2, "COMPLETELY different prefix material here. " + LONG_A),
        (3, "tiny"),          # shorter than k=8 -> one whole chunk
        (4, ""),              # empty -> no chunks
        (5, LONG_A),          # exact duplicate of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def chunks(docs):
    return cdc_chunks(docs, "doc_id", "text").cache()


def test_chunks_tile_text_exactly(chunks):
    # gapless + ordered: starts/lengths reconstruct [1..len] per doc
    for r in (
        chunks.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "start", "chunk_len"))
            ).alias("cs")
        )
        .collect()
    ):
        pos = 1
        for c in r["cs"]:
            assert c["start"] == pos
            assert c["chunk_len"] >= 1
            pos += c["chunk_len"]


def test_short_and_empty_docs(chunks):
    got = {r["doc_id"]: r for r in chunks.filter("doc_id >= 3").collect()
           if r["doc_id"] in (3, 4)}
    assert got[3]["chunk_len"] == 4 and got[3]["chunk_idx"] == 0
    assert 4 not in got  # empty text yields zero chunks


def test_shift_invariance_shared_suffix(chunks):
    """Doc 2 = junk prefix + doc 1: after the first content-defined
    boundary inside the shared region, chunking re-synchronizes, so
    most of doc 1's chunk hashes reappear in doc 2."""
    h1 = {r["chunk_hash"] for r in chunks.filter("doc_id = 1").collect()}
    h2 = {r["chunk_hash"] for r in chunks.filter("doc_id = 2").collect()}
    shared = h1 & h2
    assert len(shared) >= len(h1) - 2  # at most the first chunks differ


def test_exact_duplicate_full_exposure(chunks):
    summ = {r["doc_id"]: r for r in cdc_doc_summary(chunks, "doc_id").collect()}
    assert summ[1]["dup_len_share"] == 1.0  # doc 5 is an exact copy
    assert summ[5]["dup_len_share"] == 1.0
    assert summ[3]["dup_len_share"] == 0.0


def test_dup_chunks_table(chunks):
    dups = cdc_dup_chunks(chunks).collect()
    assert all(r["n_docs"] >= 2 for r in dups)
    # every chunk of doc 1 is duplicated (doc 5 copy) -> appears here
    n1 = chunks.filter("doc_id = 1").count()
    assert len(dups) >= n1


def test_cdc_layout_zero_shuffle(docs):
    """Chunk layout is per-document HOF work — no Exchange in the
    plan before the explode."""
    plan = (
        cdc_chunks(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
