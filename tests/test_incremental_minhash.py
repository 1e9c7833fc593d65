"""Snapshot-incremental MinHash-LSH dedup (operators/dedup.py:
incremental_minhash_dedup) — the near-dup twin of the incremental exact
dedup contract tested in test_classifier.py. Hand-planted near-dups:
perturbing one word of a 12-word doc keeps shingle-set Jaccard high, so
LSH banding (k=8, 4 bands × 2 rows) catches it deterministically."""

import pytest
from pyspark.sql import functions as F

from baselinr_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_band_index,
    minhash_lsh_pairs,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river",
    "pack my box with five dozen liquor jugs before the long trip",
    "sphinx of black quartz judge my vow under a silver moon sky",
    "how vexingly quick daft zebras jump across the frozen white lake",
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, text string")


def test_first_batch_no_index(spark):
    """index=None: only intra-batch dedup runs; near-dup of a smaller
    id is dropped, distinct docs survive."""
    rows = [(i, t) for i, t in enumerate(BASE)]
    rows.append((10, BASE[0] + " extra"))  # near-dup of id 0
    kept, idx, sg = incremental_minhash_dedup(
        _df(spark, rows), None, None, "id", "text", shingle_n=1
    )
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [0, 1, 2, 3]
    assert sorted(r["id"] for r in sg.collect()) == [0, 1, 2, 3]
    # one index row per (kept doc, band)
    assert idx.count() == 4 * 4


def test_second_batch_probes_index(spark):
    """Batch 2 docs near-duplicate of batch-1 keepers are dropped by
    the probe; genuinely new docs survive and extend the deltas."""
    b1 = _df(spark, [(i, t) for i, t in enumerate(BASE[:2])])
    _, idx, sg = incremental_minhash_dedup(
        b1, None, None, "id", "text", shingle_n=1
    )
    b2 = _df(
        spark,
        [
            (100, BASE[0] + " tail"),  # near-dup of accepted id 0 -> drop
            (101, BASE[2]),            # new -> keep
            (102, BASE[2] + " word"),  # intra-batch near-dup of 101 -> drop
            (103, BASE[3]),            # new -> keep
        ],
    )
    kept, idx2, sg2 = incremental_minhash_dedup(
        b2, idx, sg, "id", "text", shingle_n=1
    )
    assert sorted(r["id"] for r in kept.collect()) == [101, 103]
    assert sorted(r["id"] for r in sg2.collect()) == [101, 103]
    assert idx2.count() == 2 * 4


def test_matches_whole_corpus_pairs(spark):
    """Cross-batch near-dup pairs the incremental path drops are
    exactly the pairs a whole-corpus LSH run reports (no chains in
    this fixture, so greedy == components)."""
    rows1 = [(i, t) for i, t in enumerate(BASE)]
    rows2 = [(100 + i, t + " suffix") for i, t in enumerate(BASE[:2])] + [
        (200, "completely different words describing an unrelated topic entirely today")
    ]
    b1, b2 = _df(spark, rows1), _df(spark, rows2)
    _, idx, sg = incremental_minhash_dedup(b1, None, None, "id", "text", shingle_n=1)
    kept, _, _ = incremental_minhash_dedup(b2, idx, sg, "id", "text", shingle_n=1)
    full_pairs = minhash_lsh_pairs(
        b1.unionByName(b2), "id", "text", shingle_n=1, threshold=0.5
    )
    dropped_full = {r["id_b"] for r in full_pairs.collect()}
    kept_ids = {r["id"] for r in kept.collect()}
    assert kept_ids == {100 + i for i in range(2)} - dropped_full | {200}


def test_index_split_shapes(spark):
    """minhash_band_index returns the two normalized state tables."""
    bands_df, sigs_df = minhash_band_index(
        _df(spark, [(i, t) for i, t in enumerate(BASE)]), "id", "text", shingle_n=1
    )
    assert bands_df.columns == ["id", "band", "key"]
    assert sigs_df.columns == ["id", "sigs"]
    assert bands_df.count() == 4 * 4
    assert sigs_df.select(F.max(F.size("sigs"))).collect()[0][0] == 8


def test_idempotent_reprobe(spark):
    """Re-submitting an accepted batch drops everything — the crash/
    retry story for a rolling ingest."""
    b1 = _df(spark, [(i, t) for i, t in enumerate(BASE)])
    _, idx, sg = incremental_minhash_dedup(b1, None, None, "id", "text", shingle_n=1)
    kept, idx2, sg2 = incremental_minhash_dedup(
        b1.withColumn("id", F.col("id") + 500), idx, sg, "id", "text", shingle_n=1
    )
    assert kept.count() == 0
    assert idx2.count() == 0 and sg2.count() == 0


def test_threshold_sweep_matches_pair_list(spark):
    """Sweep counts equal the per-threshold counts derived directly
    from the LSH pair list (the definition), and are monotone
    non-increasing in t; the planted exact dup fires at t=1.0."""
    from collections import defaultdict

    from baselinr_spark.operators.dedup import dedup_threshold_sweep

    rows = [(i, t) for i, t in enumerate(BASE)]
    rows += [(10, BASE[0]), (11, BASE[1] + " tail")]
    df = _df(spark, rows)
    ts = (0.25, 0.5, 1.0)
    out = dedup_threshold_sweep(
        df, "id", "text", shingle_n=1, thresholds=ts
    ).collect()
    by_t = {r["threshold"]: (r["n_pairs"], r["n_dropped"]) for r in out}
    assert set(by_t) == set(ts)

    pairs = minhash_lsh_pairs(
        df, "id", "text", shingle_n=1, threshold=min(ts)
    ).collect()
    max_est = defaultdict(float)
    for p in pairs:
        max_est[p["id_b"]] = max(max_est[p["id_b"]], p["est_jaccard"])
    for t in ts:
        exp_pairs = sum(1 for p in pairs if p["est_jaccard"] >= t)
        exp_dropped = sum(1 for m in max_est.values() if m >= t)
        assert by_t[t] == (exp_pairs, exp_dropped)
    # planted exact dup (10 == doc 0) must fire even at t=1.0
    assert by_t[1.0][1] >= 1
    lo_hi = sorted(ts)
    for lo, hi in zip(lo_hi, lo_hi[1:]):
        assert by_t[lo][0] >= by_t[hi][0]
        assert by_t[lo][1] >= by_t[hi][1]
