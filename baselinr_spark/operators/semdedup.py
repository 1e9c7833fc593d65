"""SemDeDup: semantic deduplication over an embedding column.

Recasts the SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540)
as a pure DataFrame composition of pieces this repo already has:

1. cluster the corpus embeddings (here: the deterministic md5-sampled
   IVF coarse quantizer from `operators/similarity.py` — the paper uses
   k-means; the inverted-file structure and the within-cluster pair step
   are identical, and a hash-sampled seed is how you initialize k-means
   at 10^12 docs without a full pass);
2. generate candidate pairs ONLY within a cluster (equi-join on
   centroid_id — the paper's core trick for bounding the quadratic
   pair term: cross-cluster near-dups are sacrificed by design);
3. connect pairs above the cosine threshold into components
   (`operators/dedup.py:connected_components`, HashMin propagation);
4. keep ONE doc per component — per the paper, the member with the
   LOWEST cosine similarity to its cluster centroid (keeping the
   "outlier" of each duplicate blob preserves more diversity than
   keeping the most central copy); ties break to the lowest id.

Scale shape (100 TB): centroids are broadcast; assignment is a map-side
pass; the only quadratic work is per-cell and the paper's own operating
point keeps cells bounded (n_centroids grows ∝ corpus, e.g. 50k clusters
over 5B docs ≈ 100k docs/cell); `max_cell_size` hard-caps degenerate
cells out of the pair join (same guard as the LSH bucket cap in
`dedup.py:minhash_lsh_pairs`). Everything is equi-join + window — no
cross join against the corpus anywhere.

Reference parity note: the reference engine has no semantic dedup; this
is one of the additive training-data-pipeline operators (SURVEY.md §2
"beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.dedup import connected_components
from baselinr_spark.operators.similarity import (
    cosine_expr,
    ivf_assign,
    ivf_centroids,
)


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    threshold: float = 0.97,
    max_cell_size: int = 100_000,
    max_iter: int = 12,
) -> DataFrame:
    """Semantic-dedup verdict per vector.

    Returns (vec_id, centroid_id, cent_cosine, component, keep):
    `component` is the min-id member of the vector's duplicate group
    (its own id if it has no semantic duplicate), `keep` marks the one
    member per group that survives — the lowest-centroid-cosine member,
    ties to the lowest id. Filtering `keep` reproduces the paper's
    pruned corpus; keeping all rows gives the audit trail.
    """
    assign = ivf_assign(
        df, ivf_centroids(df, id_col, vec_col, n_centroids), id_col, vec_col
    ).select(
        "vec_id", "centroid_id", F.col("cosine").alias("cent_cosine")
    )
    member = assign.join(
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
        "vec_id",
    )
    # degenerate-cell guard: a cell larger than max_cell_size would make
    # the self-join quadratic in that cell; such cells mean n_centroids
    # is undersized for the corpus — drop them from PAIR GENERATION only
    # (their members still appear in the output as singletons).
    cell_sizes = member.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("__cell_n")
    )
    paired = member.join(
        F.broadcast(cell_sizes.where(F.col("__cell_n") <= max_cell_size)),
        "centroid_id",
    )
    a = paired.select(
        "centroid_id",
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("vec_a"),
    )
    b = paired.select(
        "centroid_id",
        F.col("vec_id").alias("id_b"),
        F.col("vec").alias("vec_b"),
    )
    pairs = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_expr(F.col("vec_a"), F.col("vec_b")))
        .where(F.col("cos") >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )
    comps = connected_components(pairs, max_iter=max_iter)
    labeled = assign.join(
        comps, assign["vec_id"] == comps["id"], "left"
    ).select(
        "vec_id",
        "centroid_id",
        "cent_cosine",
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
    )
    from pyspark.sql import Window as W

    # rank on the ROUNDED centroid cosine so the keeper choice is stable
    # across engines/FP-summation orders (same reason gate outputs round
    # through _r6); ties break to the lowest id.
    w = W.partitionBy("component").orderBy(
        F.round(F.col("cent_cosine"), 6).asc(), F.col("vec_id").asc()
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .select(
            "vec_id",
            "centroid_id",
            "cent_cosine",
            "component",
            (F.col("__rn") == 1).alias("keep"),
        )
    )


def semdedup_prune(
    df: DataFrame,
    verdicts: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Apply semdedup verdicts: rows whose id is marked keep=false are
    dropped; rows with no verdict (not embedded) pass through."""
    losers = verdicts.where(~F.col("keep")).select(
        F.col("vec_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
