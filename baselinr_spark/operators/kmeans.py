"""Lloyd's k-means over an embedding column — the iterative refinement
sibling of the sampled-centroid IVF quantizer (`operators/similarity.py:
ivf_centroids`, which SemDeDup and IVF-flat use as-is). Training-data
pipelines run a few Lloyd rounds to tighten cluster quality before
cluster-balanced sampling (`operators/selection.py`) or SemDeDup
pruning.

Scale design (10^12 vectors, k up to ~50k, d ~10^2-10^3):

* **Assignment** is a broadcast crossJoin against the O(k·d) centroid
  table + a map-side `min_by` — one narrow shuffle keyed by vec_id is
  avoided entirely: the argmin is computed per row (`F.aggregate` over
  the zipped arrays is a sequential, deterministic fold), so
  assignment is a single codegen stage.
* **Update** posexplodes assigned vectors to (centroid, dim, value)
  and aggregates elementwise means. groupBy(centroid, dim) partial
  aggregation collapses each task's rows to at most k·d cells before
  the shuffle — shuffled volume is O(tasks · k · d), independent of
  the corpus row count.
* **Convergence state** (the centroid table) is model-scale; each
  round is cut from the lineage with `localCheckpoint` exactly like
  the PageRank loop (`operators/linkgraph.py`), so the plan does not
  grow with iterations.
* Empty clusters keep their previous centroid (left join + coalesce),
  matching scikit-learn's practical behavior closely enough for data
  pipelines without a reseed heuristic.

All arithmetic is promoted to double BEFORE any subtraction (float32
parquet inputs), so results are engine-portable; distances fold left
to right deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.similarity import ivf_centroids


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_nearest(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest centroid by squared Euclidean distance (ties → lowest
    centroid_id). Returns (vec_id, centroid_id, sqdist)."""
    pts = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    cand = pts.crossJoin(
        F.broadcast(
            centroids.select(
                "centroid_id",
                F.col("centroid_vec").cast("array<double>").alias("__c"),
            )
        )
    ).withColumn("sqdist", _sqdist(F.col("__v"), F.col("__c")))
    best = cand.groupBy("vec_id").agg(
        F.min(F.struct("sqdist", "centroid_id")).alias("__best")
    )
    return best.select(
        "vec_id",
        F.col("__best.centroid_id").alias("centroid_id"),
        F.col("__best.sqdist").alias("sqdist"),
    )


def _update_centroids(
    df: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Elementwise cluster means; empty clusters keep the old vector."""
    joined = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).join(assigned.select("vec_id", "centroid_id"), "vec_id")
    cells = joined.select(
        "centroid_id", F.posexplode("__v").alias("dim", "val")
    ).groupBy("centroid_id", "dim").agg(F.avg("val").alias("mean"))
    new = cells.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda s: s["mean"],
        ).alias("new_vec")
    )
    return centroids.select(
        "centroid_id",
        F.col("centroid_vec").cast("array<double>").alias("centroid_vec"),
    ).join(new, "centroid_id", "left").select(
        "centroid_id",
        F.coalesce("new_vec", "centroid_vec").alias("centroid_vec"),
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_centroids: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the deterministic md5-sampled
    init (`ivf_centroids`) and return the final assignment
    (vec_id, centroid_id, sqdist)."""
    cents = ivf_centroids(df, id_col, vec_col, n_centroids=n_centroids)
    cents = cents.select(
        "centroid_id", F.col("centroid_vec").cast("array<double>").alias("centroid_vec")
    )
    for _ in range(iters):
        assigned = assign_nearest(df, cents, id_col, vec_col)
        cents = _update_centroids(
            df, assigned, cents, id_col, vec_col
        ).localCheckpoint(eager=True)
    return assign_nearest(df, cents, id_col, vec_col)


def kmeans_inertia(assigned: DataFrame) -> DataFrame:
    """Cluster sizes and within-cluster sum of squares (one agg)."""
    return assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("sqdist").alias("inertia"),
    )


def simplified_silhouette(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_centroids: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Per-cluster simplified silhouette after ``iters`` Lloyd rounds:
    s = (b − a) / max(a, b) with a = distance to the OWN centroid and
    b = distance to the nearest OTHER centroid (Hruschka et al.'s
    centroid-based simplification — O(n·k) instead of the classic
    O(n²) pairwise silhouette, the only form that scales past a few
    thousand vectors). Near +1 = compact/separated clusters worth
    keeping for cluster-balanced sampling; near 0 = k is fiction.

    Returns (centroid_id, n_members, avg_silhouette); a degenerate
    point at distance 0 from two centroids scores 0.

    Scale design: distances ride the same broadcast O(k·d) centroid
    crossJoin as assignment; best and second-best reduce via
    min(struct) groupBys on vec_id (the second join reuses the first's
    hash partitioning); nothing larger than k·d is ever collected or
    broadcast beyond the centroid table.
    """
    cents = ivf_centroids(df, id_col, vec_col, n_centroids=n_centroids)
    cents = cents.select(
        "centroid_id",
        F.col("centroid_vec").cast("array<double>").alias("centroid_vec"),
    )
    for _ in range(iters):
        assigned = assign_nearest(df, cents, id_col, vec_col)
        cents = _update_centroids(
            df, assigned, cents, id_col, vec_col
        ).localCheckpoint(eager=True)

    pts = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    dists = pts.crossJoin(
        F.broadcast(cents.select(
            "centroid_id", F.col("centroid_vec").alias("__c")
        ))
    ).select(
        "vec_id", "centroid_id", _sqdist(F.col("__v"), F.col("__c")).alias("sqdist")
    )
    best = dists.groupBy("vec_id").agg(
        F.min(F.struct("sqdist", "centroid_id")).alias("__b")
    ).select(
        "vec_id",
        F.col("__b.centroid_id").alias("own_id"),
        F.sqrt("__b.sqdist").alias("a"),
    )
    second = (
        dists.join(best, "vec_id")
        .filter(F.col("centroid_id") != F.col("own_id"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("sqdist", "centroid_id")).alias("__s"))
        .select("vec_id", F.sqrt("__s.sqdist").alias("b"))
    )
    sil = best.join(second, "vec_id").select(
        "own_id",
        F.when(
            F.greatest("a", "b") > 0,
            (F.col("b") - F.col("a")) / F.greatest("a", "b"),
        ).otherwise(F.lit(0.0)).alias("s"),
    )
    return sil.groupBy(F.col("own_id").alias("centroid_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.avg("s").alias("avg_silhouette"),
    )
