"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm; public).

Local document fingerprinting with a GUARANTEE the other fingerprint
schemes in this package don't give: any shared substring of length
>= k + w - 1 characters between two documents is caught by at least
one shared selected fingerprint (the winnowing coverage theorem),
while the expected density of selected hashes is only 2/(w+1). MinHash
(dedup.py) estimates whole-document set resemblance; winnowing finds
LOCAL overlap — quoted passages, mirrored paragraphs, template
boilerplate — which is what plagiarism/mirror detection over a web
crawl actually needs.

Algorithm per document: normalize text, hash every k-char gram
(md5 -> first 15 hex chars -> int64, the package-wide hash idiom,
dedup.py:238), slide a window of w consecutive k-gram hashes and
select the minimum in each window; the distinct selected values are
the document's fingerprint set. (Classic robust winnowing breaks
ties toward the rightmost position — a positional detail only; the
selected VALUE set is identical to plain per-window min, which is
what we keep, so the composition is pure min-over-slidings.)

Spark-first shape: everything per-document is native higher-order
functions (transform / slice / array_min) inside WholeStageCodegen —
zero shuffle, zero Python. The cross-document match join is an
equi-join on the fingerprint value with a document-frequency cut
(boilerplate fingerprints shared by > max_df docs are dropped before
the self-join — the same quadratic-blowup guard as
dedup.py:ngram_jaccard_pairs), so at 100 TB the join output is
bounded by true local overlap, not by corpus-frequent template bytes.

Reference parity note: the reference has no winnowing operator; this
extends the dedup/fingerprint family (SURVEY.md §2 extensions) with
the standard public algorithm for local-overlap detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.dedup import normalize_text

DEFAULT_K = 8  # k-gram length in characters (MOSS-style char grams)
DEFAULT_W = 4  # window size; guarantee threshold t = k + w - 1


def _gram_hashes(text, k: int):
    """Array of int64 hashes of every k-char gram of normalized text.
    Empty array when the text is shorter than k characters."""
    s = normalize_text(text)
    n_h = F.length(s) - (k - 1)
    gram = lambda i: F.conv(
        F.substring(F.md5(F.substring(s, i, F.lit(k))), 1, 15), 16, 10
    ).cast("long")
    return F.when(
        n_h >= 1, F.transform(F.sequence(F.lit(1), n_h), gram)
    ).otherwise(F.array().cast("array<bigint>"))


def _staged_windows(df: DataFrame, id_col: str, text_col: str, k: int, w: int):
    """(staged_df, n_grams_col, window_mins_col) with the gram-hash
    array MATERIALIZED as a column in a separate projection first.
    Critical for performance: if the raw `_gram_hashes` expression tree
    were referenced inside each `F.slice` of the sliding-window
    transform, Catalyst would inline the whole md5-array construction
    once per window position — O(n²) md5 calls per document. Staging it
    as a column (multi-referenced, non-cheap, so CollapseProject keeps
    the projection boundary) makes the windows O(n·w) array reads."""
    staged = df.select(
        F.col(id_col).alias("id"),
        _gram_hashes(F.col(text_col), k).alias("__h"),
    )
    h = F.col("__h")
    n_h = F.size(h)
    wins = (
        F.when(n_h <= 0, F.array().cast("array<bigint>"))
        .when(n_h < w, F.array(F.array_min(h)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), n_h - (w - 1)),
                lambda j: F.array_min(F.slice(h, j, w)),
            )
        )
    )
    return staged, n_h, wins


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """(id, fp) — one row per distinct selected fingerprint per
    document. Documents shorter than k chars produce no rows; documents
    with fewer than w k-grams produce one fingerprint (the global min —
    the single degenerate window, per the paper's boundary convention).
    """
    staged, _, wins = _staged_windows(df, id_col, text_col, k, w)
    return staged.select(
        "id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_summary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Per-document fingerprint stats: number of k-grams, number of
    distinct selected fingerprints, and selection density
    n_fingerprints / n_grams (NULL for texts shorter than k chars;
    expected ~ 2/(w+1) for random text — the winnowing density bound).
    Two stacked row-local projections, no shuffle."""
    staged, n_h, wins = _staged_windows(df, id_col, text_col, k, w)
    # Materialize the window-min array too: n_fingerprints and density
    # both read it, and inlining it twice would double the sliding-
    # window work inside one projection.
    staged2 = staged.select(
        "id",
        n_h.cast("long").alias("n_grams"),
        F.array_distinct(wins).alias("__fps"),
    )
    n_fp = F.size("__fps")
    return staged2.select(
        "id",
        "n_grams",
        n_fp.cast("long").alias("n_fingerprints"),
        F.when(F.col("n_grams") > 0, n_fp.cast("double") / F.col("n_grams"))
        .alias("density"),
    )


def winnow_matches(
    fingerprints: DataFrame,
    *,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """(id_a, id_b, n_shared) — document pairs sharing >= min_shared
    distinct fingerprints, id_a < id_b. `fingerprints` is the output of
    `winnow_fingerprints`. Fingerprints present in more than `max_df`
    documents are template/boilerplate bytes and are cut BEFORE the
    self-join (a fingerprint in d docs yields O(d^2) pair rows; the cut
    is what keeps the join linear at corpus scale). The self-join keys
    on the fingerprint value — the same key as the document-frequency
    groupBy, so the shuffle partitioning is reused."""
    dfreq = fingerprints.groupBy("fp").agg(
        F.count(F.lit(1)).alias("__df")
    )
    kept = fingerprints.join(
        dfreq.filter(F.col("__df") <= max_df).select("fp"), "fp"
    )
    return (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
