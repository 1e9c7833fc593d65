"""Hashed-feature multinomial Naive Bayes text classifier — the
train-then-apply quality/language filter shape (CCNet's fastText
quality scorer, the GPT-3/LLaMA "positive vs random CommonCrawl"
classifier), recast as pure DataFrame aggregation.

Why NB and not logistic regression: NB's MLE is a closed-form count
aggregation — ONE groupBy over the exploded gram stream trains the
model, no iterative driver loop, and every arithmetic step (add-k
smoothed log-likelihoods, per-doc log-odds sums) has an exact DuckDB
replay, so the gate can value-hash the whole train→score round trip.
LR would need SGD epochs (driver-looped jobs) for a filter whose
downstream use is a threshold keep/drop either way.

Scale design (the 100 TB question):
* model state is exactly ``n_buckets`` rows per class — broadcast to
  the scoring join regardless of corpus size; training is one
  map-side-combining groupBy of the hashed gram stream (reuses
  selection.hashed_gram_buckets — same explode the DSIR path pays).
* scoring shuffles only (doc, bucket, cnt) — bounded by tokens, and
  the model join is broadcast, so no corpus-scale shuffle beyond the
  bucket-count groupBy itself.
* all hashing is md5-derived → engine-independent determinism.

The reference has no text classifier (its scoring surface is the
rule/metric quality score, recast in operators/quality.py); this is
LLM-pipeline surface added per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .selection import hashed_gram_buckets

__all__ = ["nb_train", "nb_score", "nb_train_score"]


def nb_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: Column | str,
    *,
    n_buckets: int = 1024,
    add_k: float = 1.0,
) -> DataFrame:
    """Train a binary multinomial NB model. ``label_col`` is a boolean
    column/expression marking the positive class. Returns the model as
    (bucket, llr, prior_llr): per-bucket log-likelihood ratio
    log P(b|pos) − log P(b|neg) under add-k smoothing over the FULL
    bucket space (unseen buckets stay finite), and the constant
    log-prior ratio log P(pos) − log P(neg) replicated on every row so
    the model stays a single self-contained broadcastable table."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    docs = df.withColumn("__pos", lab.cast("boolean"))
    counts = hashed_gram_buckets(
        docs, id_col, text_col, n_buckets=n_buckets, carry_cols=("__pos",)
    )
    per_bucket = counts.groupBy("bucket").agg(
        F.sum(F.when(F.col("__pos"), F.col("cnt")).otherwise(F.lit(0))).alias("p_cnt"),
        F.sum(F.when(~F.col("__pos"), F.col("cnt")).otherwise(F.lit(0))).alias("n_cnt"),
    )
    # densify to the FULL bucket space: buckets no training gram hit
    # still get the smoothed-uniform llr, so scoring text with unseen
    # grams is exact add-k NB, not a silent zero-contribution
    all_buckets = df.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    per_bucket = all_buckets.join(per_bucket, "bucket", "left").fillna(
        {"p_cnt": 0, "n_cnt": 0}
    )
    doc_counts = docs.agg(
        F.sum(F.col("__pos").cast("long")).alias("p_docs"),
        F.sum((~F.col("__pos")).cast("long")).alias("n_docs"),
    )
    totals = per_bucket.agg(
        F.sum("p_cnt").alias("p_tot"), F.sum("n_cnt").alias("n_tot")
    ).crossJoin(F.broadcast(doc_counts))
    k = float(add_k)
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("p_cnt") + k) / (F.col("p_tot") + k * n_buckets))
            - F.log((F.col("n_cnt") + k) / (F.col("n_tot") + k * n_buckets))
        ).alias("llr"),
        (
            F.log(F.col("p_docs").cast("double"))
            - F.log(F.col("n_docs").cast("double"))
        ).alias("prior_llr"),
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Score documents under a trained model: (id, log_odds, pred).
    log_odds = prior_llr + Σ_b cnt_b · llr(b); pred = log_odds > 0.
    Empty documents (no grams) score exactly the prior. The model join
    is broadcast (n_buckets rows); ``n_buckets`` must match training —
    buckets are recomputed from the text with the same md5 hash."""
    counts = hashed_gram_buckets(df, id_col, text_col, n_buckets=n_buckets)
    prior = model.select("prior_llr").limit(1)
    scored = (
        counts.join(F.broadcast(model.select("bucket", "llr")), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("llr")).alias("gram_llr"))
    )
    ids = df.select(id_col)
    return (
        ids.join(scored, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            (F.col("prior_llr") + F.coalesce("gram_llr", F.lit(0.0))).alias("log_odds"),
        )
        .withColumn("pred", F.col("log_odds") > 0)
    )


def nb_train_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: Column | str,
    *,
    n_buckets: int = 1024,
    add_k: float = 1.0,
) -> DataFrame:
    """Train on the labeled frame and score the SAME frame (the
    resubstitution shape the gate checks end-to-end)."""
    model = nb_train(
        df, id_col, text_col, label_col, n_buckets=n_buckets, add_k=add_k
    )
    return nb_score(df, model, id_col, text_col, n_buckets=n_buckets)
