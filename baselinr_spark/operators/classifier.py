"""Hashed-feature multinomial Naive Bayes text classifier — the
train-then-apply quality/language filter shape (CCNet's fastText
quality scorer, the GPT-3/LLaMA "positive vs random CommonCrawl"
classifier), recast as pure DataFrame aggregation.

Two trainers, one feature space:

* NB (``nb_train``): the closed form — ONE groupBy over the exploded
  gram stream trains the model, no iteration, and every arithmetic
  step (add-k smoothed log-likelihoods, per-doc log-odds sums) has an
  exact DuckDB replay, so the gate can value-hash the whole
  train→score round trip. The default for a threshold keep/drop.
* GD logistic regression (``logreg_train_gd``): the discriminative
  counterpart when calibrated probabilities or a learned decision
  boundary matter — FIXED-step full-batch gradient descent (no SGD
  randomness), each iteration two bounded shuffles with the model
  state broadcast, and the whole unrolled iteration sequence replayed
  exactly by a MATERIALIZED-CTE DuckDB oracle (the same pattern the
  PageRank/HITS oracles use, operators/linkgraph.py).

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


def logreg_train_gd(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: Column | str,
    *,
    n_buckets: int = 256,
    steps: int = 3,
    lr: float = 2.0,
) -> DataFrame:
    """Full-batch gradient-descent logistic regression on the same
    hashed n-gram features as ``nb_train`` — the iterative counterpart
    to NB's closed form, for when the filter needs a discriminative
    decision boundary (the fastText-classifier shape of the GPT-3 /
    LLaMA CommonCrawl quality filters, trained entirely in DataFrame
    ops — no MLlib, no driver-side math).

    Documented spec (replayed exactly by the DuckDB oracle, same
    unrolled-iteration pattern as the PageRank/HITS oracles in
    operators/linkgraph.py):

    * features: per-doc hashed bucket counts L1-normalized within the
      document (x_b = cnt_b / Σ cnt), plus a constant bias feature at
      bucket −1 — normalization bounds every margin by max|w|, so a
      fixed step size is stable regardless of document length.
    * w ← w − (lr/n)·Σ_i x_i(σ(w·x_i) − y_i), w₀ = 0, run a FIXED
      ``steps`` full-batch iterations (deterministic — no shuffling,
      no minibatch RNG; convergence is the caller's threshold choice,
      exactness is the contract here).

    Scale (10^12 docs): model state is n_buckets+1 rows, broadcast to
    every join; each step costs two bounded shuffles — margins
    (groupBy doc over the persisted feature table) and gradient
    (groupBy bucket, map-side-combined to ≤ n_buckets+1 rows per map
    partition). The feature table is built ONCE and persisted; the
    per-step weight table is localCheckpointed so plans stay flat.
    The residual join back to features is on the id key the features
    already carry. Returns (bucket, w) with bucket −1 = bias.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    docs = df.select(F.col(id_col), F.col(text_col), lab.cast("boolean").alias("__y"))
    counts = hashed_gram_buckets(docs, id_col, text_col, n_buckets=n_buckets)
    tot = counts.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    x = (
        counts.join(tot, id_col)
        .select(id_col, "bucket", (F.col("cnt") / F.col("__tot")).alias("x"))
        .unionByName(
            docs.select(
                F.col(id_col), F.lit(-1).cast("long").alias("bucket"),
                F.lit(1.0).alias("x"),
            )
        )
        .persist()
    )
    y = docs.select(id_col, "__y")
    n1 = F.broadcast(docs.agg(F.count(F.lit(1)).cast("double").alias("__n")))

    spark = df.sparkSession
    weights = (
        spark.range(-1, n_buckets)
        .select(F.col("id").alias("bucket"), F.lit(0.0).alias("w"))
        .localCheckpoint()
    )
    for _ in range(int(steps)):
        margins = (
            x.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("__m"))
        )
        resid = y.join(margins, id_col, "left").select(
            id_col,
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce(F.col("__m"), F.lit(0.0))))
                - F.col("__y").cast("double")
            ).alias("__r"),
        )
        grad = (
            x.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("__r")).alias("__g"))
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .crossJoin(n1)
            .select(
                "bucket",
                (
                    F.col("w")
                    - F.lit(float(lr))
                    * F.coalesce(F.col("__g"), F.lit(0.0))
                    / F.col("__n")
                ).alias("w"),
            )
            .localCheckpoint()
        )
    x.unpersist()
    return weights


def logreg_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """Score under a trained GD model: (id, prob, pred). Features are
    recomputed with the same md5 hashing + per-doc L1 normalization;
    prob = σ(w·x); pred = prob > 0.5. Empty docs score the bias alone.
    The weight join is broadcast (n_buckets+1 rows)."""
    counts = hashed_gram_buckets(df, id_col, text_col, n_buckets=n_buckets)
    tot = counts.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    x = (
        counts.join(tot, id_col)
        .select(id_col, "bucket", (F.col("cnt") / F.col("__tot")).alias("x"))
        .unionByName(
            df.select(
                F.col(id_col), F.lit(-1).cast("long").alias("bucket"),
                F.lit(1.0).alias("x"),
            )
        )
    )
    margins = (
        x.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("__m"))
    )
    return df.select(id_col).join(margins, id_col, "left").select(
        id_col,
        (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.coalesce(F.col("__m"), F.lit(0.0))))
        ).alias("prob"),
    ).withColumn("pred", F.col("prob") > 0.5)


def stump_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """1-D decision stump: the single threshold t on a score that
    best separates a boolean label under Gini impurity (CART's split
    criterion, Breiman et al. 1984; public) — "learn the keep/drop
    cutoff from labels" as one aggregation, the supervised
    counterpart of the unsupervised GMM split (operators/gmm.py) and
    conformal threshold (selection.py). Split form: predict positive
    when score <= t.

    Returns ONE row: (threshold, n_left, n_right, gini_parent,
    gini_split, gain) for the argmax-gain threshold (ties -> smallest
    threshold).

    Scale design: ONE groupBy collapses the corpus to per-distinct-
    score (pos, neg) counts; the cumulative scan + argmax run on the
    O(distinct scores) table (a single-partition window — fine for
    scores with bounded cardinality; QUANTIZE the score first at
    corpus scale, e.g. round to 3 decimals, which changes candidate
    thresholds but not the plan shape).
    """
    from pyspark.sql import Window as W

    per = (
        df.select(
            F.col(score_col).cast("double").alias("s"),
            F.col(label_col).cast("int").alias("y"),
        )
        .filter(F.col("s").isNotNull() & F.col("y").isNotNull())
        .groupBy("s")
        .agg(
            F.sum("y").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).alias("neg"),
        )
    )
    tot = per.agg(
        F.sum("pos").alias("__P"), F.sum("neg").alias("__N")
    )
    from .windows import running_sums

    cum = running_sums(per, ["s"], ["pos", "neg"]).select(
        "s",
        F.col("__cum_pos").alias("pl"),
        F.col("__cum_neg").alias("nl"),
    ).crossJoin(F.broadcast(tot))
    nl = F.col("pl") + F.col("nl")
    nr = F.col("__P") + F.col("__N") - nl
    pr = F.col("__P") - F.col("pl")
    nrr = F.col("__N") - F.col("nl")

    def gini(p, n, tot_):
        return F.when(
            tot_ > 0,
            1.0
            - (p / tot_) * (p / tot_)
            - (n / tot_) * (n / tot_),
        ).otherwise(0.0)

    total = F.col("__P") + F.col("__N")
    g_split = (nl / total) * gini(F.col("pl"), F.col("nl"), nl) + (
        nr / total
    ) * gini(pr, nrr, nr)
    g_parent = gini(F.col("__P"), F.col("__N"), total)
    scored = cum.filter(nr > 0).select(
        F.col("s").alias("threshold"),
        nl.cast("bigint").alias("n_left"),
        nr.cast("bigint").alias("n_right"),
        F.round(g_parent, 6).alias("gini_parent"),
        F.round(g_split, 6).alias("gini_split"),
        F.round(g_parent - g_split, 6).alias("gain"),
    )
    return scored.orderBy(F.desc("gain"), F.asc("threshold")).limit(1)


def oracle_stump_threshold_sql(
    rows_sql: str, score_col: str, label_col: str
) -> str:
    """DuckDB twin of :func:`stump_threshold`."""
    return f"""
WITH rows_in AS (
  SELECT {score_col}::double AS s, {label_col}::int AS y
  FROM ({rows_sql})
  WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
),
per AS (
  SELECT s, sum(y) AS pos, sum(1 - y) AS neg FROM rows_in GROUP BY 1
),
tot AS (SELECT sum(pos)::double AS P, sum(neg)::double AS N FROM per),
cum AS (
  SELECT s,
         sum(pos) OVER (ORDER BY s)::double AS pl,
         sum(neg) OVER (ORDER BY s)::double AS nl
  FROM per
),
scored AS (
  SELECT s AS threshold,
         (pl + nl)::bigint AS n_left,
         (tot.P + tot.N - pl - nl)::bigint AS n_right,
         1.0 - (tot.P / (tot.P + tot.N)) ^ 2
             - (tot.N / (tot.P + tot.N)) ^ 2 AS gp,
         ((pl + nl) / (tot.P + tot.N)) *
           (CASE WHEN pl + nl > 0 THEN
              1.0 - (pl / (pl + nl)) ^ 2 - (nl / (pl + nl)) ^ 2
            ELSE 0.0 END)
         + ((tot.P + tot.N - pl - nl) / (tot.P + tot.N)) *
           (CASE WHEN tot.P + tot.N - pl - nl > 0 THEN
              1.0 - ((tot.P - pl) / (tot.P + tot.N - pl - nl)) ^ 2
                  - ((tot.N - nl) / (tot.P + tot.N - pl - nl)) ^ 2
            ELSE 0.0 END) AS gs
  FROM cum, tot
  WHERE tot.P + tot.N - pl - nl > 0
)
SELECT threshold, n_left, n_right, round(gp, 6) AS gini_parent,
       round(gs, 6) AS gini_split, round(gp - gs, 6) AS gain
FROM scored
ORDER BY round(gp - gs, 6) DESC, threshold
LIMIT 1"""
