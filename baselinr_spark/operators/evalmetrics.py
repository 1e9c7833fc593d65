"""Classifier evaluation sweeps for quality-filter calibration.

The north-rule acceptance metric for a web-text quality filter is
keep/drop F1 vs reference labels; this module is the evaluation
harness that computes it — and the full threshold sweep used to
CHOOSE the operating point — as one distributed pass. The reference
repo has no evaluation surface (its scoring stops at the composite
quality score, ``/root/reference/baselinr/scoring/``), so this is
additive coverage; the per-label parity test in
``tests/test_pipeline_e2e.py`` asserts the F1=1.0 case, this operator
generalizes it to arbitrary score columns.

Scale design (10^12 docs, T thresholds): each row fans out to T
(threshold, outcome) pairs via an exploded literal array — T is a
handful, the fan-out is map-local, and the single groupBy(threshold)
aggregation map-side-combines to T rows per partition before the
shuffle. Total shuffled volume: T rows per map partition, independent
of corpus size. No UDFs, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_sweep(
    df: DataFrame,
    label_col: str,
    score_col: str,
    thresholds: Sequence[float],
) -> DataFrame:
    """Confusion counts + precision/recall/F1/accuracy at each score
    threshold (predict positive when ``score >= threshold``).

    Returns one row per threshold: (threshold, tp, fp, fn, tn,
    precision, recall, f1, accuracy); zero-denominator metrics emit
    0.0. Null labels/scores are excluded (counted in none of the
    cells)."""
    e = (
        df.select(
            F.col(label_col).cast("boolean").alias("__y"),
            F.col(score_col).cast("double").alias("__s"),
        )
        .filter(F.col("__y").isNotNull() & F.col("__s").isNotNull())
        .select(
            "__y",
            "__s",
            F.explode(
                F.array(*[F.lit(float(t)) for t in thresholds])
            ).alias("threshold"),
        )
    )
    pred = F.col("__s") >= F.col("threshold")
    y = F.col("__y")
    agg = e.groupBy("threshold").agg(
        F.sum((pred & y).cast("long")).alias("tp"),
        F.sum((pred & ~y).cast("long")).alias("fp"),
        F.sum((~pred & y).cast("long")).alias("fn"),
        F.sum((~pred & ~y).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(0.0)
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(0.0)
    f1 = F.when(2 * tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn)).otherwise(0.0)
    acc = F.when(
        tp + fp + fn + tn > 0, (tp + tn) / (tp + fp + fn + tn)
    ).otherwise(0.0)
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        acc.alias("accuracy"),
    )


def oracle_confusion_sweep_sql(
    rows_sql: str,
    label_col: str,
    score_col: str,
    thresholds: Sequence[float],
) -> str:
    """DuckDB twin of :func:`confusion_sweep` over ``rows_sql``."""
    th_list = ", ".join(repr(float(t)) for t in thresholds)
    return f"""
WITH rows_in AS ({rows_sql}),
th AS (SELECT unnest([{th_list}]::double[]) AS threshold),
e AS (
  SELECT th.threshold,
         ({label_col})::boolean AS y,
         ({score_col})::double AS s
  FROM rows_in, th
  WHERE ({label_col}) IS NOT NULL AND ({score_col}) IS NOT NULL
),
agg AS (
  SELECT threshold,
         sum((s >= threshold AND y)::int)::bigint AS tp,
         sum((s >= threshold AND NOT y)::int)::bigint AS fp,
         sum((s < threshold AND y)::int)::bigint AS fn,
         sum((s < threshold AND NOT y)::int)::bigint AS tn
  FROM e GROUP BY threshold
)
SELECT threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN tp::double / (tp + fp) ELSE 0.0 END
         AS precision,
       CASE WHEN tp + fn > 0 THEN tp::double / (tp + fn) ELSE 0.0 END
         AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN 2 * tp::double / (2 * tp + fp + fn) ELSE 0.0 END AS f1,
       CASE WHEN tp + fp + fn + tn > 0
            THEN (tp + tn)::double / (tp + fp + fn + tn)
            ELSE 0.0 END AS accuracy
FROM agg
"""


def rule_ablation(df: DataFrame, rule_cols: Sequence[str]) -> DataFrame:
    """Leave-one-out ablation over boolean fail-rule columns — the
    standard filter-tuning diagnostic: what does each rule cost the
    corpus, and what does it catch that nothing else catches?

    For each rule r over documents carrying ``rule_cols`` booleans
    (True = rule fires = drop), emit one row:
      (rule_name, fire_count, sole_drop_count, keep_rate_base,
       keep_rate_without, marginal_keep_gain)
    where ``keep_rate_without`` is the keep rate with r deleted from
    the bank, ``sole_drop_count`` the documents dropped ONLY by r
    (so marginal_keep_gain = sole_drop_count / n_docs), and
    ``keep_rate_base`` the all-rules keep rate (repeated per row for
    context).

    Scale shape: ONE aggregate over the corpus (2R+2 partial-agg
    counters, map-side combined to a single row) followed by a
    row-local explode to R output rows — no per-rule corpus re-scan,
    no shuffle beyond the one-row aggregate. Null rule values count
    as not-fired (the with_verdict coalesce convention).
    """
    fires = {r: F.coalesce(F.col(r), F.lit(False)) for r in rule_cols}
    none_fire = None
    for c in fires.values():
        none_fire = ~c if none_fire is None else (none_fire & ~c)
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(none_fire.cast("long")).alias("__kept"),
    ]
    for r, c in fires.items():
        others_quiet = None
        for r2, c2 in fires.items():
            if r2 == r:
                continue
            others_quiet = ~c2 if others_quiet is None else (others_quiet & ~c2)
        if others_quiet is None:  # single-rule bank
            others_quiet = F.lit(True)
        aggs.append(F.sum(c.cast("long")).alias(f"__fire_{r}"))
        aggs.append(
            F.sum((c & others_quiet).cast("long")).alias(f"__sole_{r}")
        )
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(r).alias("rule_name"),
            F.col(f"__fire_{r}").alias("fire_count"),
            F.col(f"__sole_{r}").alias("sole_drop_count"),
            F.round(F.col("__kept") / F.col("__n"), 6).alias("keep_rate_base"),
            F.round(
                (F.col("__kept") + F.col(f"__sole_{r}")) / F.col("__n"), 6
            ).alias("keep_rate_without"),
            F.round(F.col(f"__sole_{r}") / F.col("__n"), 6).alias(
                "marginal_keep_gain"
            ),
        )
        for r in rule_cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error for a
    probabilistic quality classifier (Guo et al. 2017, "On Calibration
    of Modern Neural Networks" — public metric): equal-width bins over
    predicted probability; per bin the count, mean predicted
    probability (confidence) and empirical positive rate (accuracy);
    ECE = Σ_b (n_b/N)·|conf_b − acc_b| replicated on every row so one
    query returns the whole diagnostic.

    A filter whose scores are used as sampling weights or thresholds
    downstream (CCNet buckets, DSIR resampling) needs calibrated
    probabilities, not just rank order — this is the check.

    ONE groupBy over the scored frame (map-side-combined to ≤ n_bins
    rows per partition) + a broadcast 1-row ECE join. Probabilities
    exactly 1.0 land in the last bin. Returns (bin, bin_lo, n, conf,
    acc, abs_gap, ece).
    """
    b = F.least(
        F.floor(F.col(prob_col) * F.lit(n_bins)).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    per_bin = (
        df.select(
            b.alias("bin"),
            F.col(prob_col).alias("__p"),
            F.col(label_col).cast("double").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__p").alias("conf"),
            F.avg("__y").alias("acc"),
        )
        .withColumn("abs_gap", F.abs(F.col("conf") - F.col("acc")))
        .withColumn("bin_lo", F.col("bin").cast("double") / F.lit(n_bins))
    )
    ece = F.broadcast(
        per_bin.agg(
            (
                F.sum(F.col("n") * F.col("abs_gap")) / F.sum("n")
            ).alias("ece")
        )
    )
    return per_bin.crossJoin(ece).select(
        "bin", "bin_lo", "n", "conf", "acc", "abs_gap", "ece"
    )
