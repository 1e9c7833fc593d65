"""Sequence packing: concat-and-chunk token budgeting for LM training.

Pretraining dataloaders consume fixed-length token sequences, not
documents: the corpus is tokenized, documents are concatenated in a
deterministic order, and the stream is split every `budget` tokens
(documents may span a boundary). This operator computes that layout as
metadata — for each document, which packed sequence its first token
lands in, at what offset, and how many sequences it spans — so a
downstream writer can emit the packed shards without ever materializing
the concatenated stream.

Spark-first shape: one `regexp_count` for the token count (the same
BPE-ish pre-tokenizer proxy as `textanalysis.token_counts` — letter
runs / digit runs / single other non-space chars), one running-sum
window PER PACK KEY (e.g. the dt partition or source shard — never a
global window: each key's stream packs independently, which is also
what a sharded dataloader wants), all in WholeStageCodegen. At 100 TB
the window is keyed by the physical partition column, so state per task
is one running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    pack_key: str | None = None,
) -> DataFrame:
    """Packing layout per document.

    Returns (<pack_key,> <id_col>, n_tokens, seq_id, seq_offset,
    n_seqs_spanned): documents are ordered by <id_col> within each
    pack_key; `seq_id` is the fixed-`budget` chunk the document's first
    token falls into, `seq_offset` its position inside that chunk, and
    `n_seqs_spanned` how many chunks the document crosses (0-token docs
    span 1 by convention: they sit at a boundary but still belong to
    their sequence).
    """
    n_tok = F.regexp_count(F.col(text_col), F.lit(TOKEN_RE))
    keyed = df.select(
        *([F.col(pack_key)] if pack_key else []),
        F.col(id_col),
        n_tok.alias("n_tokens"),
    )
    w = (
        W.partitionBy(pack_key) if pack_key else W.partitionBy()
    ).orderBy(id_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    out = keyed.withColumn("__cum", F.sum("n_tokens").over(w))
    before = F.col("__cum") - F.col("n_tokens")
    last = F.greatest(F.col("__cum") - 1, before)  # 0-token doc: span 1
    return out.select(
        *([pack_key] if pack_key else []),
        id_col,
        "n_tokens",
        F.floor(before / budget).cast("long").alias("seq_id"),
        (before % budget).cast("long").alias("seq_offset"),
        (F.floor(last / budget) - F.floor(before / budget) + 1)
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def packing_summary(packed: DataFrame, pack_key: str | None = None) -> DataFrame:
    """Per-key packing stats: docs, total tokens, sequences produced,
    boundary-spanning docs — one agg over the layout."""
    keys = [pack_key] if pack_key else []
    grouped = packed.groupBy(*keys) if keys else packed.groupBy()
    return grouped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max(F.col("seq_id") + F.col("n_seqs_spanned")).alias("n_seqs"),
        F.sum((F.col("n_seqs_spanned") > 1).cast("int")).alias("n_spanning"),
    )


def truncation_loss(
    df: DataFrame,
    group_col: str,
    text_col: str,
    seq_lens: tuple[int, ...] = (512, 1024, 2048),
) -> DataFrame:
    """Per-group audit of what a hard max-sequence-length cutoff would
    cost: for each candidate seq_len L, the fraction of tokens lost to
    truncating every document at L (the alternative packing avoids)
    and how many documents get cut at all. The curve across L is the
    empirical basis for choosing a context length / packing budget —
    the pretraining twin of the reference's histogram-driven
    threshold recommendations (profiling/metrics.py histogram +
    recommender flow).

    Tokens = whitespace words of the normalized text (same spec as
    the dedup/minhash shingle tokenizer). Returns one row per
    (group, seq_len): (group, seq_len, n_docs, total_tokens,
    kept_tokens, docs_truncated, loss_frac).

    Scale design: ONE corpus aggregate per group computing all
    seq_lens as conditional sums (len(seq_lens) is config-sized), then
    a stack() unpivot of the G-row result — the corpus is never
    exploded |seq_lens|-fold the way a lens cross-join would.
    """
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda w: F.length(w) > 0,
    )
    nt = F.col("__nt")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(nt).cast("bigint").alias("total_tokens"),
    ]
    for L in seq_lens:
        aggs.append(
            F.sum(F.least(nt, F.lit(int(L)))).cast("bigint").alias(f"kept_{L}")
        )
        aggs.append(
            F.sum((nt > F.lit(int(L))).cast("int")).cast("bigint")
            .alias(f"trunc_{L}")
        )
    g = df.select(F.col(group_col).alias("grp"),
                  F.size(words).cast("bigint").alias("__nt")) \
          .groupBy("grp").agg(*aggs)
    stack_args = ", ".join(
        f"{int(L)}, kept_{L}, trunc_{L}" for L in seq_lens
    )
    long = g.selectExpr(
        "grp", "n_docs", "total_tokens",
        f"stack({len(seq_lens)}, {stack_args}) AS "
        "(seq_len, kept_tokens, docs_truncated)",
    )
    return long.select(
        F.col("grp").alias(group_col),
        F.col("seq_len").cast("int").alias("seq_len"),
        "n_docs",
        "total_tokens",
        "kept_tokens",
        "docs_truncated",
        (F.lit(1.0) - F.col("kept_tokens").cast("double")
         / F.col("total_tokens").cast("double")).alias("loss_frac"),
    )


def oracle_truncation_loss_sql(
    rows_sql: str,
    group_col: str,
    text_col: str,
    seq_lens: tuple[int, ...] = (512, 1024, 2048),
) -> str:
    """DuckDB twin of :func:`truncation_loss` (cross-join unnest of the
    lens list — fine at oracle scale; the Spark side does conditional
    aggs in one pass instead)."""
    lens = ", ".join(str(int(L)) for L in seq_lens)
    return f"""
WITH rows_in AS ({rows_sql}),
t AS (
  SELECT {group_col} AS grp,
         len(list_filter(string_split(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')), ' '),
                         x -> length(x) > 0))::bigint AS nt
  FROM rows_in
),
l AS (SELECT unnest([{lens}]) AS seq_len)
SELECT grp AS {group_col}, seq_len::int AS seq_len,
       count(*)::bigint AS n_docs,
       sum(nt)::bigint AS total_tokens,
       sum(least(nt, seq_len))::bigint AS kept_tokens,
       sum((nt > seq_len)::int)::bigint AS docs_truncated,
       1.0 - sum(least(nt, seq_len))::double / sum(nt)::double AS loss_frac
FROM t CROSS JOIN l GROUP BY 1, 2"""
