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
