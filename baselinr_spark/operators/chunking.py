"""Sliding-window document chunking for context-length training.

Long web pages exceed a model's context window; training pipelines cut
them into fixed-size token chunks with an overlap so no span is lost at
a boundary (the Hugging Face ``return_overflowing_tokens`` idiom; the
complementary operator is ``operators/packing.py``, which packs SHORT
documents up to the budget — chunking splits LONG ones down to it).
The reference repo has no text rewriter at all, so this module is
additive training-data-pipeline coverage.

Chunk layout for ``n`` tokens, window ``chunk_tokens`` (``c``) and
``overlap_tokens`` (``v``), stride ``s = c - v``:

* chunk ``i`` covers tokens ``[i*s, min(i*s + c, n))``
* ``n_chunks = 1`` when ``n <= c`` (including the empty document,
  which yields one empty chunk so the row is never silently dropped),
  else ``(n - c + s - 1) // s + 1`` — pure integer arithmetic, so the
  Spark plan and the SQL oracle agree bit-for-bit; the final chunk may
  be shorter than ``c``.

Scale design: entirely row-local — tokenize, build the chunk-index
array with ``sequence``, ``slice`` out each window, ``posexplode``.
Zero shuffle, one whole-stage-codegen pass; output rows ≈
``total_tokens / stride`` regardless of document skew, and a single
giant page fans out into rows without ever materializing per-doc state
outside its own task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.textanalysis import words_expr


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
) -> DataFrame:
    """Split each document into overlapping whitespace-token windows.

    Returns (id_col, chunk_id, token_start, n_chunk_tokens,
    chunk_text); ``chunk_text`` re-joins the window's tokens with a
    single space (whitespace runs are not preserved — chunking is a
    tokenizer-side operator, not a byte-identity rewriter).
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    words = words_expr(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(words)
    # Spark's `/` on ints is double division, so the otherwise-branch
    # floors after the exact +(s-1) ceil trick (values stay integral)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride).alias("token_start"),
            F.slice(words, i * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.explode(chunks).alias("ch")
    )
    return exploded.select(
        id_col,
        F.col("ch.chunk_id").alias("chunk_id"),
        F.col("ch.token_start").alias("token_start"),
        F.size("ch.toks").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("ch.toks")).alias("chunk_text"),
    )
