"""TF-IDF term weighting over a documents table.

Classic corpus-relevance scoring used by training-data pipelines for
keyword extraction, topical sampling, and building cheap quality /
domain classifiers (the hashed-NB classifier in
``operators/classifier.py`` is the supervised sibling; this is the
unsupervised weighting). The reference repo has no term-weighting
surface (its text analysis stops at schema/format validators,
``/root/reference/baselinr/validation/rules.py``), so this module is
additive web-text-tier coverage.

Scale design (10^12 docs, ~10^8-term vocabulary):

* ``doc_term_freqs`` is ONE ``groupBy(id, term)`` over the exploded
  token stream — map-side partial aggregation collapses each page's
  repeated words before the shuffle, so the shuffled volume is
  distinct (doc, term) pairs, far below the token count.
* ``term_idf`` re-aggregates that table by term only (a second
  map-side-combining agg, O(vocab) output) with the corpus doc count
  attached via a 1-row broadcast crossJoin (house rule — see
  ``operators/linkgraph.py``).
* ``tfidf_topk`` joins the two on the term key. The vocabulary side is
  O(vocab) — much smaller than the (doc, term) side but potentially too
  large to broadcast at full web scale, so no broadcast hint is forced;
  AQE picks broadcast when the vocab fits. The per-document top-k rank
  window partitions by doc id, so each window holds at most one page's
  distinct terms — bounded by document length, never corpus-scale.

Tokenization matches ``operators/textanalysis.py:words_expr``
(whitespace split) lowercased, so vocabularies line up across the
text-analysis suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from baselinr_spark.operators.textanalysis import words_expr


def doc_term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(document, term) raw counts over lowercased whitespace
    tokens. One shuffle; map-side combine collapses in-page repeats."""
    tokens = df.select(
        F.col(id_col),
        F.explode(words_expr(F.lower(F.col(text_col)))).alias("term"),
    )
    return tokens.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def term_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-term document frequency and smoothed IDF:
    ``idf = ln((N + 1) / (doc_freq + 1)) + 1`` (sklearn's
    ``smooth_idf`` convention — never zero, never divides by zero).
    Returns (term, doc_freq, idf)."""
    tf = doc_term_freqs(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return dfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        "doc_freq",
        (
            F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)) + 1
        ).alias("idf"),
    )


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-``k`` terms per document by ``tf * idf``, deterministic
    tie-break (score desc, term asc). Returns
    (id_col, rank, term, tf, doc_freq, tfidf)."""
    tf = doc_term_freqs(df, id_col, text_col)
    idf = term_idf(df, id_col, text_col)
    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        "tf",
        "doc_freq",
        (F.col("tf") * F.col("idf")).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "doc_freq", "tfidf")
    )
