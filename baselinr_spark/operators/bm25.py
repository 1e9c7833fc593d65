"""BM25 ranked retrieval over a documents table.

The standard web-corpus relevance scorer (Robertson/Sparck-Jones,
Lucene's default similarity) — used by training-data pipelines for
query-based corpus selection ("give me the top-k documents about X"),
retrieval-augmented dataset building, and decontamination probes. The
reference repo has no retrieval surface (its text handling stops at
schema/format validators, ``/root/reference/baselinr/validation/
rules.py``), so this module is additive web-text-tier coverage, the
query-time sibling of ``operators/tfidf.py``.

Scale design (10^12 docs, short query):

* Postings are restricted to the query's terms FIRST
  (``tf.filter(term isin q)``) — the only (doc, term) pairs that
  shuffle are hits on query terms, a vanishing fraction of the corpus
  token stream; Catalyst pushes the ``isin`` below the aggregation's
  exchange into the scan-side partial agg.
* Per-term document frequencies over that filtered set are O(|q|)
  rows — joined back with an explicit ``broadcast()``.
* Corpus-level scalars (N, avgdl) ride as a 1-row broadcast crossJoin
  (house rule — see ``operators/linkgraph.py``).
* Document lengths join on the id key only for documents that matched
  at least one query term (the join is driven from the postings side).
* The final top-k is ``orderBy(...).limit(k)`` — Spark plans
  TakeOrderedAndProject (per-partition heap + driver merge of k), never
  a global sort.

Scoring follows Lucene's BM25 convention:
``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive) and
``score(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))``.

Tokenization matches ``operators/tfidf.py`` (lowercased whitespace
split), so document frequencies line up across the weighting suite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.textanalysis import words_expr
from baselinr_spark.operators.tfidf import doc_term_freqs


def doc_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token count under the shared lowercased-whitespace
    tokenizer. Returns (id_col, dl)."""
    return df.select(
        F.col(id_col),
        F.size(words_expr(F.lower(F.col(text_col)))).alias("dl"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25
    (Lucene idf convention), deterministic tie-break (score desc,
    id asc). Duplicate query terms are deduplicated (set-of-terms
    semantics). Returns (id_col, n_hit_terms, score)."""
    terms = sorted({t.lower() for t in query_terms})
    tf = doc_term_freqs(df, id_col, text_col).filter(F.col("term").isin(terms))
    dl = doc_lengths(df, id_col, text_col)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("term"),
            (
                F.log(
                    1
                    + (F.col("n_docs") - F.col("doc_freq") + 0.5)
                    / (F.col("doc_freq") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hit_terms"),
            F.sum("term_score").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def oracle_bm25_topk_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over ``docs_sql`` (a relation
    exposing ``id_col`` and ``text_col``), identical tokenizer,
    idf and saturation formulas, and tie-break."""
    terms = sorted({t.lower() for t in query_terms})
    term_list = ", ".join("'%s'" % t.replace("'", "''") for t in terms)
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT {id_col}, unnest(list_filter(
           string_split_regex(trim(lower(coalesce({text_col}, ''))),
                              '\\s+'),
           x -> length(x) > 0)) AS term
  FROM docs
),
dl AS (
  SELECT {id_col},
         len(list_filter(
             string_split_regex(trim(lower(coalesce({text_col}, ''))),
                                '\\s+'),
             x -> length(x) > 0)) AS dl
  FROM docs
),
stats AS (SELECT (SELECT count(*) FROM docs) AS n_docs,
                 (SELECT avg(dl) FROM dl) AS avgdl),
tf AS (
  SELECT {id_col}, term, count(*) AS tf
  FROM toks WHERE term IN ({term_list})
  GROUP BY {id_col}, term
),
dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
scored AS (
  SELECT tf.{id_col},
         ln(1 + (stats.n_docs - dfreq.doc_freq + 0.5)
                / (dfreq.doc_freq + 0.5))
           * (tf.tf * ({k1} + 1))
           / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
           AS term_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING ({id_col}), stats
)
SELECT {id_col},
       count(*)::bigint AS n_hit_terms,
       sum(term_score) AS score
FROM scored
GROUP BY {id_col}
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
"""
