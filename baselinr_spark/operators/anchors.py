"""Anchor-text aggregation over a link graph.

The classic web-pipeline operator (used since early search engines,
and by modern crawl-based corpus builders for target-page topical
signals): for every link target, aggregate the anchor texts of its
in-links into (a) in-link counts and (b) the top-k anchor terms by
frequency. Training-data pipelines consume this as a per-page topical
descriptor and as a quality prior (pages accumulating diverse,
descriptive anchors are disproportionately kept). The reference repo
has no graph surface (see ``operators/linkgraph.py``), so this is
additive web-text-tier coverage.

Scale design (10^10 edges):

* ``anchor_summary`` is ONE groupBy(dst) with map-side partial
  aggregation — hub targets with 10^8 in-links collapse per map
  partition before the shuffle.
* ``anchor_top_terms`` explodes anchors to (dst, term) and aggregates
  (dst, term) counts (again map-side combining), then ranks with a
  window partitioned by dst. The window's state is bounded by a
  target's distinct anchor vocabulary, which the preceding aggregation
  has already collapsed — never the raw in-link count. For truly
  adversarial hubs the same pre-cut used in ``dedup.ngram_jaccard``
  (frequency floor before the window) applies; at the gate scale it is
  unnecessary and omitted for exactness.
* No broadcast of anything corpus-sized; term ranking and counting
  co-partition on dst across both stages, so AQE coalesces the
  second exchange away when the first already partitioned by dst.

Tokenization of anchor text matches the suite-wide lowercased
whitespace tokenizer (``textanalysis.words_expr``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from baselinr_spark.operators.textanalysis import words_expr


def anchor_summary(
    edges: DataFrame, dst_col: str = "dst", anchor_col: str = "anchor"
) -> DataFrame:
    """Per-target in-link stats: (dst_col, n_inlinks,
    n_distinct_anchors, n_distinct_sources) — one map-side-combining
    aggregation."""
    cols = [F.count(F.lit(1)).alias("n_inlinks"),
            F.count_distinct(F.col(anchor_col)).alias("n_distinct_anchors")]
    if "src" in edges.columns:
        cols.append(F.count_distinct(F.col("src")).alias("n_distinct_sources"))
    return edges.groupBy(dst_col).agg(*cols)


def anchor_top_terms(
    edges: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` anchor terms per link target by in-link term
    frequency, deterministic tie-break (count desc, term asc).
    Returns (dst_col, rank, term, term_count)."""
    terms = edges.select(
        F.col(dst_col),
        F.explode(words_expr(F.lower(F.col(anchor_col)))).alias("term"),
    )
    counts = terms.groupBy(dst_col, "term").agg(
        F.count(F.lit(1)).alias("term_count")
    )
    w = Window.partitionBy(dst_col).orderBy(
        F.col("term_count").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(dst_col, "rank", "term", "term_count")
    )


def oracle_anchor_summary_sql(
    edges_sql: str, dst_col: str = "dst", anchor_col: str = "anchor",
    with_sources: bool = True,
) -> str:
    """DuckDB twin of :func:`anchor_summary`."""
    src_sel = (
        ",\n       count(DISTINCT src)::bigint AS n_distinct_sources"
        if with_sources
        else ""
    )
    return f"""
WITH edges AS ({edges_sql})
SELECT {dst_col},
       count(*)::bigint AS n_inlinks,
       count(DISTINCT {anchor_col})::bigint AS n_distinct_anchors{src_sel}
FROM edges
GROUP BY {dst_col}
"""


def oracle_anchor_top_terms_sql(
    edges_sql: str,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`anchor_top_terms`: identical tokenizer
    and tie-break."""
    return f"""
WITH edges AS ({edges_sql}),
terms AS (
  SELECT {dst_col},
         unnest(list_filter(
           string_split_regex(trim(lower(coalesce({anchor_col}, ''))), '\\s+'),
           x -> length(x) > 0)) AS term
  FROM edges
),
counts AS (
  SELECT {dst_col}, term, count(*) AS term_count
  FROM terms GROUP BY {dst_col}, term
),
ranked AS (
  SELECT *, row_number() OVER
           (PARTITION BY {dst_col} ORDER BY term_count DESC, term ASC) AS rank
  FROM counts
)
SELECT {dst_col}, rank::int AS rank, term, term_count::bigint AS term_count
FROM ranked WHERE rank <= {k}
"""
