"""Per-domain boilerplate line removal for web-text corpora.

Web pages from one site share navigation chrome, cookie banners, and
footers; C4/RefinedWeb-style corpus line-dedup (operators/linededup.py)
removes *globally* repeated lines, but per-domain boilerplate is better
modelled the way trafilatura/jusText and production CC pipelines do it:
a line is boilerplate iff it appears in a large FRACTION of the pages
of the SAME domain, regardless of whether it repeats globally. The
reference repo has no text rewriter at all (its dedup surface stops at
row-level duplicate detection, `/root/reference/baselinr/validation/
rules.py`), so this module is additive training-data-pipeline coverage
alongside linededup.py.

Scale design (10^12 docs, ~40 lines/doc, ~10^8 domains):

* Per-(domain, line) document frequency comes from ONE
  ``groupBy(domain, line_key).agg(count_distinct-free count)`` over the
  per-document DISTINCT line set (``dropDuplicates`` on
  (id, domain, line_key) first, so a line repeated inside one page
  counts once) — map-side partial aggregation collapses hot
  boilerplate keys before the shuffle, exactly the linededup.py
  argument.
* Per-domain page counts are a second tiny agg (O(domains) rows)
  joined back on the domain key; domains are far smaller than lines so
  this join is AQE-broadcastable per partition of the line-stats side.
* The boilerplate set (O(domains × chrome lines), tiny relative to
  content lines) joins back to the exploded lines on
  (domain, line_key); non-matching lines survive. Reassembly is a
  groupBy on the doc id building ``array_sort(collect_list(struct(pos,
  line)))`` → ``concat_ws`` — no window function anywhere, no driver
  collect.
* Short lines (< ``min_line_chars`` after trim) are treated as
  structure, not content: exempt from removal and excluded from the
  frequency shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exploded_lines(df: DataFrame, id_col: str, group_col: str,
                    text_col: str, sep: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_frac: float = 0.5,
    min_docs: int = 2,
    min_line_chars: int = 5,
) -> DataFrame:
    """Per-(group, line) boilerplate statistics.

    A trimmed line is boilerplate within its group iff it occurs in
    ``>= min_docs`` distinct documents of the group AND in
    ``>= min_frac`` of the group's documents. Returns one row per
    (group, distinct content line): (group_col, line, doc_freq,
    group_docs, doc_frac, is_boilerplate).
    """
    lines = _exploded_lines(df, id_col, group_col, text_col, sep)
    content = lines.filter(F.length(F.trim("line")) >= min_line_chars)
    # one vote per (doc, line): intra-page repeats count once
    votes = content.select(
        id_col, group_col, F.trim("line").alias("line")
    ).dropDuplicates([id_col, group_col, "line"])
    freq = votes.groupBy(group_col, "line").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    group_docs = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("group_docs")
    )
    frac = F.col("doc_freq") / F.col("group_docs")
    return (
        freq.join(group_docs, group_col)
        .select(
            group_col,
            "line",
            "doc_freq",
            "group_docs",
            frac.alias("doc_frac"),
            (
                (F.col("doc_freq") >= F.lit(min_docs)) & (frac >= F.lit(min_frac))
            ).alias("is_boilerplate"),
        )
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    group_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_frac: float = 0.5,
    min_docs: int = 2,
    min_line_chars: int = 5,
) -> DataFrame:
    """Remove each group's boilerplate lines from every document and
    reassemble. Returns (id_col, group_col, text_clean, n_lines,
    n_dropped). Line membership is decided on the TRIMMED line; the
    surviving document keeps the original (untrimmed) line text and
    original line order.
    """
    stats = boilerplate_lines(
        df, id_col, group_col, text_col,
        sep=sep, min_frac=min_frac, min_docs=min_docs,
        min_line_chars=min_line_chars,
    )
    boiler = stats.filter("is_boilerplate").select(
        group_col, F.col("line").alias("__boiler_line")
    )
    lines = _exploded_lines(df, id_col, group_col, text_col, sep)
    tagged = lines.join(
        boiler,
        on=[
            lines[group_col] == boiler[group_col],
            F.trim(lines["line"]) == boiler["__boiler_line"],
        ],
        how="left",
    ).select(
        lines[id_col],
        lines[group_col],
        "pos",
        "line",
        F.col("__boiler_line").isNotNull().alias("__drop"),
    )
    return (
        tagged.groupBy(id_col, group_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("__drop"), F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("__drop").cast("long")).alias("n_dropped"),
        )
    )
