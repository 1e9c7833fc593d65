"""Corpus-level and document-level line/paragraph deduplication.

C4 (Raffel et al. 2020, §2.2) removes any line that occurs more than
once in the corpus, keeping one occurrence; Dolma and RefinedWeb ship
the same operator as "exact line dedup". The reference repo has no
corpus-level text rewriter — its dedup surface stops at row-level
duplicate detection (`/root/reference/baselinr/validation/rules.py`
unique-rule + duplicate samples) — so this module is additive coverage
for the training-data pipeline tier.

Scale design (10^12 docs, ~40 lines/doc → ~4·10^13 line occurrences):

* The corpus-wide first-occurrence winner per line is computed with
  ``groupBy(line_key).agg(min(struct(doc, pos)))`` rather than a
  ``row_number`` window. Both shuffle on the line key, but the groupBy
  gets map-side partial aggregation: boilerplate lines that occur
  billions of times ("Home", cookie banners) collapse to ONE row per
  map partition before the shuffle, so hot keys cannot melt a single
  reducer the way a window partition would.
* The winner set is re-joined to the exploded lines on the same key;
  AQE splits any residual skewed join partitions. The join is
  shuffle-hash-friendly (key is a fixed-width md5); nothing is
  broadcast because winners are O(distinct lines).
* Lines shorter than ``min_line_chars`` (after trim) are exempt from
  dedup — empty lines and separators are structure, not content — and
  never enter the shuffle at all (they are unioned back from a
  filter), which also keeps the hottest trivial keys out of the join.
* Document reassembly is a groupBy on doc id (map-side combine again)
  building ``array_agg(struct(pos, line))`` → ``array_sort`` →
  ``concat_ws`` — no window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_line_chars: int = 10,
) -> DataFrame:
    """Drop every corpus-wide repeat of a line, keeping the first
    occurrence (ordered by (id, line position)); reassemble documents.

    Returns (id_col, text_dedup, n_lines, n_lines_dropped). Lines whose
    trimmed length is < ``min_line_chars`` are kept unconditionally.
    """
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    )
    is_content = F.length(F.trim(F.col("line"))) >= min_line_chars
    content = lines.filter(is_content).withColumn(
        "line_key", F.md5(F.trim(F.col("line")))
    )
    short = lines.filter(~is_content)

    # first occurrence per line: min(struct) orders by (id, pos)
    # lexicographically; partial agg collapses hot keys map-side.
    winners = content.groupBy("line_key").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w")
    )
    kept_content = (
        content.join(winners, "line_key")
        .filter((F.col(f"w.{id_col}") == F.col(id_col)) & (F.col("w.pos") == F.col("pos")))
        .select(id_col, "pos", "line")
    )
    kept = kept_content.unionByName(short.select(id_col, "pos", "line"))

    n_lines_all = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), sep)).alias("n_lines")
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("kl"))
        .select(
            id_col,
            F.concat_ws(sep, F.transform(F.col("kl"), lambda s: s["line"])).alias(
                "text_dedup"
            ),
            F.size(F.col("kl")).alias("n_kept"),
        )
    )
    # right join from the full doc set: a doc whose every line was a
    # corpus repeat still comes back (empty text), never silently lost.
    return (
        rebuilt.join(n_lines_all, id_col, "right")
        .select(
            id_col,
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.col("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )


def paragraph_dedup(
    df: DataFrame, id_col: str, text_col: str, *, sep: str = "\n"
) -> DataFrame:
    """Within-document repetition removal: drop repeated paragraphs
    (exact match), keep first occurrence, preserve order. Entirely
    row-local (``array_distinct`` keeps first-occurrence order in
    Spark) — zero shuffle, the 100×-safe formulation.

    Returns (id_col, text_dedup, n_paras, n_paras_dropped).
    """
    paras = F.split(F.col(text_col), sep)
    uniq = F.array_distinct(paras)
    return df.select(
        F.col(id_col),
        F.concat_ws(sep, uniq).alias("text_dedup"),
        F.size(paras).cast("long").alias("n_paras"),
        (F.size(paras) - F.size(uniq)).cast("long").alias("n_paras_dropped"),
    )
