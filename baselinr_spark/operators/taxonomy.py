"""Lexicon-based topic bucketing.

Data recipes mix by TOPIC as well as by language/source (FineWeb's
topic buckets, Dolma's domain tags): each document gets a coarse
category from keyword-lexicon hits, and the mixing planner
(operators/selection.py temperature / token_budget_mix / DoReMi
paths) then reweights those buckets. This is the deterministic,
training-free version — one compiled alternation regex per topic,
counted in a single codegen pass — which is also how production
pipelines bootstrap topic labels before any learned classifier exists
(the learned path is operators/classifier.py on these labels).

Scale design: per-topic hit counts are ``regexp_count`` with ONE
compiled alternation per topic — O(topics) regex passes per document,
all row-local inside WholeStageCodegen; the MAP topic is an
``array_max`` over struct(count, topic); zero shuffle. The per-topic
mixture summary is one groupBy over O(docs) rows with map-side
combine. Lexicons are compile-time literals (bounded), never a join.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.dedup import normalize_text


def _topic_regex(terms: list[str]) -> str:
    # word-boundary alternation; terms are escaped so lexicon entries
    # can contain regex metacharacters safely
    alts = "|".join(re.escape(t.lower()) for t in sorted(terms))
    return rf"\b({alts})\b"


def lexicon_topic_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lexicons: dict[str, list[str]],
    *,
    min_hits: int = 1,
    other_label: str = "other",
) -> DataFrame:
    """Per-document lexicon hit counts and MAP topic.

    Returns (id_col, hits_<topic>..., topic) — topic is the label with
    the most hits (ties broken toward the lexicographically LATER
    label, the struct-max order; deterministic), or ``other_label``
    when the best count is below ``min_hits``.
    """
    t = normalize_text(F.col(text_col))
    hit_cols = {
        name: F.regexp_count(t, F.lit(_topic_regex(terms))).cast("int")
        for name, terms in sorted(lexicons.items())
    }
    out = df.select(
        id_col, *[c.alias(f"hits_{n}") for n, c in hit_cols.items()]
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"hits_{n}").alias("c"), F.lit(n).alias("t")
                )
                for n in hit_cols
            ]
        )
    )
    return out.select(
        "*",
        F.when(best["c"] >= min_hits, best["t"])
        .otherwise(F.lit(other_label))
        .alias("topic"),
    )


def topic_mixture(scored: DataFrame) -> DataFrame:
    """Corpus topic mix from :func:`lexicon_topic_scores` output:
    (topic, n_docs, share) — the input table for a bucket reweighting
    plan."""
    total = scored.agg(F.count(F.lit(1)).alias("__n"))
    return (
        scored.groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "topic",
            "n_docs",
            F.round(F.col("n_docs") / F.col("__n"), 6).alias("share"),
        )
    )


def oracle_topic_scores_sql(
    table: str,
    id_col: str,
    text_col: str,
    lexicons: dict[str, list[str]],
    *,
    min_hits: int = 1,
    other_label: str = "other",
) -> str:
    """DuckDB twin of :func:`lexicon_topic_scores`."""
    names = sorted(lexicons)
    hits = ",\n         ".join(
        f"len(regexp_extract_all(t, '{_topic_regex(lexicons[n])}'))::int"
        f" AS hits_{n}"
        for n in names
    )
    structs = ", ".join(
        "{c: hits_" + n + ", t: '" + n + "'}" for n in names
    )
    return f"""
WITH s AS (
  SELECT {id_col},
         trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')) AS t
  FROM {table}
),
h AS (
  SELECT {id_col},
         {hits}
  FROM s
),
b AS (
  SELECT *, list_max([{structs}]) AS best FROM h
)
SELECT * EXCLUDE (best),
       CASE WHEN best.c >= {min_hits} THEN best.t
            ELSE '{other_label}' END AS topic
FROM b"""


def oracle_topic_mixture_sql(scores_sql: str) -> str:
    """DuckDB twin of :func:`topic_mixture`."""
    return f"""
WITH scored AS ({scores_sql})
SELECT topic, count(*)::bigint AS n_docs,
       round(count(*) / (SELECT count(*)::double FROM scored), 6) AS share
FROM scored GROUP BY 1"""
