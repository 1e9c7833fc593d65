"""Flesch readability scoring over a documents table.

Flesch Reading Ease and Flesch-Kincaid grade level — the classic
surface-statistics readability measures, used by web-text pipelines as
cheap quality/audience signals next to the Gopher/C4 heuristics
(``functions/textfeat.py``). The reference repo has no readability
surface, so this is additive web-text-tier coverage.

Syllables use the standard vowel-group heuristic: ``max(1, number of
maximal [aeiouy]+ runs)`` per lowercased token; sentences are maximal
``[.!?]+`` runs with a floor of 1. Everything is native Catalyst
expressions (regexp + higher-order array functions), one projection,
zero shuffles, zero UDFs — embarrassingly parallel at 10^12 docs, and
each formula has an exact DuckDB twin.

* Reading ease: ``206.835 - 1.015 * (words/sentences)
  - 84.6 * (syllables/words)``
* FK grade: ``0.39 * (words/sentences) + 11.8 * (syllables/words)
  - 15.59``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from baselinr_spark.operators.textanalysis import words_expr


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document readability: (id_col, n_words, n_sentences,
    n_syllables, reading_ease, fk_grade). Empty documents emit zero
    counts and 0.0 scores."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = words_expr(F.lower(text))
    n_words = F.size(words)
    n_sentences = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), F.lit(0)))
    )
    syl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
        ).cast("long"),
    )
    wps = n_words.cast("double") / n_sentences
    spw = F.when(n_words > 0, syl.cast("double") / n_words).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sentences.cast("long").alias("n_sentences"),
        syl.alias("n_syllables"),
        F.when(n_words > 0, 206.835 - 1.015 * wps - 84.6 * spw)
        .otherwise(0.0)
        .alias("reading_ease"),
        F.when(n_words > 0, 0.39 * wps + 11.8 * spw - 15.59)
        .otherwise(0.0)
        .alias("fk_grade"),
    )


def oracle_readability_sql(docs_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`readability`: identical tokenizer,
    syllable/sentence heuristics, and formulas."""
    return f"""
WITH docs AS ({docs_sql}),
base AS (
  SELECT {id_col},
         list_filter(
           string_split_regex(trim(lower(coalesce({text_col}, ''))), '\\s+'),
           x -> length(x) > 0) AS ws,
         greatest(1, len(regexp_extract_all(coalesce({text_col}, ''),
                                            '[.!?]+'))) AS n_sentences
  FROM docs
),
counted AS (
  SELECT {id_col},
         len(ws)::bigint AS n_words,
         n_sentences::bigint AS n_sentences,
         coalesce(list_sum(list_transform(ws, w ->
           greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
           0)::bigint AS n_syllables
  FROM base
)
SELECT {id_col}, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         206.835 - 1.015 * (n_words::double / n_sentences)
                 - 84.6 * (n_syllables::double / n_words)
       ELSE 0.0 END AS reading_ease,
       CASE WHEN n_words > 0 THEN
         0.39 * (n_words::double / n_sentences)
         + 11.8 * (n_syllables::double / n_words) - 15.59
       ELSE 0.0 END AS fk_grade
FROM counted
"""
