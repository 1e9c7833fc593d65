"""RAKE keyword extraction over a documents table.

Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
phrases are maximal runs of content words between stopword/punctuation
delimiters; each word scores ``deg(w) / freq(w)`` where, within one
document, ``freq(w)`` is the word's occurrence count across candidate
phrases and ``deg(w)`` is the sum of the lengths of the phrases it
occurs in (self included); a phrase scores the sum of its member-word
scores (repeated words counted per occurrence). Training-data
pipelines use this for cheap topical tagging and domain routing. The
reference repo has no keyword surface, so this is additive
web-text-tier coverage next to ``operators/tfidf.py``.

Everything is native Catalyst — posexplode + windows + aggregates, no
UDFs — and every window partitions by document id, so window state is
bounded by one page's token count, never corpus-scale. The shuffles
are all keyed by (doc, …): per-document work stays co-partitioned and
the whole extraction is embarrassingly parallel at 10^12 docs.

Delimiters: tokens are the lowercased text with every non-alphanumeric
(ASCII) character turned into a phrase-break marker, then whitespace
split; a token breaks a phrase when it is the marker or a stopword
(``textanalysis.EN_STOPWORDS``, the suite-wide list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from baselinr_spark.operators.textanalysis import EN_STOPWORDS

#: phrase-break marker injected for punctuation runs
_BREAK = "|"


def _phrase_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token, is_break): lowercased tokens in order with
    punctuation runs collapsed to the break marker."""
    cleaned = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        "[^a-z0-9\\s]+",
        " %s " % _BREAK,
    )
    toks = F.filter(
        F.split(F.trim(cleaned), "\\s+"), lambda t: F.length(t) > 0
    )
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    out = df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "token")
    )
    return out.withColumn(
        "is_break",
        (F.col("token") == _BREAK)
        | F.array_contains(stop_arr, F.col("token")),
    )


def candidate_phrases(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Candidate phrases per document: (id_col, phrase_id, phrase,
    phrase_len) where ``phrase`` is the space-joined content-word run
    and ``phrase_id`` numbers runs in text order from 0."""
    toks = _phrase_tokens(df, id_col, text_col)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = toks.withColumn("seg", F.sum(F.col("is_break").cast("int")).over(w))
    words = seg.filter(~F.col("is_break"))
    phrases = words.groupBy(id_col, "seg").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("phrase_len"),
        F.min("pos").alias("first_pos"),
    )
    order_w = Window.partitionBy(id_col).orderBy("first_pos")
    return phrases.select(
        F.col(id_col),
        (F.row_number().over(order_w) - 1).alias("phrase_id"),
        "phrase",
        "phrase_len",
        "first_pos",
    )


def rake_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` RAKE phrases per document by score, tie-break (score
    desc, phrase asc). Returns (id_col, rank, phrase, phrase_len,
    score). Duplicate phrase strings within a document are emitted
    once: identical occurrences have mathematically identical scores,
    so the group sum over ALL occurrences divided by the occurrence
    count recovers the per-occurrence score exactly — grouping by the
    phrase STRING (not a float-valued distinct) keeps the collapse
    immune to float summation-order noise across engines."""
    phrases = candidate_phrases(df, id_col, text_col)
    occ = phrases.select(
        F.col(id_col),
        "phrase_id",
        "phrase",
        "phrase_len",
        F.posexplode(F.split(F.col("phrase"), " ")).alias("wpos", "word"),
    )
    wstats = occ.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("deg"),
    )
    scored = (
        occ.join(wstats, [id_col, "word"])
        .groupBy(id_col, "phrase", "phrase_len")
        .agg(
            (
                F.sum(F.col("deg") / F.col("freq"))
                / F.count_distinct("phrase_id")
            ).alias("score")
        )
    )
    rank_w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "phrase", "phrase_len", "score")
    )


def oracle_rake_sql(docs_sql: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB twin of :func:`rake_keywords`: same tokenizer, delimiter
    set, scoring and tie-break."""
    stop_list = ", ".join("'%s'" % w for w in EN_STOPWORDS)
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT {id_col},
         generate_subscripts(t, 1) - 1 AS pos,
         unnest(t) AS token
  FROM (
    SELECT {id_col},
           list_filter(
             string_split_regex(trim(regexp_replace(
               lower(coalesce({text_col}, '')),
               '[^a-z0-9\\s]+', ' | ', 'g')), '\\s+'),
             x -> length(x) > 0) AS t
    FROM docs
  )
),
flagged AS (
  SELECT *, (token = '|' OR token IN ({stop_list})) AS is_break
  FROM toks
),
seg AS (
  SELECT *, sum(is_break::int) OVER
           (PARTITION BY {id_col} ORDER BY pos) AS seg
  FROM flagged
),
phrases AS (
  SELECT {id_col}, seg,
         string_agg(token, ' ' ORDER BY pos) AS phrase,
         count(*) AS phrase_len,
         min(pos) AS first_pos
  FROM seg WHERE NOT is_break
  GROUP BY {id_col}, seg
),
numbered AS (
  SELECT {id_col},
         row_number() OVER (PARTITION BY {id_col} ORDER BY first_pos) - 1
           AS phrase_id,
         phrase, phrase_len
  FROM phrases
),
occ AS (
  SELECT {id_col}, phrase_id, phrase, phrase_len,
         unnest(string_split(phrase, ' ')) AS word
  FROM numbered
),
wstats AS (
  SELECT {id_col}, word, count(*) AS freq, sum(phrase_len) AS deg
  FROM occ GROUP BY {id_col}, word
),
scored AS (
  SELECT {id_col}, phrase, phrase_len,
         sum(deg::double / freq) / count(DISTINCT phrase_id) AS score
  FROM occ JOIN wstats USING ({id_col}, word)
  GROUP BY {id_col}, phrase, phrase_len
),
ranked AS (
  SELECT *, row_number() OVER
           (PARTITION BY {id_col} ORDER BY score DESC, phrase ASC) AS rank
  FROM scored
)
SELECT {id_col}, rank::int AS rank, phrase,
       phrase_len::bigint AS phrase_len, score
FROM ranked WHERE rank <= {k}
"""
