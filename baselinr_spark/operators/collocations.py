"""Collocation / phrase mining and corpus-dispersion statistics.

Two corpus-linguistics operators a web-scale training-data pipeline
uses when deciding what to tokenize and what to keep:

- :func:`pmi_collocations` — pointwise-mutual-information bigram
  collocations (Church & Hanks 1990) plus the normalized variant
  (Bouma 2009) and the word2phrase joining score (Mikolov et al.
  2013, eq. 6): the standard phrase-mining pass that decides which
  adjacent word pairs ("new york", "machine learning") should become
  single tokens before BPE/vocab training.
- :func:`term_dispersion` — Gries' deviation-of-proportions DP
  (Gries 2008): how evenly a term spreads across corpus parts
  (sources/shards). A high-frequency term with DP near 1 lives in one
  shard only (boilerplate, spam campaign); DP near 0 is a genuine
  corpus-wide term. The curation signal frequency alone cannot give.

Both are pure Catalyst plans over the shared ``ngramlm`` tokenizer
(``[a-z]+`` on lowercased text) so their DuckDB oracles replay the
exact arithmetic.

Scale design (10^12 docs): each operator does ONE corpus-scale
map-side-combined groupBy (bigram counts / (part, word) counts —
Zipf-hot keys collapse per map task before the shuffle). Everything
downstream is O(vocab) or O(top_k x n_parts) re-aggregation; scalar
totals ride as broadcast 1-row crossJoins (house idiom, see
linkgraph.py). min_count filters the bigram table BEFORE the unigram
joins, so the joins carry only the collocation candidates, never the
full bigram tail.

Reference parity note: the reference has no phrase-mining pass; these
extend the profiling surface (reference baselinr/profiling/profiler.py
computes per-column frequency stats) to the token level, as SURVEY.md
§2's "beyond-reference LLM-pipeline operators" block prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngramlm import TOKEN_RE, bigram_counts, unigram_counts


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    delta: float = 5.0,
) -> DataFrame:
    """Bigram collocations scored by PMI / NPMI / word2phrase.

    For a bigram (w1, w2) with count c12 over B total bigrams, and
    unigram counts c1, c2 over T total tokens:

        pmi    = ln( (c12/B) / ((c1/T) * (c2/T)) )
        npmi   = pmi / (-ln(c12/B))          in [-1, 1]
        phrase = (c12 - delta) / c1 / c2 * T   (word2phrase eq. 6)

    Returns one row per bigram with ``c12 >= min_count``:
    (w1, w2, cnt, pmi, npmi, phrase_score).

    The min_count filter runs on the bigram count table BEFORE any
    join, so the unigram joins carry only candidates. Arithmetic
    operation order is fixed and replayed verbatim in
    :func:`oracle_pmi_collocations_sql`.
    """
    bi = bigram_counts(df, text_col).filter(F.col("cnt") >= min_count)
    uni = unigram_counts(df, text_col)
    totals = F.broadcast(
        unigram_counts(df, text_col)
        .agg(F.sum("cnt").cast("double").alias("t_tokens"))
        .crossJoin(
            bigram_counts(df, text_col).agg(
                F.sum("cnt").cast("double").alias("b_bigrams")
            )
        )
    )
    c1 = uni.select(F.col("gram").alias("w1"), F.col("cnt").alias("c1"))
    c2 = uni.select(F.col("gram").alias("w2"), F.col("cnt").alias("c2"))
    j = (
        bi.select(
            F.col("prev").alias("w1"), F.col("gram").alias("w2"), "cnt"
        )
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(totals)
    )
    p12 = F.col("cnt") / F.col("b_bigrams")
    pmi = F.log(p12 / ((F.col("c1") / F.col("t_tokens")) * (F.col("c2") / F.col("t_tokens"))))
    return j.select(
        "w1",
        "w2",
        F.col("cnt").cast("bigint").alias("cnt"),
        pmi.alias("pmi"),
        (pmi / -F.log(p12)).alias("npmi"),
        ((F.col("cnt") - F.lit(delta)) / F.col("c1") / F.col("c2") * F.col("t_tokens")).alias(
            "phrase_score"
        ),
    )


def oracle_pmi_collocations_sql(
    table: str = "documents",
    text_col: str = "text",
    *,
    min_count: int = 5,
    delta: float = 5.0,
) -> str:
    """DuckDB twin of :func:`pmi_collocations` (same op order)."""
    return f"""WITH docw AS (
  SELECT regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws FROM {table}
),
uni AS (
  SELECT w, count(*) AS cnt FROM (SELECT unnest(ws) AS w FROM docw) GROUP BY 1
),
bi AS (
  SELECT w1, w2, count(*) AS cnt FROM (
    SELECT ws[i] AS w1, ws[i+1] AS w2
    FROM docw, UNNEST(range(1, len(ws))) AS t(i)
    WHERE len(ws) >= 2
  ) GROUP BY 1, 2
),
tot AS (
  SELECT (SELECT sum(cnt)::double FROM uni) AS t_tokens,
         (SELECT sum(cnt)::double FROM bi) AS b_bigrams
)
SELECT b.w1, b.w2, b.cnt::bigint AS cnt,
       ln((b.cnt / b_bigrams) / ((u1.cnt / t_tokens) * (u2.cnt / t_tokens))) AS pmi,
       ln((b.cnt / b_bigrams) / ((u1.cnt / t_tokens) * (u2.cnt / t_tokens)))
         / -ln(b.cnt / b_bigrams) AS npmi,
       (b.cnt - {delta}) / u1.cnt / u2.cnt * t_tokens AS phrase_score
FROM bi b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN tot
WHERE b.cnt >= {min_count}"""


def term_dispersion(
    df: DataFrame,
    part_col: str,
    text_col: str = "text",
    *,
    top_k: int = 50,
) -> DataFrame:
    """Gries' deviation-of-proportions dispersion for the top_k most
    frequent terms across the values of ``part_col``:

        DP(w) = 0.5 * sum_i | f_iw/f_w - n_i/N |

    where f_iw is w's count in part i, f_w its corpus count, n_i the
    part's token count and N the corpus token count. DP = 0 means w
    spreads exactly like the corpus; DP -> 1 means it is confined to
    a vanishing share of the corpus.

    Returns (word, total, dp) — top_k rows ordered by (total desc,
    word) with a deterministic tie-break.

    Scale design: ONE (part, word) groupBy over the corpus; part
    sizes and word totals are re-aggregations of that table; the
    DP sum runs on a top_k x n_parts grid built from two broadcast
    tiny tables, left-joined with observed counts so absent
    (word, part) cells contribute |0 - n_i/N|.
    """
    w = df.select(
        F.col(part_col).alias("part"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("word"),
    )
    pw = w.groupBy("part", "word").agg(F.count(F.lit(1)).alias("f_iw"))
    parts = pw.groupBy("part").agg(F.sum("f_iw").alias("n_i"))
    words = pw.groupBy("word").agg(F.sum("f_iw").alias("f_w"))
    topk = words.orderBy(F.col("f_w").desc(), F.col("word")).limit(top_k)
    n_total = F.broadcast(parts.agg(F.sum("n_i").cast("double").alias("n_corpus")))
    grid = F.broadcast(topk).crossJoin(F.broadcast(parts)).crossJoin(n_total)
    cells = grid.join(pw, ["part", "word"], "left").select(
        "word",
        F.col("f_w").cast("bigint").alias("total"),
        F.abs(
            F.coalesce(F.col("f_iw"), F.lit(0)).cast("double") / F.col("f_w")
            - F.col("n_i") / F.col("n_corpus")
        ).alias("gap"),
    )
    return cells.groupBy("word", "total").agg(
        (F.sum("gap") * F.lit(0.5)).alias("dp")
    )


def oracle_term_dispersion_sql(
    table: str = "documents",
    part_col: str = "source",
    text_col: str = "text",
    *,
    top_k: int = 50,
) -> str:
    """DuckDB twin of :func:`term_dispersion`."""
    return f"""WITH w AS (
  SELECT {part_col} AS part, unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS word
  FROM {table}
),
pw AS (SELECT part, word, count(*) AS f_iw FROM w GROUP BY 1, 2),
parts AS (SELECT part, sum(f_iw) AS n_i FROM pw GROUP BY 1),
words AS (SELECT word, sum(f_iw) AS f_w FROM pw GROUP BY 1),
topk AS (SELECT word, f_w FROM words ORDER BY f_w DESC, word LIMIT {top_k}),
tot AS (SELECT sum(n_i)::double AS n_corpus FROM parts),
cells AS (
  SELECT t.word, t.f_w::bigint AS total,
         abs(coalesce(pw.f_iw, 0)::double / t.f_w - p.n_i / n_corpus) AS gap
  FROM topk t CROSS JOIN parts p CROSS JOIN tot
  LEFT JOIN pw ON pw.word = t.word AND pw.part = p.part
)
SELECT word, total, sum(gap) * 0.5 AS dp FROM cells GROUP BY 1, 2"""


def domain_unigram_kl(
    df: DataFrame,
    part_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-part (source/domain) KL divergence of the part's unigram
    distribution from the corpus distribution:

        KL(p_d || p_c) = sum_w (c_dw/n_d) * ln( (c_dw/n_d) / (c_w/N) )

    — the domain-representativeness number behind CCNet/DoReMi-style
    mixture decisions: a domain with near-zero KL is redundant with the
    corpus average; a high-KL domain carries distinct vocabulary (or
    spam). Always finite: the sum runs over the part's OWN observed
    words, and every part word is a corpus word (p_c > 0 wherever
    p_d > 0); absent words contribute 0 by the 0*ln(0) = 0 convention.

    Returns (part, n_tokens, n_types, kl).

    Scale design: ONE (part, word) groupBy over the corpus (map-side
    combined); corpus word counts re-aggregate that table; the corpus
    total rides as a broadcast 1-row crossJoin. The join keyed on word
    carries O(|parts| x vocab-overlap) rows, never the corpus.
    """
    w = df.select(
        F.col(part_col).alias("part"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("word"),
    )
    pw = w.groupBy("part", "word").agg(F.count(F.lit(1)).alias("c_dw"))
    nd = pw.groupBy("part").agg(F.sum("c_dw").alias("n_d"))
    cw = pw.groupBy("word").agg(F.sum("c_dw").alias("c_w"))
    n_tot = F.broadcast(cw.agg(F.sum("c_w").cast("double").alias("n_corpus")))
    terms = (
        pw.join(cw, "word")
        .join(nd, "part")
        .crossJoin(n_tot)
        .select(
            "part",
            "n_d",
            (
                (F.col("c_dw") / F.col("n_d"))
                * F.log(
                    (F.col("c_dw") / F.col("n_d"))
                    / (F.col("c_w") / F.col("n_corpus"))
                )
            ).alias("term"),
        )
    )
    return terms.groupBy("part").agg(
        F.first("n_d").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("term").alias("kl"),
    )


def oracle_domain_unigram_kl_sql(
    table: str = "documents",
    part_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`domain_unigram_kl`."""
    return f"""WITH w AS (
  SELECT {part_col} AS part,
         unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS word
  FROM {table}
),
pw AS (SELECT part, word, count(*) AS c_dw FROM w GROUP BY 1, 2),
nd AS (SELECT part, sum(c_dw) AS n_d FROM pw GROUP BY 1),
cw AS (SELECT word, sum(c_dw) AS c_w FROM pw GROUP BY 1),
tot AS (SELECT sum(c_w)::double AS n_corpus FROM cw)
SELECT pw.part, any_value(n_d)::bigint AS n_tokens,
       count(*)::bigint AS n_types,
       sum((c_dw / n_d) * ln((c_dw / n_d) / (c_w / n_corpus))) AS kl
FROM pw JOIN cw USING (word) JOIN nd USING (part) CROSS JOIN tot
GROUP BY 1"""


def cooccurrence_edges(
    df: DataFrame, text_col: str = "text", *, window: int = 2
) -> DataFrame:
    """Word co-occurrence edge list for TextRank (Mihalcea & Tarau
    2004): an undirected edge between every pair of tokens at distance
    <= window, emitted in BOTH directions so the shared directed
    pagerank() operator (which dedups and drops self-loops via
    normalize_edges) sees a symmetric graph. Row-local fan-out —
    each doc emits <= 2*window*len edges map-side."""
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    w = df.select(ws.alias("ws"))

    def _pair_at(gap):
        # one-arg lambda: F.transform must NOT see a second (index) param
        return lambda i: F.struct(
            F.element_at(F.col("ws"), i).alias("src"),
            F.element_at(F.col("ws"), i + F.lit(gap)).alias("dst"),
        )

    parts = []
    for j in range(1, window + 1):
        pj = (
            w.filter(F.size("ws") >= j + 1)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - j), _pair_at(j)
                    )
                ).alias("p")
            )
            .select("p.src", "p.dst")
        )
        parts.append(pj)
    fwd = parts[0]
    for p in parts[1:]:
        fwd = fwd.unionByName(p)
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def cooccurrence_edges_sql(
    table: str = "documents", text_col: str = "text", *, window: int = 2
) -> str:
    """DuckDB edges CTE body matching :func:`cooccurrence_edges` —
    feed to linkgraph.oracle_pagerank_cte."""
    fwd = f"""
  SELECT ws[i] AS src, ws[i+j] AS dst
  FROM (SELECT regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws
        FROM {table}) d,
       UNNEST(range(1, len(ws))) AS t(i),
       UNNEST(range(1, {window + 1})) AS u(j)
  WHERE i + j <= len(ws)"""
    return f"{fwd}\nUNION ALL\nSELECT dst AS src, src AS dst FROM ({fwd})"
