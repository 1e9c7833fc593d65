"""Corpus-trained n-gram language model + per-document perplexity.

The north-star pipeline scores documents with a KenLM-style n-gram
perplexity (functions/perplexity.py ships the sandbox stand-in model);
this module supplies the TRAINING side — count tables learned from the
corpus itself with add-k smoothing — and a scoring path that consumes
them, so the quality-filter loop (train counts on a trusted cohort →
score candidate cohorts → CCNet-bucket by perplexity,
operators/selection.py:score_buckets) is closed end-to-end in Spark.
The reference repo has no LM surface (its text handling stops at
validation rules); additive training-data-pipeline coverage.

Model (documented spec, replayed exactly by the DuckDB oracle):

* tokens: lowercase ``[a-z]+`` runs (same tokenizer as operators/bpe).
* bigram probability with add-k smoothing:
  ``p(w | prev) = (c(prev, w) + k) / (c(prev) + k·V)`` where ``c(prev)``
  is prev's unigram count (modeling choice: denominator = unigram
  count, not successor-context count — identical in both engines) and
  ``V`` = corpus-wide distinct-token count.
* a document's first token scores against the unigram model:
  ``p(w) = (c(w) + k) / (N + k·V)``, N = total corpus tokens.
* ``ppl(doc) = exp(−(Σ ln p) / T)``, T = doc token count; empty docs
  score NULL.

Scale design (10^12 documents):

* Training is two groupBys (unigrams, bigrams) with map-side combine;
  Zipf-hot grams collapse per map partition before the shuffle.
* Scoring does NOT explode one row per token position: per-doc bigram
  terms are pre-collapsed to ``(doc, gram, multiplicity)`` — the join
  against the count tables carries distinct-grams-per-doc rows (≪ T),
  and the log term is multiplied by the multiplicity. One shuffle on
  the gram key; AQE skew-join splits the hot-gram partitions.
* The three scalars (V, N, k) ride as a broadcast 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]+"


def _words_expr(text_col):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(gram, cnt) unigram count table — one corpus pass."""
    return (
        df.select(F.explode(_words_expr(text_col)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(prev, gram, cnt) bigram count table — adjacent-token pairs per
    doc, generated row-locally then one groupBy."""
    w = df.select(_words_expr(text_col).alias("ws")).filter(F.size("ws") >= 2)
    idx = F.sequence(F.lit(1), F.size("ws") - 1)
    pairs = w.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("prev"),
                    F.element_at(F.col("ws"), i + 1).alias("gram"),
                ),
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.prev").alias("prev"), F.col("p.gram").alias("gram")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def lm_perplexity(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    train: DataFrame | None = None,
    k: float = 0.5,
    _base: DataFrame | None = None,
) -> DataFrame:
    """Per-document add-k bigram perplexity under counts trained on
    ``train`` (defaults to ``docs`` itself — self-trained). Returns
    (id_col, n_tokens, log_prob, perplexity). ``_base`` lets callers
    scoring the same corpus under several models (moore_lewis_scores)
    share one tokenized-and-checkpointed (id, ws) frame instead of
    re-tokenizing the corpus per model."""
    train = train if train is not None else docs
    uni = unigram_counts(train, text_col)
    bi = bigram_counts(train, text_col)
    scalars = F.broadcast(
        uni.agg(
            F.count(F.lit(1)).cast("double").alias("__v"),
            F.sum("cnt").cast("double").alias("__n"),
        )
    )

    base = _base if _base is not None else docs.select(
        F.col(id_col), _words_expr(text_col).alias("ws")
    ).localCheckpoint(eager=False)

    # first-token unigram term: ln((c(w1)+k)/(N+k·V))
    first = (
        base.filter(F.size("ws") >= 1)
        .select(id_col, F.element_at("ws", 1).alias("gram"))
        .join(uni, "gram", "left")
        .crossJoin(scalars)
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(k))
                / (F.col("__n") + F.lit(k) * F.col("__v"))
            ).alias("__term"),
        )
    )

    # bigram terms, pre-collapsed to (doc, prev, gram, multiplicity) so
    # the count-table join carries distinct pairs per doc, not T rows
    idx = F.sequence(F.lit(1), F.size("ws") - 1)
    doc_pairs = (
        base.filter(F.size("ws") >= 2)
        .select(
            id_col,
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i).alias("prev"),
                        F.element_at(F.col("ws"), i + 1).alias("gram"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy(id_col, F.col("p.prev").alias("prev"), F.col("p.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    bigram_terms = (
        doc_pairs.join(bi.withColumnRenamed("cnt", "c_bi"), ["prev", "gram"], "left")
        .join(
            uni.select(F.col("gram").alias("prev"), F.col("cnt").alias("c_prev")),
            "prev",
            "left",
        )
        .crossJoin(scalars)
        .select(
            id_col,
            (
                F.col("m")
                * F.log(
                    (F.coalesce(F.col("c_bi"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.lit(k) * F.col("__v"))
                )
            ).alias("__term"),
        )
    )

    sums = (
        first.unionByName(bigram_terms)
        .groupBy(id_col)
        .agg(F.sum("__term").alias("log_prob"))
    )
    toks = base.select(id_col, F.size("ws").cast("long").alias("n_tokens"))
    return (
        toks.join(sums, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "log_prob",
            F.when(
                F.col("n_tokens") > 0,
                F.exp(-F.col("log_prob") / F.col("n_tokens")),
            ).alias("perplexity"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle — the identical model spec
# ---------------------------------------------------------------------------

def _lm_ctes(table: str = "documents", text_col: str = "text",
             id_col: str = "doc_id", k: float = 0.5,
             train_table: str | None = None, prefix: str = "") -> str:
    """CTE list (no leading WITH) for one add-k bigram LM, every CTE
    name prefixed with ``prefix`` so two models (e.g. Moore-Lewis's
    in-domain vs general) compose in one statement. ``train_table``
    (a table name or parenthesized subquery) supplies the count
    tables; scoring rows always come from ``table`` (default:
    self-trained, the original behavior)."""
    p = prefix
    train_ws = (
        f"SELECT regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws\n"
        f"  FROM {train_table}"
        if train_table is not None
        else f"SELECT ws FROM {p}docw"
    )
    return f"""{p}docw AS (
  SELECT {id_col}, regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws
  FROM {table}
),
{p}trainw AS (
  {train_ws}
),
{p}uni AS (
  SELECT w AS gram, count(*) AS cnt
  FROM (SELECT unnest(ws) AS w FROM {p}trainw) GROUP BY 1
),
{p}bi AS (
  SELECT prev, gram, count(*) AS cnt FROM (
    SELECT ws[i] AS prev, ws[i+1] AS gram
    FROM {p}trainw, UNNEST(range(1, len(ws))) AS t(i)
  ) GROUP BY 1, 2
),
{p}sc AS (
  SELECT count(*)::double AS v, sum(cnt)::double AS n FROM {p}uni
),
{p}first_term AS (
  SELECT d.{id_col},
         ln((coalesce(u.cnt, 0) + {k}) / ({p}sc.n + {k} * {p}sc.v)) AS term
  FROM {p}docw d
  LEFT JOIN {p}uni u ON u.gram = d.ws[1], {p}sc
  WHERE len(d.ws) >= 1
),
{p}doc_pairs AS (
  SELECT {id_col}, prev, gram, count(*) AS m FROM (
    SELECT {id_col}, ws[i] AS prev, ws[i+1] AS gram
    FROM {p}docw, UNNEST(range(1, len(ws))) AS t(i)
  ) GROUP BY 1, 2, 3
),
{p}bigram_terms AS (
  SELECT p.{id_col},
         p.m * ln((coalesce(b.cnt, 0) + {k})
                  / (coalesce(u.cnt, 0) + {k} * {p}sc.v)) AS term
  FROM {p}doc_pairs p
  LEFT JOIN {p}bi b ON b.prev = p.prev AND b.gram = p.gram
  LEFT JOIN {p}uni u ON u.gram = p.prev, {p}sc
),
{p}sums AS (
  SELECT {id_col}, sum(term) AS log_prob
  FROM (SELECT * FROM {p}first_term UNION ALL SELECT * FROM {p}bigram_terms)
  GROUP BY 1
),
{p}ppl AS (
  SELECT d.{id_col}, len(d.ws)::bigint AS n_tokens, s.log_prob,
         CASE WHEN len(d.ws) > 0
              THEN exp(-s.log_prob / len(d.ws)) END AS perplexity
  FROM {p}docw d LEFT JOIN {p}sums s USING ({id_col})
)"""


def oracle_lm_cte(table: str = "documents", text_col: str = "text",
                  id_col: str = "doc_id", k: float = 0.5) -> str:
    """CTE prefix: uni / bi count tables, scalars, per-doc first +
    collapsed bigram terms, summed into ppl (…, n_tokens, log_prob,
    perplexity). Callers append a final SELECT over ``ppl``."""
    return "WITH " + _lm_ctes(table, text_col, id_col, k)


def oracle_lm_perplexity_sql(table: str = "documents", text_col: str = "text",
                             id_col: str = "doc_id", k: float = 0.5) -> str:
    return (
        oracle_lm_cte(table, text_col, id_col, k)
        + f"""
SELECT {id_col}, n_tokens, round(log_prob, 6) AS log_prob,
       round(perplexity, 6) AS perplexity
FROM ppl"""
    )


def oracle_bigram_counts_sql(top_k: int = 20, table: str = "documents",
                             text_col: str = "text") -> str:
    return f"""WITH docw AS (
  SELECT regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws FROM {table}
)
SELECT prev, gram, count(*)::bigint AS cnt FROM (
  SELECT ws[i] AS prev, ws[i+1] AS gram
  FROM docw, UNNEST(range(1, len(ws))) AS t(i)
) GROUP BY 1, 2
ORDER BY cnt DESC, prev, gram LIMIT {top_k}"""


def kneser_ney_bigram(df: DataFrame, text_col: str = "text",
                      discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities (Kneser &
    Ney 1995; Chen & Goodman 1999 — the smoother KenLM defaults to,
    i.e. the model family the north-star perplexity gate names)
    learned from the corpus itself:

        p_KN(w|v) = max(c(v,w) − d, 0) / c(v·)
                  + d · N1+(v·)/c(v·) · N1+(·w)/N1+(··)

    with c(v·) = Σ_w c(v,w), N1+(v·) = |{w : c(v,w)>0}| (distinct
    successors of v), N1+(·w) = |{v : c(v,w)>0}| (distinct contexts w
    completes — the continuation count that distinguishes KN from
    plain absolute discounting), N1+(··) = distinct bigram types.

    Returns (prev, gram, cnt, p_kn) — one row per observed bigram.

    Scale design: everything derives from ONE bigram count table
    (row-local adjacent pairs, map-side-combined groupBy — Zipf-hot
    pairs collapse per map task before the shuffle); the context and
    continuation tables are O(vocab) re-aggregations of it; the
    type total rides as a broadcast 1-row aggregate. No corpus
    re-scan, no vocabulary-wide window.
    """
    bi = bigram_counts(df, text_col)
    ctx = bi.groupBy("prev").agg(
        F.sum("cnt").alias("c_ctx"),
        F.count(F.lit(1)).alias("n1p_succ"),
    )
    cont = bi.groupBy("gram").agg(F.count(F.lit(1)).alias("n1p_prec"))
    tot = F.broadcast(
        bi.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    )
    d = F.lit(discount)
    return (
        bi.join(ctx, "prev")
        .join(cont, "gram")
        .crossJoin(tot)
        .select(
            "prev",
            "gram",
            "cnt",
            (
                F.greatest(F.col("cnt") - d, F.lit(0.0)) / F.col("c_ctx")
                + d * F.col("n1p_succ") / F.col("c_ctx")
                * (F.col("n1p_prec") / F.col("n_types"))
            ).alias("p_kn"),
        )
    )


def oracle_kneser_ney_sql(top_k: int = 50, table: str = "documents",
                          text_col: str = "text",
                          discount: float = 0.75) -> str:
    """DuckDB replay of kneser_ney_bigram (identical operation order, so
    IEEE doubles agree bit-for-bit before rounding)."""
    return f"""WITH docw AS (
  SELECT regexp_extract_all(lower({text_col}), '{TOKEN_RE}') AS ws FROM {table}
),
bi AS (
  SELECT prev, gram, count(*) AS cnt FROM (
    SELECT ws[i] AS prev, ws[i+1] AS gram
    FROM docw, UNNEST(range(1, len(ws))) AS t(i)
    WHERE len(ws) >= 2
  ) GROUP BY 1, 2
),
ctx AS (
  SELECT prev, sum(cnt) AS c_ctx, count(*) AS n1p_succ FROM bi GROUP BY 1
),
cont AS (
  SELECT gram, count(*) AS n1p_prec FROM bi GROUP BY 1
),
tot AS (SELECT count(*)::double AS n_types FROM bi)
SELECT prev, gram, cnt::bigint AS cnt,
       round(greatest(cnt - {discount}, 0.0) / c_ctx
             + {discount} * n1p_succ / c_ctx * (n1p_prec / n_types),
             6) AS p_kn
FROM bi JOIN ctx USING (prev) JOIN cont USING (gram) CROSS JOIN tot
ORDER BY cnt DESC, prev, gram LIMIT {top_k}"""


def moore_lewis_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    in_domain: DataFrame,
    k: float = 0.5,
) -> DataFrame:
    """Moore-Lewis cross-entropy difference data selection (Moore &
    Lewis, ACL 2010 — the classic in-domain selector DSIR generalizes;
    sits next to selection.py:dsir_log_weights as the LM-based
    alternative): score(d) = H_in(d) − H_gen(d), the per-token
    cross-entropy of d under an LM trained on the trusted ``in_domain``
    cohort minus under one trained on the full corpus. Low scores =
    looks like the target domain relative to the background; select by
    ascending score. H(d) = −log_prob/T = ln(perplexity), so the score
    is also ln(ppl_in/ppl_gen).

    Returns (id_col, n_tokens, ce_in, ce_gen, ml_score) for docs with
    ≥1 token (empty docs have no defined cross-entropy).

    Scale design: two lm_perplexity passes (each ONE gram-key shuffle
    against vocabulary-sized count tables — never a corpus×corpus
    join) sharing ONE tokenized-and-checkpointed (id, ws) frame — the
    corpus text is regex-tokenized once, not once per model — plus an
    id-key equi-join of two corpus-sized score tables; the in-domain
    count tables are small (trusted cohorts are curated, not crawled)
    and broadcast-eligible under AQE. The reference repo has no LM
    surface (additive coverage, see module docstring).
    """
    base = docs.select(
        F.col(id_col), _words_expr(text_col).alias("ws")
    ).localCheckpoint(eager=False)
    ce = lambda col: (-F.col("log_prob") / F.col("n_tokens")).alias(col)
    pin = (
        lm_perplexity(docs, id_col, text_col, train=in_domain, k=k,
                      _base=base)
        .filter(F.col("n_tokens") > 0)
        .select(id_col, "n_tokens", ce("ce_in"))
    )
    pgen = (
        lm_perplexity(docs, id_col, text_col, train=docs, k=k,
                      _base=base)
        .filter(F.col("n_tokens") > 0)
        .select(id_col, ce("ce_gen"))
    )
    return pin.join(pgen, id_col).select(
        id_col,
        "n_tokens",
        "ce_in",
        "ce_gen",
        (F.col("ce_in") - F.col("ce_gen")).alias("ml_score"),
    )


def oracle_moore_lewis_sql(
    in_domain_where: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> str:
    """DuckDB twin of :func:`moore_lewis_scores` — two prefixed copies
    of the LM CTE chain (in-domain trained on ``table`` filtered by
    ``in_domain_where``; general self-trained) composed in ONE
    statement, identical operation order per term."""
    in_sub = f"(SELECT * FROM {table} WHERE {in_domain_where})"
    return (
        "WITH "
        + _lm_ctes(table, text_col, id_col, k, train_table=in_sub,
                   prefix="i_")
        + ",\n"
        + _lm_ctes(table, text_col, id_col, k, prefix="g_")
        + f"""
SELECT i.{id_col}, i.n_tokens,
       round(-i.log_prob / i.n_tokens, 6) AS ce_in,
       round(-g.log_prob / g.n_tokens, 6) AS ce_gen,
       round((-i.log_prob / i.n_tokens) - (-g.log_prob / g.n_tokens), 6)
         AS ml_score
FROM i_ppl i JOIN g_ppl g USING ({id_col})
WHERE i.n_tokens > 0"""
    )


def oov_rate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab_train: DataFrame,
    min_count: int = 1,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a vocabulary learned
    from ``vocab_train`` (tokens with count ≥ ``min_count``): the
    classic n-gram-LM-pipeline drop rule — a doc whose token mass is
    mostly unseen under the trusted cohort is noise, another script,
    or lorem-style junk that perplexity alone can overrate.

    Returns (id_col, n_tokens, n_oov, oov_rate) for docs with ≥1
    token.

    Scale design: per-doc tokens pre-collapse to (doc, gram,
    multiplicity) before the vocab join — the shuffle carries distinct
    grams per doc (≪ T); the vocabulary is O(|V|) and broadcast. One
    corpus pass + one groupBy.
    """
    vocab = (
        unigram_counts(vocab_train, text_col)
        .filter(F.col("cnt") >= min_count)
        .select("gram", F.lit(True).alias("__in_v"))
    )
    doc_grams = (
        docs.select(F.col(id_col), F.explode(_words_expr(text_col)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    return (
        doc_grams.join(F.broadcast(vocab), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_v").isNull(), F.col("m")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"))
            .alias("oov_rate"),
        )
    )


def oracle_oov_rate_sql(
    vocab_where: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`oov_rate`."""
    return f"""WITH vocab AS (
  SELECT w AS gram FROM (
    SELECT unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS w
    FROM {table} WHERE {vocab_where}
  ) GROUP BY 1 HAVING count(*) >= {min_count}
),
dg AS (
  SELECT {id_col}, w AS gram, count(*) AS m FROM (
    SELECT {id_col},
           unnest(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS w
    FROM {table}
  ) GROUP BY 1, 2
)
SELECT dg.{id_col}, sum(dg.m)::bigint AS n_tokens,
       sum(CASE WHEN v.gram IS NULL THEN dg.m ELSE 0 END)::bigint AS n_oov,
       round(sum(CASE WHEN v.gram IS NULL THEN dg.m ELSE 0 END)::double
             / sum(dg.m)::double, 6) AS oov_rate
FROM dg LEFT JOIN vocab v USING (gram)
GROUP BY 1"""
