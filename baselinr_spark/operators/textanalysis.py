"""Generic text analysis over a documents table — language-ID heuristic,
quality scoring, token counting, fingerprinting. All native Catalyst
expressions (no UDFs), designed so each has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny English function-word list for the heuristic language scorer
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def words_expr(text_col):
    return F.filter(F.split(F.trim(text_col), r"\s+"), lambda w: F.length(w) > 0)


def doc_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: n_words, n_chars, mean_word_length,
    distinct_word_ratio (type/token), stopword_fraction (EN list).

    Word counts/lengths and stopword hits are codegen'd regexps over the
    raw text (count of \\S+ runs, non-whitespace char count, anchored
    whole-token alternation) rather than the split → higher-order
    filter/aggregate chain, whose CodegenFallback interpretation
    dominated this operator's runtime. Only the distinct-word ratio
    still materializes the split array (codegen'd array_distinct; the
    possibly-empty leading/trailing split segment is subtracted via
    array_contains instead of a filter pass). Values are unchanged —
    the DuckDB oracles replay identically."""
    text = F.col(text_col)
    n_words = F.regexp_count(text, F.lit(r"\S+"))
    stop_pat = (
        r"(?i)(?:^|(?<=\s))(?:" + "|".join(sorted(EN_STOPWORDS)) + r")(?=\s|$)"
    )
    n_stop = F.regexp_count(text, F.lit(stop_pat))
    total_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    sp = F.split(F.trim(text), r"\s+")
    n_distinct = (
        F.size(F.array_distinct(sp))
        - F.array_contains(sp, "").cast("int")
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.length(text).alias("n_chars"),
        F.when(n_words > 0, total_chars / n_words).otherwise(0.0).alias("mean_word_length"),
        F.when(n_words > 0, n_distinct / n_words)
        .otherwise(0.0)
        .alias("distinct_word_ratio"),
        F.when(n_words > 0, n_stop / n_words).otherwise(0.0).alias("stopword_fraction"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite 0-100 heuristic quality score: length band (20-1000
    words), mean word length band [3,10], lexical diversity ≥ 0.2,
    stopword presence. 25 points each — a C4-style scorer whose
    components mirror the keep/drop rules."""
    s = doc_stats(df, id_col, text_col)
    return s.select(
        id_col,
        (
            F.when((F.col("n_words") >= 20) & (F.col("n_words") <= 1000), 25.0).otherwise(0.0)
            + F.when(
                (F.col("mean_word_length") >= 3.0) & (F.col("mean_word_length") <= 10.0), 25.0
            ).otherwise(0.0)
            + F.when(F.col("distinct_word_ratio") >= 0.2, 25.0).otherwise(0.0)
            + F.when(F.col("stopword_fraction") > 0, 25.0).otherwise(0.0)
        ).alias("quality_score"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword proxy: runs of letters, runs
    of digits, or single other non-space chars (the classic pre-tokenizer
    regex), counted via regexp_count — no UDF, no explode."""
    ws = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    bpe = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


def lang_id_heuristic(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language heuristic: fraction of tokens in the EN
    function-word list; ≥ 2% → 'en', else 'unknown'. (The real model
    path is functions/langid.py; this is the no-model fallback.)"""
    s = doc_stats(df, id_col, text_col)
    return s.select(
        id_col,
        F.round(F.col("stopword_fraction"), 6).alias("stopword_fraction"),
        F.when(F.col("stopword_fraction") >= 0.02, "en").otherwise("unknown").alias("lang_guess"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic rolling polynomial hash of the normalized text:
    fold ascii codes with acc = (acc*31 + code) mod 1e9+7. Expressed as
    an `aggregate` HOF over the char array — engine-portable (same
    formula runs in DuckDB via list_reduce)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    chars = F.split(norm, "")
    fp = F.aggregate(
        F.transform(F.filter(chars, lambda c: F.length(c) > 0), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + c) % FINGERPRINT_MOD,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution, in
    bits — the classic gibberish/compressibility signal (Dolma-style
    tagger): base64 blobs and key-mashing run high, repeated-char spam
    runs near zero, natural language sits ~4-4.5 bits. Entirely
    row-local HOFs (per-doc distinct-char set is alphabet-bounded, so
    the inner count scan is O(distinct × len) with tiny constants) —
    zero shuffle, one codegen stage at any corpus size.

    Returns (id_col, n_chars, n_distinct_chars, entropy_bits); empty
    and NULL texts score 0.
    """
    chars = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), ""),
        lambda c: F.length(c) > 0,
    )
    n = F.size(chars)
    uniq = F.array_distinct(chars)
    # fold over the distinct alphabet: -sum p*log2(p); left-to-right
    # sequential, so the DuckDB twin replays it exactly
    ent = F.aggregate(
        uniq,
        F.lit(0.0),
        lambda acc, c: acc
        - (F.size(F.filter(chars, lambda x: x == c)) / n)
        * F.log2(F.size(F.filter(chars, lambda x: x == c)) / n),
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.size(uniq).cast("long").alias("n_distinct_chars"),
        F.when(n > 0, ent).otherwise(F.lit(0.0)).alias("entropy_bits"),
    )


def vocabulary(df: DataFrame, text_col: str, k: int | None = 20) -> DataFrame:
    """Corpus vocabulary: explode lowercased whitespace tokens →
    count per word (partial agg map-side, one shuffle) → optional top-k
    with deterministic (count desc, word asc) ordering. The classic
    corpus-statistics op for tokenizer/vocab construction at scale."""
    words = F.explode(words_expr(F.lower(F.col(text_col)))).alias("word")
    counts = df.select(words).groupBy("word").agg(
        F.count(F.lit(1)).alias("n")
    )
    if k is None:
        return counts
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(k)


def token_fertility(
    df: DataFrame, lang_col: str, text_col: str
) -> DataFrame:
    """Per-language tokenizer-fertility stats — the numbers a token-
    budget planner needs before allocating a multilingual mixture:
    fertility = pre-tokens per whitespace word (BPE-ish pre-tokenizer
    proxy: letter runs / digit runs / single other non-space chars —
    the same TOKEN_RE as packing.py) and chars_per_token. High-fertility
    languages consume more of a fixed token budget per word; budgeting
    by raw document count over-weights them.

    One map-side-combining groupBy over row-local regexp counts —
    O(#languages) output, no second pass."""
    words = words_expr(F.col(text_col))
    n_tok = F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    )
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            F.size(words).cast("long").alias("__w"),
            n_tok.cast("long").alias("__t"),
            F.length(F.col(text_col)).cast("long").alias("__c"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__w").alias("n_words"),
            F.sum("__t").alias("n_tokens"),
            F.sum("__c").alias("n_chars"),
            (F.sum("__t") / F.sum("__w")).alias("fertility"),
            (F.sum("__c") / F.sum("__t")).alias("chars_per_token"),
        )
    )


#: Unicode script ranges (BMP-only, so Java UTF-16 regex and DuckDB RE2
#: count identical characters). Order fixes dominant-script tie-breaks.
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "A-Za-zÀ-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("arabic", "؀-ۿ"),
    ("devanagari", "ऀ-ॿ"),
    ("cjk", "一-鿿぀-ヿ"),
    ("hangul", "가-힯"),
)


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Unicode-script composition — the pre-langid routing
    signal every multilingual web pipeline computes first (CCNet splits
    Common Crawl by script before language ID; a Cyrillic page should
    never reach the Latin-script language models). Counts characters in
    six major script ranges, the dominant script (ties broken by
    SCRIPT_RANGES order), and script_purity = dominant/total (NULL when
    no script character occurs).

    Pure `regexp_replace`+`length` projections — row-local, zero
    shuffle, whole-stage codegen; each range is BMP-only so Java
    (UTF-16 code units) and RE2 (code points) count identically."""
    t = F.col(text_col)
    counts = {
        name: F.length(F.regexp_replace(t, f"[^{rng}]", "")).cast("long")
        for name, rng in SCRIPT_RANGES
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    mx = F.greatest(*counts.values())
    dom = F.lit(None).cast("string")
    for name, _ in reversed(SCRIPT_RANGES):
        dom = F.when(counts[name] == mx, name).otherwise(dom)
    return df.select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name, _ in SCRIPT_RANGES],
        total.alias("n_script_chars"),
        F.when(total > 0, dom).alias("dominant_script"),
        F.when(total > 0, mx.cast("double") / total).alias("script_purity"),
    )


def discover_stopwords(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 10,
    min_df_ratio: float = 0.25,
) -> DataFrame:
    """Data-driven stopword discovery: per language, the ``top_k`` terms
    by DOCUMENT frequency (share of that language's docs containing the
    term), filtered to df_ratio >= ``min_df_ratio``. Document frequency
    — not raw term count — is the signal: a term that appears in most
    documents carries no topical information, which is the actual
    definition the Gopher stop-word rule needs. The hand-curated
    EN_STOPWORDS list above bootstraps English; THIS generalizes the
    rule to every language in the corpus without curation (the
    reference's learned-expectation philosophy — learn the baseline
    from the data — applied to lexicons; cf.
    /root/reference/baselinr/learning/expectation_learner.py).

    Scale shape (10^12 docs): explode is per-doc DISTINCT lowercased
    terms (array_distinct BEFORE the explode, so the shuffle carries
    each (doc, term) once, not per occurrence); the groupBy(lang, term)
    agg combines map-side; per-lang doc totals are a tiny agg broadcast
    back; the rank window runs over the (lang, term) aggregate — vocab-
    scale, never corpus-scale. Ties break (df desc, term asc). Returns
    (lang, term, doc_freq, df_ratio, rank)."""
    from pyspark.sql import Window as W

    terms = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.array_distinct(
                F.transform(words_expr(F.col(text_col)), F.lower)
            )
        ).alias("term"),
    )
    doc_freq = terms.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    totals = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = doc_freq.join(F.broadcast(totals), "lang").select(
        "lang",
        "term",
        "doc_freq",
        (F.col("doc_freq").cast("double") / F.col("n_docs")).alias("df_ratio"),
    )
    w = W.partitionBy("lang").orderBy(
        F.col("doc_freq").desc(), F.col("term").asc()
    )
    return (
        scored.filter(F.col("df_ratio") >= min_df_ratio)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def oracle_discover_stopwords_sql(
    table: str = "documents",
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 10,
    min_df_ratio: float = 0.25,
) -> str:
    """DuckDB replay: same distinct-terms explode, same tie-break."""
    return f"""
WITH terms AS (
  SELECT {lang_col} AS lang,
         unnest(list_distinct(list_transform(
           list_filter(string_split_regex(trim({text_col}), '\\s+'),
                       w -> len(w) > 0),
           w -> lower(w)))) AS term
  FROM {table}
),
doc_freq AS (
  SELECT lang, term, count(*)::bigint AS doc_freq
  FROM terms GROUP BY 1, 2
),
totals AS (
  SELECT {lang_col} AS lang, count(*) AS n_docs FROM {table} GROUP BY 1
),
scored AS (
  SELECT d.lang, d.term, d.doc_freq,
         d.doc_freq::double / t.n_docs AS df_ratio
  FROM doc_freq d JOIN totals t USING (lang)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY doc_freq DESC, term ASC
  ) AS rank
  FROM scored WHERE df_ratio >= {min_df_ratio}
)
SELECT lang, term, doc_freq, df_ratio, rank::int AS rank
FROM ranked WHERE rank <= {top_k}
"""
