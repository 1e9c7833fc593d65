"""Corpus-level token-frequency diagnostics — Zipf-law fit, Heaps-law
fit, and the frequency-of-frequencies spectrum. These are the standard
"is this crawl shaped like natural language?" health checks a web-text
pipeline runs next to quality filtering: a Zipf slope far from -1 or a
hapax ratio far from ~0.4-0.6 flags boilerplate floods, spam bursts, or
encoding damage that per-document rules miss.

Additive vs the reference (its profiling stops at per-column stats,
profiling/profiler.py); no reference file computes corpus-level token
laws. All operators are pure Catalyst expressions with exact DuckDB
oracles.

Scale notes (10^12 docs): everything funnels through ONE
explode+groupBy over tokens (the same shuffle shape as tf-idf /
vocabulary); the fitted regressions run over the aggregated term table
(O(vocab) rows) or per-document stat rows, never over raw tokens twice.
The least-squares fits are single aggregates — no window over the
corpus, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textanalysis import words_expr


def term_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(token, cnt) — lowercased whitespace tokens, one explode +
    map-side-combining groupBy."""
    return (
        df.select(F.explode(words_expr(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def zipf_fit(df: DataFrame, text_col: str, top_k: int = 1000) -> DataFrame:
    """Least-squares fit of log(freq) = intercept + slope·log(rank) over
    the ``top_k`` most frequent tokens (rank ties broken token-asc so
    the fit is deterministic). Natural-language corpora give slope ≈ -1
    (Zipf); returns ONE row (slope, intercept, r2, n_terms).

    Scale: the rank window runs over the top_k rows surviving a
    TakeOrderedAndProject-style limit of the aggregated term table —
    O(top_k), not O(vocab); the fit itself is one aggregate.
    """
    tc = term_counts(df, text_col)
    top = tc.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    from pyspark.sql import Window as W

    # rank AFTER the limit: the window sees top_k rows, not the vocab
    r = top.select(
        F.log(F.col("cnt").cast("double")).alias("y"),
        F.log(
            F.row_number()
            .over(W.orderBy(F.desc("cnt"), F.asc("token")))
            .cast("double")
        ).alias("x"),
    )
    agg = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # degenerate guards (ANSI-safe): <2 distinct x → slope NULL,
    # intercept = mean(y) (the constant fit); empty input → all NULL
    slope = F.when(varx > 0, cov / varx)
    return agg.select(
        slope.alias("slope"),
        F.when(n > 0, (sy - F.coalesce(slope, F.lit(0.0)) * sx) / n).alias(
            "intercept"
        ),
        F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary))
        .when(n > 0, 1.0)
        .alias("r2"),
        n.cast("bigint").alias("n_terms"),
    )


def heaps_fit(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heaps'-law fit V = K·N^beta over per-DOCUMENT (tokens N, distinct
    types V) points: least squares of log V on log N across documents
    with ≥ 2 tokens and ≥ 2 types (log-log regression needs positive
    nonconstant points). English text gives beta ≈ 0.4-0.6; beta → 1
    means no vocabulary reuse (random strings / IDs), beta → 0 means
    extreme repetition. Returns ONE row (k, beta, r2, n_docs).

    The per-document variant (vs. cumulative-corpus Heaps) is the
    embarrassingly parallel form: one shuffle-free projection then one
    aggregate — no token-order dependence, so it is reproducible under
    any partitioning.
    """
    words = words_expr(F.lower(F.col(text_col)))
    pts = df.select(
        F.size(words).cast("double").alias("nn"),
        F.size(F.array_distinct(words)).cast("double").alias("vv"),
    ).filter((F.col("nn") >= 2) & (F.col("vv") >= 2))
    r = pts.select(F.log("nn").alias("x"), F.log("vv").alias("y"))
    agg = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    # same degenerate guards as zipf_fit: one point → beta NULL,
    # k = exp(mean log V) (the constant fit), r2 fallback 1.0
    beta = F.when(varx > 0, cov / varx)
    return agg.select(
        F.when(
            n > 0, F.exp((sy - F.coalesce(beta, F.lit(0.0)) * sx) / n)
        ).alias("k"),
        beta.alias("beta"),
        F.when((varx > 0) & (vary > 0), cov * cov / (varx * vary))
        .when(n > 0, 1.0)
        .alias("r2"),
        n.cast("bigint").alias("n_docs"),
    )


def freq_spectrum(df: DataFrame, text_col: str, max_freq: int = 10) -> DataFrame:
    """Frequency-of-frequencies: for f = 1..max_freq, how many distinct
    tokens occur exactly f times (plus one '>max' bucket), with each
    bucket's share of the vocabulary. freq=1 is the hapax count — the
    single most-watched corpus health number (collapsing hapax share
    means boilerplate flooding; exploding means tokenizer damage).

    Two aggregates total: token counts, then counts-of-counts — the
    second runs over O(vocab) rows.
    """
    tc = term_counts(df, text_col)
    bucket = (
        F.when(F.col("cnt") <= max_freq, F.col("cnt")).otherwise(
            F.lit(max_freq + 1)
        )
    ).alias("freq")
    spec = tc.select(bucket).groupBy("freq").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    from pyspark.sql import Window as W

    # O(max_freq+1) rows — the single-partition window is on a tiny frame
    tot = F.sum("n_tokens").over(W.partitionBy())
    return spec.select(
        "freq",
        "n_tokens",
        (F.col("n_tokens") / tot).alias("vocab_share"),
    )


def _fit_sql(pts_sql: str, out: str) -> str:
    """Shared least-squares CTE tail: ``pts_sql`` must yield (x, y)."""
    return f"""
WITH pts AS ({pts_sql}),
agg AS (
  SELECT count(*)::double AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pts
)
SELECT {out}
FROM agg
"""


# Guarded least-squares output (mirrors the Spark degenerate rules:
# varx=0 → slope NULL + intercept=mean(y); n=0 → all NULL; r2 fallback 1.0)
_FIT_OUT = """CASE WHEN (n * sxx - sx * sx) > 0
            THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS {slope},
       CASE WHEN n > 0 THEN
         (sy - coalesce(CASE WHEN (n * sxx - sx * sx) > 0
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 0.0) * sx) / n
       END AS {icept},
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
         (n * sxy - sx * sy) * (n * sxy - sx * sy)
         / ((n * sxx - sx * sx) * (n * syy - sy * sy))
       WHEN n > 0 THEN 1.0 END AS r2,
       n::bigint AS {n_out}"""


def oracle_zipf_sql(docs_sql: str, text_col: str, top_k: int = 1000) -> str:
    pts = f"""
  SELECT ln(cnt::double) AS y,
         ln(row_number() OVER (ORDER BY cnt DESC, token ASC)::double) AS x
  FROM (
    SELECT token, count(*) AS cnt
    FROM (
      SELECT unnest(list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),
                                w -> length(w) > 0)) AS token
      FROM ({docs_sql})
    )
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT {top_k}
  )
"""
    return _fit_sql(
        pts,
        _FIT_OUT.replace("{slope}", "slope")
        .replace("{icept}", "intercept")
        .replace("{n_out}", "n_terms"),
    )


def oracle_heaps_sql(docs_sql: str, text_col: str) -> str:
    pts = f"""
  SELECT ln(nn) AS x, ln(vv) AS y
  FROM (
    SELECT length(w)::double AS nn,
           length(list_distinct(w))::double AS vv
    FROM (
      SELECT list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),
                         x -> length(x) > 0) AS w
      FROM ({docs_sql})
    )
  )
  WHERE nn >= 2 AND vv >= 2
"""
    out = (
        _FIT_OUT.replace("{slope}", "beta")
        .replace("{icept}", "__icept")
        .replace("{n_out}", "n_docs")
    )
    inner = _fit_sql(pts, out)
    return (
        "SELECT exp(__icept) AS k, beta, r2, n_docs FROM (" + inner + ")"
    )


def oracle_freq_spectrum_sql(
    docs_sql: str, text_col: str, max_freq: int = 10
) -> str:
    return f"""
WITH tc AS (
  SELECT token, count(*) AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),
                              w -> length(w) > 0)) AS token
    FROM ({docs_sql})
  )
  GROUP BY token
),
spec AS (
  SELECT CASE WHEN cnt <= {max_freq} THEN cnt
              ELSE {max_freq + 1} END AS freq,
         count(*)::bigint AS n_tokens
  FROM tc GROUP BY 1
)
SELECT freq, n_tokens,
       n_tokens / (sum(n_tokens) OVER ())::double AS vocab_share
FROM spec
"""


def vocab_growth(
    df: DataFrame, cohort_col: str, text_col: str
) -> DataFrame:
    """Per-cohort vocabulary-novelty curve: for each ingestion cohort
    (crawl snapshot, dt partition, shard batch) the token volume, the
    number of vocabulary types seen for the FIRST time in that cohort,
    the running cumulative vocabulary, and new_type_rate = new types /
    cohort tokens. A healthy rolling crawl keeps a steady Heaps-like
    novelty tail; a collapsing new_type_rate means the crawl is
    re-fetching what it already has (dedup upstream is due), and a
    spike flags an encoding break or spam flood minting fake types.

    Scale: tokens collapse to (cohort, token) pairs map-side before
    any shuffle; first-seen is a groupBy-min over the distinct-pair
    table (O(vocab) output). The cumulative sum's global window runs
    over O(#cohorts) rows — bounded by the partition calendar, never
    by the corpus.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(cohort_col).alias("cohort"),
        F.explode(words_expr(F.lower(F.col(text_col)))).alias("tok"),
    )
    per = toks.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("tok").alias("n_types"),
    )
    first = (
        toks.groupBy("tok")
        .agg(F.min("cohort").alias("cohort"))
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_new_types"))
    )
    w = Window.orderBy("cohort").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.join(first, "cohort", "left")
        .withColumn("n_new_types", F.coalesce("n_new_types", F.lit(0)))
        .select(
            "cohort",
            "n_tokens",
            "n_types",
            "n_new_types",
            F.sum("n_new_types").over(w).alias("cum_vocab"),
            (F.col("n_new_types") / F.col("n_tokens")).alias(
                "new_type_rate"
            ),
        )
    )


def vocab_richness(df: DataFrame, text_col: str) -> DataFrame:
    """Species-richness estimators over the token frequency spectrum:
    how much vocabulary the corpus has NOT seen yet — the complement of
    `freq_spectrum`'s raw counts and the quantitative answer to "will
    more crawl buy more vocabulary?" that `vocab_growth` plots per
    cohort.

    - Chao1 (Chao 1984): est. true vocab = V + f1^2 / (2 f2), with the
      bias-corrected form V + f1(f1-1)/(2(f2+1)) used when f2 = 0.
    - Good-Turing unseen mass (Good 1953): P0 = f1 / N — probability
      the next token is a NEW type; ALSO the leave-one-out duplicate
      diagnostic (1 - P0 = mass already covered).
    - Coverage C = 1 - f1/N (Good's estimator of sample coverage).

    One explode+groupBy(token) (the shared term_counts shuffle) then
    ONE aggregate over the O(vocab) term table. Returns a single row
    (vocab, n_tokens, f1, f2, chao1, gt_unseen_mass, coverage)."""
    tc = term_counts(df, text_col)
    agg = tc.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("cnt").alias("n_tokens"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("f1"),
        F.sum((F.col("cnt") == 2).cast("long")).alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    v = F.col("vocab").cast("double")
    n = F.col("n_tokens").cast("double")
    chao1 = F.when(F.col("f2") > 0, v + f1 * f1 / (2.0 * f2)).otherwise(
        v + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0))
    )
    return agg.select(
        "vocab",
        "n_tokens",
        "f1",
        "f2",
        chao1.alias("chao1"),
        (f1 / n).alias("gt_unseen_mass"),
        (1.0 - f1 / n).alias("coverage"),
    )


def oracle_vocab_richness_sql(docs_sql: str, text_col: str) -> str:
    return f"""
WITH tc AS (
  SELECT w AS token, count(*)::bigint AS cnt
  FROM (SELECT unnest(list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),
                                  x -> len(x) > 0)) AS w
        FROM ({docs_sql}))
  GROUP BY 1
),
agg AS (
  SELECT count(*)::bigint AS vocab, sum(cnt)::bigint AS n_tokens,
         sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::bigint AS f1,
         sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)::bigint AS f2
  FROM tc
)
SELECT vocab, n_tokens, f1, f2,
       CASE WHEN f2 > 0 THEN vocab + f1::double * f1 / (2.0 * f2)
            ELSE vocab + f1::double * (f1 - 1.0) / (2.0 * (f2 + 1.0))
       END AS chao1,
       f1::double / n_tokens AS gt_unseen_mass,
       1.0 - f1::double / n_tokens AS coverage
FROM agg
"""


def concentration(
    df: DataFrame,
    group_col: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Concentration of a corpus over a categorical dimension (domains,
    sources, languages): Gini coefficient, Herfindahl-Hirschman index,
    top-1 share, and the effective number of groups (1/HHI) — the
    "is one domain eating the crawl?" diagnostic curation teams check
    before the per-domain caps (selection.py:domain_blocklist) fire.

    Gini over group sizes n_(1) <= ... <= n_(G) via the rank identity
    G = (2 * sum(i * n_i) / (G * N)) - (G + 1) / G   (i = ascending
    rank, ties broken by group name for determinism). The rank window
    runs over the AGGREGATED group table (O(groups) rows per key),
    never the corpus; the corpus contributes one map-side-combining
    groupBy. Returns (*key_cols, n_groups, n_rows, gini, hhi,
    effective_groups, top_share, top_group)."""
    from pyspark.sql import Window as W

    key_cols = key_cols or []
    sizes = df.groupBy(*key_cols, F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (W.partitionBy(*key_cols) if key_cols else W.partitionBy()).orderBy(
        F.col("n").asc(), F.col("grp").asc()
    )
    ranked = sizes.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
        F.sum(F.col("i").cast("double") * F.col("n")).alias("iw"),
        F.sum(F.col("n").cast("double") * F.col("n")).alias("sq"),
        F.max(F.struct(F.col("n"), F.col("grp"))).alias("__top"),
    )
    g = F.col("n_groups").cast("double")
    n = F.col("n_rows").cast("double")
    gini = 2.0 * F.col("iw") / (g * n) - (g + 1.0) / g
    hhi = F.col("sq") / (n * n)
    return agg.select(
        *key_cols,
        "n_groups",
        "n_rows",
        gini.alias("gini"),
        hhi.alias("hhi"),
        (1.0 / hhi).alias("effective_groups"),
        (F.col("__top.n").cast("double") / n).alias("top_share"),
        F.col("__top.grp").alias("top_group"),
    )


def oracle_concentration_sql(
    rows_sql: str, group_col: str, key_cols: list[str] | None = None
) -> str:
    keys = ", ".join(key_cols or [])
    sel = f"{keys}, " if keys else ""
    part = f"PARTITION BY {keys} " if keys else ""
    grp = f", {keys}" if keys else ""
    return f"""
WITH sizes AS (
  SELECT {sel}{group_col} AS grp, count(*)::bigint AS n
  FROM ({rows_sql}) GROUP BY grp{grp}
),
ranked AS (
  SELECT *, row_number() OVER ({part}ORDER BY n ASC, grp ASC) AS i,
         row_number() OVER ({part}ORDER BY n DESC, grp DESC) AS ri
  FROM sizes
),
agg AS (
  SELECT {sel}count(*)::bigint AS n_groups, sum(n)::bigint AS n_rows,
         sum(i::double * n) AS iw, sum(n::double * n) AS sq,
         max(CASE WHEN ri = 1 THEN n END) AS top_n,
         max(CASE WHEN ri = 1 THEN grp END) AS top_group
  FROM ranked {('GROUP BY ' + keys) if keys else ''}
)
SELECT {sel}n_groups, n_rows,
       2.0 * iw / (n_groups * n_rows) - (n_groups + 1.0) / n_groups AS gini,
       sq / (n_rows::double * n_rows) AS hhi,
       (n_rows::double * n_rows) / sq AS effective_groups,
       top_n::double / n_rows AS top_share,
       top_group
FROM agg
"""


def distinct_ngram_ratio(
    df: DataFrame,
    group_col: str,
    text_col: str,
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-group distinct-n diversity: for each n-gram order, the
    fraction of the group's n-gram TOKENS that are distinct TYPES —
    the standard distinct-1/2/3 diagnostic for templated or
    boilerplate-heavy sources (a wire-copy or listing-page source has
    a distinct-3 far below organic prose; complements
    source_containment, which finds WHO shares the text, not how
    repetitive each group is internally).

    Tokens = lowercased whitespace words (same spec as term_counts /
    zipf_fit); documents shorter than n words contribute nothing at
    order n. Returns (group, n, total_ngrams, distinct_ngrams,
    distinct_ratio); groups with zero n-grams at some order emit no
    row for it.

    Scale design: all orders ride ONE explode (grams tagged with their
    n inside a flattened struct array), then one (group, n, gram)
    distinct-aggregate — Spark plans count_distinct as a two-stage
    partial-distinct shuffle, never a driver-side set.
    """
    from .textanalysis import words_expr

    words = words_expr(F.lower(F.col(text_col)))

    def grams(n: int):
        if n == 1:
            return words
        k = F.size(words) - (n - 1)
        return F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def tag(n: int):
        # single-arg lambda: a two-arg lambda would make F.transform
        # pass the array INDEX as the second argument
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(
        F.array(*[F.transform(grams(n), tag(n)) for n in ns])
    )
    ex = df.select(
        F.col(group_col).alias("grp"), F.explode(tagged).alias("t")
    ).select("grp", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
    return (
        ex.groupBy("grp", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
            F.count_distinct(F.col("gram")).cast("bigint")
            .alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n").cast("int").alias("n"),
            "total_ngrams",
            "distinct_ngrams",
            (F.col("distinct_ngrams").cast("double")
             / F.col("total_ngrams").cast("double")).alias("distinct_ratio"),
        )
    )


def oracle_distinct_ngram_ratio_sql(
    rows_sql: str,
    group_col: str,
    text_col: str,
    ns: tuple[int, ...] = (1, 2, 3),
) -> str:
    """DuckDB twin of :func:`distinct_ngram_ratio` (one UNION ALL
    branch per order — fine at oracle scale)."""
    branches = []
    for n in ns:
        if n == 1:
            branches.append(
                "SELECT grp, 1 AS n, unnest(words) AS gram FROM w"
            )
        else:
            branches.append(
                f"SELECT grp, {n} AS n, "
                f"array_to_string(words[i+1:i+{n}], ' ') AS gram "
                f"FROM w, UNNEST(range(0, len(words) - {n - 1})) AS t(i)"
            )
    u = "\nUNION ALL\n".join(branches)
    return f"""
WITH rows_in AS ({rows_sql}),
w AS (
  SELECT {group_col} AS grp,
         list_filter(string_split_regex(trim(lower({text_col})), '\\s+'),
                     x -> length(x) > 0) AS words
  FROM rows_in
),
u AS ({u})
SELECT grp AS {group_col}, n::int AS n,
       count(*)::bigint AS total_ngrams,
       count(DISTINCT gram)::bigint AS distinct_ngrams,
       count(DISTINCT gram)::double / count(*)::double AS distinct_ratio
FROM u GROUP BY 1, 2"""


def chao1_dup_estimate(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Chao1 unseen-class estimate applied to dedup coverage (Chao
    1984; the standard species-richness lower bound): from the exact
    duplicate-class size histogram, estimate how many DISTINCT text
    classes the crawl has NOT yet seen — the "is more crawling still
    finding new content?" stopping signal. f1 = singleton classes,
    f2 = doubleton classes; unseen ≈ f1²/(2·f2) (f1·(f1-1)/2 when
    f2 = 0, the bias-corrected form).

    Returns ONE row: (n_docs, n_classes, f1, f2, est_unseen,
    est_total_classes, coverage) with coverage = n_classes /
    est_total_classes.

    Scale design: ONE groupBy on the text hash (map-side combine),
    ONE tiny groupBy on class size, one single-row fold. No windows,
    no joins.
    """
    classes = (
        df.select(
            F.md5(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
            ).alias("__h")
        )
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__sz"))
    )
    hist = classes.groupBy("__sz").agg(F.count(F.lit(1)).alias("__f"))
    agg = hist.agg(
        F.sum(F.col("__sz") * F.col("__f")).cast("bigint").alias("n_docs"),
        F.sum("__f").cast("bigint").alias("n_classes"),
        F.coalesce(
            F.sum(F.when(F.col("__sz") == 1, F.col("__f"))), F.lit(0)
        ).cast("bigint").alias("f1"),
        F.coalesce(
            F.sum(F.when(F.col("__sz") == 2, F.col("__f"))), F.lit(0)
        ).cast("bigint").alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    unseen = F.when(F.col("f2") > 0, f1 * f1 / (2.0 * f2)).otherwise(
        f1 * (f1 - 1.0) / 2.0
    )
    return agg.select(
        "n_docs",
        "n_classes",
        "f1",
        "f2",
        F.round(unseen, 6).alias("est_unseen"),
        F.round(F.col("n_classes") + unseen, 6).alias("est_total_classes"),
        F.round(
            F.col("n_classes") / (F.col("n_classes") + unseen), 6
        ).alias("coverage"),
    )


def oracle_chao1_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`chao1_dup_estimate`."""
    return f"""
WITH classes AS (
  SELECT md5(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')))
           AS h,
         count(*) AS sz
  FROM {table} GROUP BY 1
),
hist AS (SELECT sz, count(*) AS f FROM classes GROUP BY 1),
agg AS (
  SELECT sum(sz * f)::bigint AS n_docs, sum(f)::bigint AS n_classes,
         coalesce(sum(CASE WHEN sz = 1 THEN f END), 0)::bigint AS f1,
         coalesce(sum(CASE WHEN sz = 2 THEN f END), 0)::bigint AS f2
  FROM hist
)
SELECT n_docs, n_classes, f1, f2,
       round(CASE WHEN f2 > 0 THEN f1::double * f1 / (2.0 * f2)
                  ELSE f1::double * (f1 - 1.0) / 2.0 END, 6) AS est_unseen,
       round(n_classes + CASE WHEN f2 > 0 THEN f1::double * f1 / (2.0 * f2)
                              ELSE f1::double * (f1 - 1.0) / 2.0 END, 6)
         AS est_total_classes,
       round(n_classes / (n_classes
             + CASE WHEN f2 > 0 THEN f1::double * f1 / (2.0 * f2)
                    ELSE f1::double * (f1 - 1.0) / 2.0 END), 6) AS coverage
FROM agg"""


def bigram_entropy(
    df: DataFrame,
    text_col: str,
) -> DataFrame:
    """Corpus token predictability: unigram entropy H(Y), bigram
    conditional entropy H(Y|X) = -Σ p(x,y)·ln p(y|x), and their gap
    I(X;Y) (mutual information, nats) — all exact from token/bigram
    counts (Shannon 1951's printed-English measurement; public).
    Template-heavy corpora show LOW conditional entropy (the next
    token is predictable from the previous one) long before a dedup
    pass can see it; natural prose sits high. Complements
    distinct_ngram_docs (which counts types) with the
    information-theoretic view (which weighs probabilities).

    Returns ONE row: (n_tokens, n_bigrams, h_unigram, h_cond,
    mutual_info).

    Definition note (round-5 advisor): mutual_info is reported as
    h_unigram − h_cond with h_unigram over ALL tokens while h_cond is
    over the bigram population (each doc contributes n−1 bigrams), so
    it is an approximation of the bigram joint's I(X;Y) that can go
    slightly negative on short-doc corpora. The exact form would take
    H(Y) from the bigram y-marginal; both engines compute the same
    (approximate) quantity, and the oracle text is hash-frozen, so the
    approximation is documented rather than changed.

    Scale design: one explode over token positions, ONE (x, y) groupBy
    with map-side combine, one O(vocab) rollup to c_x (a second small
    groupBy over bigram TYPES, not tokens), one fold. No windows, no
    self-joins.
    """
    words = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
            " ",
        ),
        lambda w: F.length(w) > 0,
    )
    k = F.size(words) - 1
    bigrams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.struct(
                F.element_at(words, i).alias("x"),
                F.element_at(words, i + 1).alias("y"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<x:string,y:string>>"))
    bg = df.select(F.explode(bigrams).alias("b")).select("b.x", "b.y")
    cxy = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cxy"))
    cx = cxy.groupBy("x").agg(F.sum("cxy").alias("cx"))
    joined = cxy.join(cx, "x")
    n = F.broadcast(cxy.agg(F.sum("cxy").alias("__n")))
    hc = (
        joined.crossJoin(n)
        .agg(
            F.sum(
                -(F.col("cxy") / F.col("__n"))
                * F.log(F.col("cxy") / F.col("cx"))
            ).alias("h_cond"),
            F.coalesce(F.sum("cxy"), F.lit(0)).cast("bigint").alias(
                "n_bigrams"
            ),
        )
    )
    # unigram entropy over ALL tokens (not just bigram members): count
    # every token once
    toks = df.select(F.explode(words).alias("w"))
    cw = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    nt = F.broadcast(cw.agg(F.sum("cw").alias("__t")))
    hu = cw.crossJoin(nt).agg(
        F.sum(
            -(F.col("cw") / F.col("__t")) * F.log(F.col("cw") / F.col("__t"))
        ).alias("h_unigram"),
        F.coalesce(F.sum("cw"), F.lit(0)).cast("bigint").alias("n_tokens"),
    )
    return hu.crossJoin(hc).select(
        "n_tokens",
        "n_bigrams",
        F.round("h_unigram", 6).alias("h_unigram"),
        F.round("h_cond", 6).alias("h_cond"),
        F.round(F.col("h_unigram") - F.col("h_cond"), 6).alias(
            "mutual_info"
        ),
    )


def oracle_bigram_entropy_sql(table: str, text_col: str) -> str:
    """DuckDB twin of :func:`bigram_entropy`."""
    return f"""
WITH s AS (
  SELECT list_filter(string_split(
           trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')), ' '),
           w -> length(w) > 0) AS ws
  FROM {table}
),
bg AS (
  SELECT ws[i] AS x, ws[i + 1] AS y
  FROM s, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) > 1
),
cxy AS (SELECT x, y, count(*) AS cxy FROM bg GROUP BY 1, 2),
cx AS (SELECT x, sum(cxy) AS cx FROM cxy GROUP BY 1),
nn AS (SELECT sum(cxy)::double AS n FROM cxy),
hc AS (
  SELECT sum(-(c.cxy / nn.n) * ln(c.cxy / x.cx)) AS h_cond,
         coalesce(sum(c.cxy), 0)::bigint AS n_bigrams
  FROM cxy c JOIN cx x USING (x), nn
),
tok AS (SELECT unnest(ws) AS w FROM s),
cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
tt AS (SELECT sum(cw)::double AS t FROM cw),
hu AS (
  SELECT sum(-(cw / tt.t) * ln(cw / tt.t)) AS h_unigram,
         coalesce(sum(cw), 0)::bigint AS n_tokens
  FROM cw, tt
)
SELECT n_tokens, n_bigrams, round(h_unigram, 6) AS h_unigram,
       round(h_cond, 6) AS h_cond,
       round(h_unigram - h_cond, 6) AS mutual_info
FROM hu, hc"""


def benford_audit(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """Benford first-significant-digit audit (Newcomb 1881 / Benford
    1938; public): natural multi-scale numeric data follows
    P(d) = log10(1 + 1/d); synthetic, capped, or fabricated columns
    deviate. The standard forensic screen for machine-generated
    numeric fields — here a data-quality signal for suspicious
    numeric columns (prices, counts) before they feed training
    features. Statistic: chi-square distance against the Benford
    expectation plus per-digit observed/expected shares.

    Returns 9 rows: (digit, n, observed, expected, chi_term) — sum
    chi_term downstream for the test statistic (8 dof). Zeros/nulls
    are excluded (no first significant digit).

    Scale design: first digit is a row-local string expression; ONE
    9-bucket groupBy with map-side combine; expectation is a literal.
    """
    import math

    d = F.substring(
        F.regexp_replace(
            F.format_number(F.abs(F.col(col).cast("double")), 10),
            r"[0.,]", ""
        ),
        1,
        1,
    ).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull() & (F.abs(F.col(col)) > 0))
        .select(d.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    exp = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    obs = F.col("n") / F.col("__t")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 6).alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(
                (obs - exp) * (obs - exp) / exp * F.col("__t"), 6
            ).alias("chi_term"),
        )
    )


def oracle_benford_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`benford_audit`."""
    return f"""
WITH src AS (
  SELECT substring(regexp_replace(
           format('{{:.10f}}', abs({col}::double)), '[0.,]', '', 'g'),
         1, 1)::int AS digit
  FROM {table}
  WHERE {col} IS NOT NULL AND abs({col}) > 0
),
counts AS (
  SELECT digit, count(*) AS n FROM src
  WHERE digit BETWEEN 1 AND 9 GROUP BY 1
),
tot AS (SELECT sum(n)::double AS t FROM counts)
SELECT digit, n::bigint AS n,
       round(n / tot.t, 6) AS observed,
       round(log10(1.0 + 1.0 / digit), 6) AS expected,
       round((n / tot.t - log10(1.0 + 1.0 / digit))
             * (n / tot.t - log10(1.0 + 1.0 / digit))
             / log10(1.0 + 1.0 / digit) * tot.t, 6) AS chi_term
FROM counts, tot"""
