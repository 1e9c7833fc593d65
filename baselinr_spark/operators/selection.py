"""Training-data selection operators: DSIR-style importance weighting
and resampling, temperature-based language mixture sampling, and
per-domain statistics / blocklist filtering.

Published methods, Spark-first recasts (additive to the reference,
whose selection surface stops at table/column smart-selection —
`/root/reference/baselinr/smart_selection/`):

* DSIR — Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling": score every raw document by the hashed-n-gram
  log-likelihood ratio log p_target(x) − log q_raw(x) under bag-of-
  n-gram models, then take a Gumbel top-k over the weights (sampling
  without replacement ∝ softmax of the log-weights).
* Temperature mixture — Conneau et al. 2020 (XLM-R, §3): rebalance a
  multilingual corpus by sampling language l with probability
  ∝ n_l^alpha, alpha < 1 upweighting the tail.

Scale design:

* Hashed features keep the model state at exactly ``n_buckets`` rows —
  a broadcast join against per-doc bucket counts, never a shuffle of
  model state. Per-doc bucket counts come from one explode + two
  map-side-combining groupBys.
* All randomness is md5-derived (Gumbel keys, per-doc uniforms), so
  results are engine-independent and each gate query has an exact
  DuckDB twin — same trick the minhash/LSH oracles use
  (`__spark_entry__._sql_minhash_lsh_pairs`).
* Temperature sampling needs only the per-language counts on the
  driver side of the plan (a tiny agg, broadcast back); the keep/drop
  decision is a row-local comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_gram_buckets",
    "dsir_log_weights",
    "dsir_resample",
    "temperature_mixture_rates",
    "temperature_mixture_sample",
    "domain_stats",
    "domain_blocklist_filter",
    "cluster_balanced_sample",
    "weighted_sample",
    "train_val_test_split",
]


def _md5_uniform(col: Column, salt: str) -> Column:
    """Deterministic U[0,1) from md5 — first 8 hex chars / 16^8."""
    h = F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit("|" + salt))), 1, 8), 16, 10)
    return h.cast("double") / F.lit(4294967296.0)


def _norm_words(text_col: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " "),
        lambda w: F.length(w) > 0,
    )


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 1024,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each document into hashed word uni+bigram feature
    buckets: (id, <carry_cols...,> bucket, cnt). Bucket = md5(gram)
    first 8 hex chars mod n_buckets — engine-independent.
    ``carry_cols`` are per-document columns carried through the explode
    and groupBy unchanged (constant within a document), so callers that
    need doc-level flags alongside the buckets avoid a corpus-scale
    join back to ``df``."""
    words = _norm_words(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(words, bigrams)
    carry = [F.col(c) for c in carry_cols]
    exploded = df.select(F.col(id_col), *carry, F.explode(grams).alias("gram"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).alias("bucket")
    return (
        exploded.select(F.col(id_col), *carry, bucket)
        .groupBy(id_col, *carry_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR importance log-weight.

    ``target_pred`` marks the in-domain target sample (rows of ``df``).
    Bag-of-hashed-n-gram models with add-one smoothing:
    log_w(x) = Σ_b cnt_b(x) · (log p_target(b) − log q_raw(b)).

    Returns (id_col, log_weight). The bucket-distribution table is
    ``n_buckets`` rows — broadcast to the per-doc counts join. The
    target flag rides through the gram explode as a carried column, so
    no corpus-scale join (let alone broadcast) is ever needed to
    recover it.
    """
    docs = df.withColumn("__is_target", target_pred)
    counts = hashed_gram_buckets(
        docs, id_col, text_col, n_buckets=n_buckets, carry_cols=("__is_target",)
    )
    per_doc = counts.select(id_col, "bucket", "cnt")

    dist = counts.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_target"), F.col("cnt")).otherwise(F.lit(0))).alias("t_cnt"),
        F.sum("cnt").alias("r_cnt"),
    )
    totals = dist.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    # add-one smoothing over the full bucket space so unseen buckets
    # stay finite; totals is a 1-row broadcast crossJoin.
    dist = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_cnt") + 1.0) / (F.col("t_tot") + F.lit(float(n_buckets))))
            - F.log((F.col("r_cnt") + 1.0) / (F.col("r_tot") + F.lit(float(n_buckets))))
        ).alias("llr"),
    )
    return (
        per_doc.join(F.broadcast(dist), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("llr")).alias("log_weight"))
    )


def dsir_resample(
    weights: DataFrame, id_col: str, *, k: int, salt: str = "dsir"
) -> DataFrame:
    """Gumbel top-k over log-weights = sampling k docs without
    replacement with probability ∝ exp(log_weight). Deterministic:
    the Gumbel noise is −log(−log u) with u md5-derived from the id.

    Returns (id_col, log_weight, gumbel_key) — the k winners.
    """
    u = _md5_uniform(F.col(id_col), salt)
    keyed = weights.select(
        F.col(id_col),
        "log_weight",
        (F.col("log_weight") - F.log(-F.log(u))).alias("gumbel_key"),
    )
    return keyed.orderBy(F.desc("gumbel_key"), F.col(id_col)).limit(k)


def temperature_mixture_rates(
    df: DataFrame, group_col: str, *, alpha: float = 0.3, target_total: int
) -> DataFrame:
    """Per-group sampling rates for temperature-based rebalancing:
    p_g ∝ n_g^alpha; rate_g = min(1, target_total · p_g / n_g).

    Returns (group_col, n_docs, mix_prob, sample_rate) — one row per
    group; at corpus scale this is a tiny agg broadcast back.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum(F.pow(F.col("n_docs"), F.lit(alpha))).alias("z"))
    return counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        (F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("z")).alias("mix_prob"),
        F.least(
            F.lit(1.0),
            F.lit(float(target_total))
            * (F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("z"))
            / F.col("n_docs"),
        ).alias("sample_rate"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    alpha: float = 0.3,
    target_total: int,
    salt: str = "mix",
) -> DataFrame:
    """Row-local deterministic keep/drop against the per-group rate:
    keep iff md5-uniform(id) < rate(group). Broadcast rates join —
    no shuffle of the corpus."""
    rates = temperature_mixture_rates(
        df, group_col, alpha=alpha, target_total=target_total
    ).select(group_col, "sample_rate")
    u = _md5_uniform(F.col(id_col), salt)
    return df.join(F.broadcast(rates), group_col).filter(u < F.col("sample_rate"))


def domain_stats(
    df: DataFrame, domain_col: str, text_col: str, lang_col: str = "lang"
) -> DataFrame:
    """Per-domain corpus statistics: doc count, total/mean chars,
    distinct languages, share of corpus. One map-side-combining agg.
    ``n_langs`` counts distinct ``lang_col`` values when that column
    exists; on lang-less inputs it is emitted as 0 rather than failing
    analysis."""
    tot = df.agg(F.count(F.lit(1)).alias("corpus_docs"))
    n_langs = (
        F.count_distinct(F.col(lang_col))
        if lang_col in df.columns
        else F.lit(0).cast("long")
    )
    return (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(F.col(text_col))).alias("total_chars"),
            F.avg(F.length(F.col(text_col))).alias("mean_chars"),
            n_langs.alias("n_langs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            "n_docs",
            "total_chars",
            "mean_chars",
            "n_langs",
            (F.col("n_docs") / F.col("corpus_docs")).alias("corpus_share"),
        )
    )


def domain_blocklist_filter(
    df: DataFrame, domain_col: str, blocklist: DataFrame
) -> DataFrame:
    """Drop documents whose domain is on the blocklist — broadcast
    left_anti join (the blocklist is always small relative to the
    corpus)."""
    return df.join(F.broadcast(blocklist), domain_col, "left_anti")


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_clusters: int = 16,
    quota: int = 10,
    salt: str = "cbs",
    prefilter_oversample: float | None = 8.0,
) -> DataFrame:
    """Diversity-aware selection over an embedding column: assign every
    vector to its nearest md5-seeded centroid (the IVF coarse quantizer
    from operators.similarity), then keep a deterministic per-cluster
    quota — the cluster-balanced sampling used to de-bias web corpora
    toward head topics (cf. DSIR §5 "diversity" ablations; SemDeDup-style
    cluster partitioning).

    Determinism: within a cluster, rank by the md5-derived integer
    u(id) — engine-independent, so the winner set has an exact DuckDB
    twin. Returns (vec_id, centroid_id, u_rank) — ≤ quota rows/cluster.

    Scale shape: centroids broadcast; assignment map-side. The
    per-cluster quota window would see partitions the size of the
    LARGEST cluster at corpus scale, so when `prefilter_oversample` is
    set, rows are pre-filtered to u/2^32 < oversample·quota/|cluster|
    (cluster sizes from a tiny broadcast agg) BEFORE the window — the
    window then ranks ~oversample·quota rows per cluster instead of
    |cluster|. The prefilter is itself deterministic, so the oracle
    replays it exactly; with oversample=8 the probability of starving a
    quota is (analytically) negligible but the cut is by construction,
    not by luck."""
    from pyspark.sql import Window as W

    from baselinr_spark.operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(df, id_col, vec_col, n_centroids=n_clusters)
    assign = ivf_assign(df, cents, id_col, vec_col).select("vec_id", "centroid_id")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("|" + salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    ranked = assign.withColumn("u_rank", u)
    if prefilter_oversample is not None:
        sizes = assign.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n_c"))
        ranked = ranked.join(F.broadcast(sizes), "centroid_id").filter(
            (F.col("u_rank") / F.lit(4294967296.0))
            < F.least(
                F.lit(1.0), F.lit(prefilter_oversample * quota) / F.col("n_c")
            )
        ).drop("n_c")
    w = W.partitionBy("centroid_id").orderBy("u_rank", "vec_id")
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .select("vec_id", "centroid_id", "u_rank")
    )


def score_buckets(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    qs: tuple[float, float] = (1.0 / 3, 2.0 / 3),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style per-group score bucketing (Wenzek et al. 2020, §4.3:
    per-language perplexity terciles → head/middle/tail cohorts).
    Ascending: scores ≤ the qs[0] quantile land in labels[0]. The score
    column is pluggable — production feeds the pipeline's perplexity
    column; anything Catalyst-expressible works.

    Scale shape: the cut table is ONE exact-percentile aggregate with
    O(|groups|) rows (languages: dozens), broadcast back onto the
    corpus for a row-local CASE — no window over the corpus, no
    per-doc shuffle beyond the single groupBy. Exact `percentile` (not
    approx) so the DuckDB twin (quantile_cont — same linear
    interpolation, see operators/anomaly.py note) reproduces the cuts
    bit-for-bit."""
    cuts = df.groupBy(*key_cols).agg(
        F.expr(f"percentile({score_col}, {qs[0]!r})").alias("__q1"),
        F.expr(f"percentile({score_col}, {qs[1]!r})").alias("__q2"),
    )
    bucket = (
        F.when(F.col(score_col) <= F.col("__q1"), labels[0])
        .when(F.col(score_col) <= F.col("__q2"), labels[1])
        .otherwise(labels[2])
    )
    return (
        df.join(F.broadcast(cuts), key_cols)
        .withColumn("bucket", bucket)
        .drop("__q1", "__q2")
    )


def bucket_rates(
    bucketed: DataFrame, key_cols: list[str], bucket_col: str = "bucket"
) -> DataFrame:
    """Per-group bucket occupancy: (keys…, bucket, n_docs, fraction) —
    the cohort-distribution table the drift checks (PSI between
    partition cohorts) consume. One groupBy + a broadcast join back to
    the per-group totals."""
    counts = bucketed.groupBy(*key_cols, bucket_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.groupBy(*key_cols).agg(F.sum("n_docs").alias("__total"))
    return (
        counts.join(F.broadcast(totals), key_cols)
        .withColumn("fraction", F.col("n_docs") / F.col("__total"))
        .drop("__total")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, probability ∝ weight
    (Efraimidis–Spirakis A-ES, 2006): key = u^(1/w) with u
    md5-derived from the id, keep the k largest keys. The linear-
    weight sibling of `dsir_resample`'s Gumbel top-k (which samples
    ∝ exp(log_weight)); use this when weights are plain non-negative
    numbers (authority scores, quality scores, token counts).

    Rows with weight <= 0 or null never win (key −∞ → filtered).
    One TakeOrderedAndProject over the corpus — no global sort, no
    shuffle beyond top-k merge; deterministic, so the winner set has
    an exact SQL twin. Computed in log space (ln u / w) to dodge
    underflow at large weights: ln-key order equals key order."""
    u = _md5_uniform(F.col(id_col), salt)
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.log(u) / w)  # ln(u^(1/w)); null when w<=0
    keyed = df.select(
        F.col(id_col),
        w.alias("weight"),
        key.alias("sample_key"),
    ).filter(F.col("sample_key").isNotNull())
    return keyed.orderBy(F.desc("sample_key"), F.col(id_col)).limit(k)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    *,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    strata_cols: tuple[str, ...] = (),
    salt: str = "split",
) -> DataFrame:
    """Append a deterministic ``split`` column ('train'/'val'/'test')
    from the id's md5-uniform: u < val_frac → val, u < val_frac +
    test_frac → test, else train. Row-local — zero shuffle, stable
    across runs/engines, and membership never changes when the corpus
    grows (the property that keeps eval sets uncontaminated across
    crawl snapshots; a fraction-of-position scheme reshuffles every
    ingest).

    ``strata_cols`` salt the hash with the stratum so per-stratum
    proportions concentrate independently (law of large numbers per
    stratum rather than corpus-wide only)."""
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac >= 1:
        raise ValueError("need val_frac, test_frac >= 0 and sum < 1")
    key = F.col(id_col).cast("string")
    for c in strata_cols:
        key = F.concat(key, F.lit("|"), F.col(c).cast("string"))
    u = _md5_uniform(key, salt)
    split = (
        F.when(u < F.lit(float(val_frac)), "val")
        .when(u < F.lit(float(val_frac + test_frac)), "test")
        .otherwise("train")
    )
    return df.withColumn("split", split)


def token_budget_mix(
    domains: DataFrame,
    *,
    budget: float,
    max_epochs: float = 4.0,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Epoch-capped token-budget allocation across domains by exact
    water-filling (the mixing step behind Llama-style data recipes:
    target mixture weights w_d, per-domain available tokens n_d, a
    total training budget B, and a repeat cap E epochs per domain —
    published setup, e.g. Touvron et al. 2023 §2.1 / Muennighoff et
    al. 2023 "Scaling Data-Constrained LMs").

    Solves Σ_d min(λ·w_d, E·n_d) = B for the single scaling factor λ
    (allocation alloc_d = min(λ·w_d, E·n_d)) in CLOSED FORM: sort
    domains by cap/weight ascending, prefix-sum caps and weights, and
    the valid cutoff (first i domains capped) is the unique row where
    the implied λ_i = (B − Σ_{j≤i} cap_j) / (W − Σ_{j≤i} w_j) sits in
    [ratio_i, ratio_{i+1}). Everything is window functions over the
    O(#domains) table — no iteration, no driver loop; at corpus scale
    the domain table is the output of one groupBy over the corpus and
    this op never rescans the corpus.

    If even all-capped falls short (Σ E·n_d < B) every domain is
    capped and ``feasible`` is false on every row. Requires positive
    weights. Returns (domain, n_tokens, weight, cap_tokens,
    alloc_tokens, epochs, capped, feasible).
    """
    from pyspark.sql import Window as W

    d = domains.select(
        F.col(domain_col).alias("domain"),
        F.col(tokens_col).cast("double").alias("n_tokens"),
        F.col(weight_col).cast("double").alias("weight"),
    ).withColumn("cap_tokens", F.lit(float(max_epochs)) * F.col("n_tokens"))
    d = d.withColumn("ratio", F.col("cap_tokens") / F.col("weight"))

    win = W.orderBy("ratio", "domain")
    c = (
        d.withColumn("i", F.row_number().over(win))
        .withColumn("cum_cap", F.sum("cap_tokens").over(win))
        .withColumn("cum_w", F.sum("weight").over(win))
        .withColumn("next_ratio", F.lead("ratio").over(win))
    )
    tot = F.broadcast(
        d.agg(
            F.sum("weight").alias("tot_w"),
            F.sum("cap_tokens").alias("tot_cap"),
        )
    )
    c = c.crossJoin(tot)
    # candidate λ for "first i rows capped"; i=0 (nobody capped) is the
    # virtual candidate lam0 = B / W, valid iff it undercuts the
    # smallest ratio.
    lam_i = (F.lit(float(budget)) - F.col("cum_cap")) / (
        F.col("tot_w") - F.col("cum_w")
    )
    valid_i = (
        (F.col("tot_w") > F.col("cum_w"))
        & (lam_i >= F.col("ratio"))
        & (F.col("next_ratio").isNull() | (lam_i < F.col("next_ratio")))
    )
    lam0 = (
        d.agg(
            (F.lit(float(budget)) / F.sum("weight")).alias("lam"),
            F.min("ratio").alias("r1"),
        )
        .filter(F.col("lam") < F.col("r1"))
        .select("lam")
    )
    # At most ONE candidate is valid (water-filling is monotone: with
    # ties only the last row of a ratio-tie group can pass, and lam0
    # excludes every lam_i — see test). An empty candidate set means
    # budget ≥ Σ caps, where λ = +inf caps every domain; min() over the
    # union with the sentinel selects the finite λ whenever one exists.
    lam = F.broadcast(
        c.filter(valid_i)
        .select(lam_i.alias("lam"))
        .unionByName(lam0)
        .unionByName(d.limit(1).select(F.lit(float("inf")).alias("lam")))
        .agg(F.min("lam").alias("lam"))
    )
    out = d.crossJoin(lam).crossJoin(tot).select(
        "domain",
        "n_tokens",
        "weight",
        "cap_tokens",
        F.least(F.col("lam") * F.col("weight"), F.col("cap_tokens")).alias(
            "alloc_tokens"
        ),
        (
            F.least(F.col("lam") * F.col("weight"), F.col("cap_tokens"))
            / F.col("n_tokens")
        ).alias("epochs"),
        (F.col("lam") * F.col("weight") >= F.col("cap_tokens")).alias("capped"),
        (F.lit(float(budget)) <= F.col("tot_cap")).alias("feasible"),
    )
    return out


def doremi_domain_weights(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "text",
    *,
    eta: float = 1.0,
    k: float = 0.5,
) -> DataFrame:
    """Single-round DoReMi-style domain reweighting (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining" — public method; exponentiated-gradient update
    w_d ∝ share_d · exp(η · excess_d), one step from the corpus
    shares). The excess loss here is the documented unigram proxy the
    sandbox can compute exactly (no trained proxy nets): per-domain
    cross-entropy under the GLOBAL add-k unigram LM minus under the
    domain's OWN add-k unigram LM —

      p(w)   = (c(w)  + k) / (N   + k·V)
      p_d(w) = (c_d(w) + k) / (N_d + k·V)   (shared V)
      H_d(·) = −Σ_w c_d(w)·ln p(·)(w) / N_d
      excess_d = max(0, H_d(global) − H_d(own))

    Domains whose tokens the corpus-wide model fits poorly relative to
    a domain-fit model get upweighted — the DoReMi signal.

    Scale: ONE corpus pass builds the (domain, gram) count table with
    map-side combine; global gram counts and all scalars derive from
    it (no second scan). The join back is on the gram key — AQE
    skew-join splits Zipf-hot grams. Output is O(#domains).

    Returns (domain, n_tokens, share, h_global, h_own, excess, weight)
    with Σ weight = 1.
    """
    dg = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
                )
            ).alias("gram"),
        )
        .groupBy("domain", "gram")
        .agg(F.count(F.lit(1)).alias("c_d"))
    ).localCheckpoint(eager=False)
    g = dg.groupBy("gram").agg(F.sum("c_d").alias("c"))
    scalars = F.broadcast(
        g.agg(
            F.count(F.lit(1)).cast("double").alias("__v"),
            F.sum("c").cast("double").alias("__n"),
        )
    )
    nd = dg.groupBy("domain").agg(F.sum("c_d").cast("double").alias("n_d"))
    terms = (
        dg.join(g, "gram")
        .join(F.broadcast(nd), "domain")
        .crossJoin(scalars)
        .groupBy("domain")
        .agg(
            F.first("n_d").alias("n_d"),
            (
                -F.sum(
                    F.col("c_d")
                    * F.log(
                        (F.col("c") + F.lit(k))
                        / (F.col("__n") + F.lit(k) * F.col("__v"))
                    )
                )
                / F.first("n_d")
            ).alias("h_global"),
            (
                -F.sum(
                    F.col("c_d")
                    * F.log(
                        (F.col("c_d") + F.lit(k))
                        / (F.col("n_d") + F.lit(k) * F.col("__v"))
                    )
                )
                / F.first("n_d")
            ).alias("h_own"),
        )
    )
    tot_n = F.broadcast(terms.agg(F.sum("n_d").alias("__tn")))
    scored = (
        terms.crossJoin(tot_n)
        .select(
            "domain",
            F.col("n_d").cast("long").alias("n_tokens"),
            (F.col("n_d") / F.col("__tn")).alias("share"),
            "h_global",
            "h_own",
            F.greatest(
                F.lit(0.0), F.col("h_global") - F.col("h_own")
            ).alias("excess"),
            (
                (F.col("n_d") / F.col("__tn"))
                * F.exp(
                    F.lit(float(eta))
                    * F.greatest(
                        F.lit(0.0), F.col("h_global") - F.col("h_own")
                    )
                )
            ).alias("__uw"),
        )
    )
    z = F.broadcast(scored.agg(F.sum("__uw").alias("__z")))
    return scored.crossJoin(z).select(
        "domain",
        "n_tokens",
        "share",
        "h_global",
        "h_own",
        "excess",
        (F.col("__uw") / F.col("__z")).alias("weight"),
    )


def domain_rate_shrunk(
    df: DataFrame,
    domain_col: str,
    flag_col: str,
    *,
    prior_strength: float = 50.0,
) -> DataFrame:
    """Empirical-Bayes shrinkage of a per-domain rate (keep rate, rule
    fire rate, dup rate …): posterior mean under a Beta prior centered
    on the corpus-wide rate with ``prior_strength`` pseudo-counts —
    shrunk = (k_d + s·p̄) / (n_d + s).

    Why: blocklisting or boosting domains by RAW rate flags tiny
    domains on noise (a 2-doc domain with 0 keeps looks maximally bad);
    shrinkage makes small-n domains revert to the corpus mean so only
    domains with real evidence move — the standard fix wherever
    per-key rates feed thresholds at web scale.

    ONE map-side-combined groupBy to O(#domains) rows + a broadcast
    1-row global-rate join. Returns (domain, n_docs, rate, shrunk_rate)
    sorted nowhere (callers rank as they like)."""
    flags = df.select(
        F.col(domain_col).alias("domain"),
        F.col(flag_col).cast("double").alias("__f"),
    )
    per = flags.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__f").alias("__k")
    )
    glob = F.broadcast(flags.agg(F.avg("__f").alias("__p")))
    s = float(prior_strength)
    return per.crossJoin(glob).select(
        "domain",
        "n_docs",
        (F.col("__k") / F.col("n_docs")).alias("rate"),
        (
            (F.col("__k") + F.lit(s) * F.col("__p"))
            / (F.col("n_docs") + F.lit(s))
        ).alias("shrunk_rate"),
    )


def pareto_quality_sample(
    df: DataFrame,
    id_col: str,
    score_col: str,
    *,
    alpha: float = 9.0,
    salt: str = "pareto",
) -> DataFrame:
    """GPT-3-style stochastic quality filtering (Brown et al. 2020,
    Appendix A): keep a document iff a Pareto(alpha) draw exceeds
    ``1 − score``, so high-scoring documents are almost always kept
    while low scorers still enter the corpus with small probability —
    avoiding the hard-threshold cliff and the topical bias of keeping
    only classifier-confident pages. ``score_col`` is any in-[0,1]
    quality signal (classifier probability, calibrated heuristic).

    Deterministic replay: the draw is the inverse-CDF transform
    ``(1−u)^(−1/α) − 1`` (numpy's Lomax convention) of the md5
    uniform, so the kept set is engine- and partitioning-independent.
    Row-local — zero shuffle, no model state, survives any corpus
    scale unchanged."""
    u = _md5_uniform(F.col(id_col), salt)
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return df.filter(draw > F.lit(1.0) - F.col(score_col))


def token_budget_threshold(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    *,
    budget_frac: float,
    n_bins: int = 100,
) -> DataFrame:
    """Quality-score cutoff that fills a training-token budget: given
    per-document quality scores in [0,1] and token counts, find the
    highest score threshold whose kept set (score ≥ threshold) still
    carries ≥ ``budget_frac`` of total corpus tokens — the "keep the
    top X% by classifier, sized in tokens not documents" step of
    LLaMA/phi-style data recipes (published setup: classifier-scored
    CommonCrawl pruned to a fixed token budget).

    Scale shape: ONE groupBy collapses the corpus to ≤ n_bins
    equal-width score-bin rows (map-side combined); the cumulative
    sweep is a window over that tiny table, descending from the best
    bin; the chosen bin broadcasts back as a 1-row cross join. The
    corpus is scanned once and never shuffled row-wise; the actual
    keep step downstream is a row-local ``score >= threshold`` filter.
    Threshold resolution is the bin width — callers wanting finer cuts
    raise ``n_bins``, not the shuffle size.

    Returns one row per non-empty bin, descending-cumulative:
    (bin, bin_lo, n_docs, tokens, cum_docs, cum_tokens, selected,
    threshold) where ``selected`` marks bins at/above the chosen
    cutoff and ``threshold`` (replicated) is the chosen bin's lower
    edge. ``budget_frac`` ≤ 1 guarantees a solution (the full corpus
    meets any fraction of itself).
    """
    from pyspark.sql import Window as W

    b = F.least(
        F.floor(F.col(score_col) * F.lit(n_bins)).cast("long"),
        F.lit(n_bins - 1).cast("long"),
    )
    per_bin = (
        df.select(b.alias("bin"), F.col(tokens_col).cast("long").alias("__t"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("tokens"))
    )
    win = W.orderBy(F.desc("bin")).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_bin.select(
        "bin",
        "n_docs",
        "tokens",
        F.sum("n_docs").over(win).alias("cum_docs"),
        F.sum("tokens").over(win).alias("cum_tokens"),
    )
    chosen = F.broadcast(
        cum.crossJoin(
            F.broadcast(per_bin.agg(F.sum("tokens").alias("__tot")))
        )
        .filter(
            F.col("cum_tokens").cast("double")
            >= F.lit(float(budget_frac)) * F.col("__tot")
        )
        .agg(F.max("bin").alias("__chosen"))
    )
    return cum.crossJoin(chosen).select(
        "bin",
        (F.col("bin").cast("double") / F.lit(n_bins)).alias("bin_lo"),
        "n_docs",
        "tokens",
        "cum_docs",
        "cum_tokens",
        (F.col("bin") >= F.col("__chosen")).alias("selected"),
        (F.col("__chosen").cast("double") / F.lit(n_bins)).alias("threshold"),
    )


def oracle_token_budget_threshold_sql(
    rows_sql: str,
    score_col: str,
    tokens_col: str,
    *,
    budget_frac: float,
    n_bins: int = 100,
) -> str:
    """DuckDB twin of :func:`token_budget_threshold` over ``rows_sql``."""
    return f"""
WITH rows_in AS ({rows_sql}),
per_bin AS (
  SELECT least(floor(({score_col}) * {n_bins}), {n_bins - 1})::bigint AS bin,
         count(*)::bigint AS n_docs,
         sum(({tokens_col})::bigint)::bigint AS tokens
  FROM rows_in GROUP BY 1
),
cum AS (
  SELECT bin, n_docs, tokens,
         sum(n_docs) OVER (ORDER BY bin DESC) AS cum_docs,
         sum(tokens) OVER (ORDER BY bin DESC) AS cum_tokens
  FROM per_bin
),
chosen AS (
  SELECT max(bin) AS ch FROM cum
  WHERE cum_tokens::double >= {float(budget_frac)!r} * (SELECT sum(tokens) FROM per_bin)
)
SELECT bin, bin / {float(n_bins)!r} AS bin_lo, n_docs, tokens,
       cum_docs::bigint AS cum_docs, cum_tokens::bigint AS cum_tokens,
       bin >= (SELECT ch FROM chosen) AS selected,
       (SELECT ch FROM chosen) / {float(n_bins)!r} AS threshold
FROM cum
"""


def grouped_score_ecdf(
    df: DataFrame, group_col: str, score_col: str
) -> DataFrame:
    """Per-group empirical CDF of a (bounded-cardinality) score column
    — the cross-lingual threshold equalizer: "keep the top 20% PER
    LANGUAGE" needs each language's score ECDF, not the global one
    (a global cutoff keeps 60% of English and 2% of Swahili when the
    classifier's score scales differ by language).

    Returns (grp, s, cnt, cum, ecdf) with ecdf = P(score <= s) within
    the group. NULL scores are excluded.

    Scale design: ONE groupBy (group, score) collapses the corpus
    (map-side combined); the cumulative window runs over O(distinct
    scores) rows per group — callers round/bucket corpus-cardinality
    scores first (the same contract as roc_auc / mannwhitney). Group
    totals come from an unordered window over the same partition key,
    so there is no second shuffle.
    """
    from pyspark.sql import Window as W

    g = (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(score_col).cast("double").alias("s"),
        )
        .filter(F.col("s").isNotNull())
        .groupBy("grp", "s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum_w = W.partitionBy("grp").orderBy("s").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot_w = W.partitionBy("grp")
    return g.select(
        "grp",
        "s",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.sum("cnt").over(cum_w).cast("bigint").alias("cum"),
        (
            F.sum("cnt").over(cum_w).cast("double")
            / F.sum("cnt").over(tot_w).cast("double")
        ).alias("ecdf"),
    )


def oracle_grouped_score_ecdf_sql(
    rows_sql: str, group_col: str, score_col: str
) -> str:
    """DuckDB twin of :func:`grouped_score_ecdf` over ``rows_sql``."""
    return f"""
WITH rows_in AS ({rows_sql}),
g AS (
  SELECT {group_col} AS grp, ({score_col})::double AS s,
         count(*)::bigint AS cnt
  FROM rows_in WHERE ({score_col}) IS NOT NULL
  GROUP BY 1, 2
)
SELECT grp, s, cnt,
       sum(cnt) OVER (PARTITION BY grp ORDER BY s)::bigint AS cum,
       sum(cnt) OVER (PARTITION BY grp ORDER BY s)::double
         / sum(cnt) OVER (PARTITION BY grp)::double AS ecdf
FROM g"""


def domain_token_cap(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    score_col: str,
    tokens_col: str,
    *,
    cap_tokens: int,
) -> DataFrame:
    """Per-domain token-budget capping — the anti-domain-dominance
    lever of web-corpus recipes (RefinedWeb/FineWeb cap each domain's
    contribution so a single content farm cannot own the mixture):
    within every domain, rank documents by quality (desc, ties → min
    id) and keep them while the domain's cumulative token count stays
    within ``cap_tokens``; the domain's best document always survives
    (a cap below one document's size degrades to top-1, never to
    zero representation).

    Returns one row per document: (domain, id, score, tokens, rank,
    cum_tokens, keep).

    Scale design: ONE shuffle on the domain key; the rank/running-sum
    window is bounded per domain — sorting a domain's own documents is
    inherent to "keep its best N tokens", not incidental cost. The
    heavy tail is fine (most domains are small); for the handful of
    mega-domains the window sort is the same work a groupBy-collect
    would do, minus the memory blowup, and AQE skew-split handles the
    partition imbalance. No global window anywhere.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("domain").orderBy(F.desc("score"), F.asc("id"))
    ws = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
        F.col(tokens_col).cast("bigint").alias("tokens"),
    ).select(
        "domain",
        "id",
        "score",
        "tokens",
        F.row_number().over(w).alias("rank"),
        F.sum("tokens").over(ws).cast("bigint").alias("cum_tokens"),
    )
    return ranked.withColumn(
        "keep",
        (F.col("cum_tokens") <= F.lit(int(cap_tokens))) | (F.col("rank") == 1),
    )


def oracle_domain_token_cap_sql(
    rows_sql: str,
    domain_col: str,
    id_col: str,
    score_col: str,
    tokens_col: str,
    *,
    cap_tokens: int,
) -> str:
    """DuckDB twin of :func:`domain_token_cap` over ``rows_sql``."""
    return f"""
WITH rows_in AS ({rows_sql}),
ranked AS (
  SELECT {domain_col} AS domain, {id_col} AS id,
         ({score_col})::double AS score, ({tokens_col})::bigint AS tokens,
         row_number() OVER w AS rank,
         sum(({tokens_col})::bigint) OVER (
           PARTITION BY {domain_col}
           ORDER BY ({score_col})::double DESC, {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::bigint AS cum_tokens
  FROM rows_in
  WINDOW w AS (PARTITION BY {domain_col}
               ORDER BY ({score_col})::double DESC, {id_col})
)
SELECT domain, id, score, tokens, rank::int AS rank, cum_tokens,
       (cum_tokens <= {int(cap_tokens)} OR rank = 1) AS keep
FROM ranked"""


def snis_diagnostics(
    df: DataFrame,
    weight_col: str,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Self-normalized importance-sampling diagnostics for a weighted
    corpus (DSIR / SoftDeDup / classifier-weighted mixtures): effective
    sample size ESS = (Σw)²/Σw² — the "my reweighting collapsed onto
    200 documents" alarm — plus weight concentration (max share) and
    self-normalized weighted means of the given features next to their
    unweighted means. A resample whose ESS is 0.1% of n is noise no
    matter how principled the weights were.

    Returns ONE row: (n, sum_w, ess, ess_frac, max_w_share,
    wmean_<f>, mean_<f> ...). NULL/negative weights are treated as 0
    (excluded from every sum, consistent with a keep-probability
    reading).

    Scale design: ONE aggregate over the corpus — a handful of
    counters per feature, map-side combined, single-row shuffle. No
    sort, no second pass (max weight rides in the same aggregate).
    """
    w = F.col(weight_col).cast("double")
    w = F.when(w > 0, w).otherwise(F.lit(0.0))
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sum_w"),
        (F.sum(w) * F.sum(w) / F.sum(w * w)).alias("ess"),
        (F.sum(w) * F.sum(w) / F.sum(w * w) / F.count(F.lit(1))).alias(
            "ess_frac"
        ),
        (F.max(w) / F.sum(w)).alias("max_w_share"),
    ]
    for f in feature_cols or []:
        c = F.col(f).cast("double")
        aggs.append((F.sum(w * c) / F.sum(w)).alias(f"wmean_{f}"))
        aggs.append(F.avg(c).alias(f"mean_{f}"))
    return df.agg(*aggs)


def oracle_snis_diagnostics_sql(
    rows_sql: str, weight_col: str, feature_cols: list[str] | None = None
) -> str:
    """DuckDB twin of :func:`snis_diagnostics` over ``rows_sql``."""
    feats = "".join(
        f""",
       sum(w * ({f})::double) / sum(w) AS wmean_{f},
       avg(({f})::double) AS mean_{f}"""
        for f in feature_cols or []
    )
    return f"""
WITH rows_in AS ({rows_sql}),
ww AS (
  SELECT *, CASE WHEN ({weight_col})::double > 0
                 THEN ({weight_col})::double ELSE 0.0 END AS w
  FROM rows_in
)
SELECT count(*)::bigint AS n, sum(w) AS sum_w,
       sum(w) * sum(w) / sum(w * w) AS ess,
       sum(w) * sum(w) / sum(w * w) / count(*) AS ess_frac,
       max(w) / sum(w) AS max_w_share{feats}
FROM ww"""


def epoch_allocation_plan(
    source_tokens: DataFrame,
    weights: DataFrame,
    *,
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """The data-recipe epoch table (LLaMA-style: "CommonCrawl 0.64
    epochs, Wikipedia 2.45 epochs"): given each source's available
    token count and a target mixture weight, how many passes over
    each source does a ``budget_tokens`` training run make?
    target_tokens = budget · weight/Σweight; epochs = target /
    available. Epochs > 1 flags sources the run will repeat (memorize
    risk), epochs ≪ 1 flags sources mostly left on the floor.

    Returns one row per source: (source, avail_tokens, weight,
    target_frac, target_tokens, epochs, repeated).

    Scale design: inputs are per-SOURCE aggregates (already corpus-
    collapsed upstream); this operator joins two O(sources) tables
    with the 1-row weight total broadcast — driver-scale arithmetic
    expressed as a plan so it composes with the rest of the registry.
    """
    st = source_tokens.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("bigint").alias("avail_tokens"),
    )
    wt = weights.select(
        F.col(source_col).alias("source"),
        F.col(weight_col).cast("double").alias("weight"),
    )
    tot = wt.agg(F.sum("weight").alias("__tw"))
    j = st.join(wt, "source").crossJoin(F.broadcast(tot))
    target = F.col("weight") / F.col("__tw") * F.lit(float(budget_tokens))
    return j.select(
        "source",
        "avail_tokens",
        "weight",
        (F.col("weight") / F.col("__tw")).alias("target_frac"),
        target.alias("target_tokens"),
        (target / F.col("avail_tokens").cast("double")).alias("epochs"),
        (target / F.col("avail_tokens").cast("double") > 1.0).alias(
            "repeated"
        ),
    )


def oracle_epoch_allocation_sql(
    source_tokens_sql: str,
    weights_sql: str,
    *,
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "tokens",
    weight_col: str = "weight",
) -> str:
    """DuckDB twin of :func:`epoch_allocation_plan`."""
    b = float(budget_tokens)
    return f"""
WITH st AS (
  SELECT {source_col} AS source, ({tokens_col})::bigint AS avail_tokens
  FROM ({source_tokens_sql})
),
wt AS (
  SELECT {source_col} AS source, ({weight_col})::double AS weight
  FROM ({weights_sql})
),
tot AS (SELECT sum(weight) AS tw FROM wt)
SELECT st.source, st.avail_tokens, wt.weight,
       wt.weight / tot.tw AS target_frac,
       wt.weight / tot.tw * {b!r} AS target_tokens,
       wt.weight / tot.tw * {b!r} / st.avail_tokens::double AS epochs,
       (wt.weight / tot.tw * {b!r} / st.avail_tokens::double > 1.0)
         AS repeated
FROM st JOIN wt USING (source), tot"""


def quantile_normalize_scores(
    df: DataFrame, group_col: str, score_col: str
) -> DataFrame:
    """Cross-group quantile normalization (ECDF matching): map every
    group's score onto the GLOBAL score scale by rank — the
    cross-lingual score equalizer one step past grouped_score_ecdf:
    instead of reading per-language thresholds off each ECDF, rewrite
    each score s in group g as Q_global(F_g(s)), the smallest global
    score whose global ECDF reaches s's within-group quantile. After
    the rewrite one global cutoff keeps the same FRACTION of every
    group (the standard fix when a quality classifier's score scale
    drifts by language).

    Returns the mapping table, one row per distinct (grp, s):
    (grp, s, p, s_norm) — apply it to the corpus with one broadcast
    join on (grp, s).

    Scale design: the corpus collapses in grouped_score_ecdf's ONE
    (grp, s) groupBy (same bounded-score-cardinality contract:
    bucket corpus-cardinality scores first); everything after —
    global ECDF window and the Fg >= p range join + min — runs on
    distinct-score tables of vocabulary size, with the global table
    broadcast. The global window is over that collapsed table, never
    the corpus.
    """
    from pyspark.sql import Window as W

    g = grouped_score_ecdf(df, group_col, score_col)
    from .windows import running_sums

    glob = running_sums(
        g.groupBy("s").agg(F.sum("cnt").alias("c")), ["s"], ["c"]
    ).select(
        F.col("s").alias("sg"),
        (F.col("__cum_c").cast("double")
         / F.col("__tot_c").cast("double")).alias("fg"),
    )
    return (
        g.select("grp", "s", F.col("ecdf").alias("p"))
        .join(F.broadcast(glob), F.col("fg") >= F.col("p"))
        .groupBy("grp", "s", "p")
        .agg(F.min("sg").alias("s_norm"))
    )


def oracle_quantile_normalize_sql(
    rows_sql: str, group_col: str, score_col: str
) -> str:
    """DuckDB twin of :func:`quantile_normalize_scores`."""
    return f"""
WITH rows_in AS ({rows_sql}),
g AS (
  SELECT {group_col} AS grp, ({score_col})::double AS s,
         count(*)::bigint AS cnt
  FROM rows_in WHERE ({score_col}) IS NOT NULL GROUP BY 1, 2
),
ge AS (
  SELECT grp, s,
         sum(cnt) OVER (PARTITION BY grp ORDER BY s)::double
           / sum(cnt) OVER (PARTITION BY grp)::double AS p
  FROM g
),
gq AS (
  SELECT s AS sg,
         sum(c) OVER (ORDER BY s)::double
           / sum(c) OVER ()::double AS fg
  FROM (SELECT s, sum(cnt) AS c FROM g GROUP BY 1)
)
SELECT ge.grp, ge.s, ge.p, min(gq.sg) AS s_norm
FROM ge JOIN gq ON gq.fg >= ge.p
GROUP BY 1, 2, 3"""


def split_leakage(
    assigned: DataFrame,
    text_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Eval-contamination audit for a train/val/test assignment:
    group documents by exact normalized-text hash and report, for
    every combination of splits a duplicate group touches, how many
    groups and documents leak across that boundary. A 'train+val'
    row with nonzero n_groups means val examples are literal copies
    of training examples — the eval-set contamination row-local
    hash splitting (train_val_test_split) cannot prevent, because
    distinct ids carrying identical text hash independently. The fix
    this audit motivates is splitting by CONTENT key (dedup first,
    or hash the text instead of the id); cf. ngram_contamination for
    the n-gram (near-dup) version against benchmark suites.

    Input is a DataFrame that already carries ``split_col`` (e.g. the
    output of train_val_test_split). Returns (splits, n_groups,
    n_docs) where splits is the sorted '+'-joined set of splits in
    the group, over groups of size ≥ 2 only.

    Scale design: ONE groupBy on the text hash (collect_set over ≤3
    split labels, never doc ids), then a tiny re-aggregation over the
    ≤ 2^3 split-combination rows.
    """
    h = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    ).alias("__th")
    grp = (
        assigned.select(h, F.col(split_col).alias("__sp"))
        .groupBy("__th")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("__sp")), "+")
            .alias("splits"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return grp.groupBy("splits").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
    )


def oracle_split_leakage_sql(
    assigned_sql: str, text_col: str, split_col: str = "split"
) -> str:
    """DuckDB twin of :func:`split_leakage`; ``assigned_sql`` must
    yield the same rows (text + split) as the Spark input."""
    return f"""
WITH assigned AS ({assigned_sql}),
g AS (
  SELECT md5(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g'))) AS th,
         count(*)::bigint AS n_docs,
         array_to_string(list_sort(list_distinct(list({split_col}))), '+') AS splits
  FROM assigned GROUP BY 1 HAVING count(*) >= 2
)
SELECT splits, count(*)::bigint AS n_groups, sum(n_docs)::bigint AS n_docs
FROM g GROUP BY 1"""
