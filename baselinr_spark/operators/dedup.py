"""Document deduplication — exact and near-dup, at shuffle-scale.

These are the training-data-pipeline operators a 100 TB corpus needs on
top of the reference's capabilities (which only has count-level
uniqueness validation, /root/reference/baselinr/validation/validators/
uniqueness_validator.py). All methods are pure DataFrame ops — hashing is
md5/xxhash in the JVM, candidate generation is equi-join on bucket keys
(never an O(n²) cross join), so they scale with executors and AQE handles
banded-key skew.

Determinism note: minhash uses lexicographic MIN over md5 hex strings of
(seed || shingle) — identical in any engine with md5, which makes the
DuckDB oracle expressible (no RNG, no JVM-specific hash).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

DEFAULT_MINHASH_K = 8
DEFAULT_BANDS = 4  # k=8 → 4 bands × 2 rows


def normalize_text(col):
    """lowercase + collapse whitespace — the canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicates by md5 of normalized text: one row per duplicate
    group with the canonical (min id) representative and group size."""
    h = F.md5(normalize_text(F.col(text_col))).alias("text_hash")
    return (
        df.select(F.col(id_col).alias("id"), h)
        .groupBy("text_hash")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one doc (min id) per distinct normalized text."""
    from pyspark.sql import Window as W

    h = F.md5(normalize_text(F.col(text_col)))
    w = W.partitionBy("__h").orderBy(F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )


def word_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array column (native exprs:
    split → transform over index range → slice/join)."""
    words = F.filter(F.split(normalize_text(text_col), " "), lambda w: F.length(w) > 0)
    k = F.size(words) - (n - 1)
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words))),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_MINHASH_K,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): sig_i = min(md5(i || '|' || shingle)).
    One explode + one groupBy; the k 'permutations' are k conditional
    min-aggregates in the same pass, not k passes."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: band key = md5(concat of
    the band's signature rows); docs sharing any band key become
    candidates (equi-join on (band, key) — shuffle, not cross join);
    estimated Jaccard = fraction of matching signature components.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b.

    Buckets larger than `max_bucket` are dropped before the self-join —
    a degenerate band key (empty docs, boilerplate) would otherwise go
    quadratic inside its bucket. A 10k bucket is already 5·10⁷ candidate
    pairs; anything that common is boilerplate, caught far cheaper by
    exact dedup on the full text hash."""
    sig = minhash_signatures(df, id_col, text_col, k, shingle_n)
    rows_per_band = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("id", *[f"sig_{i}" for i in range(k)],
                        F.explode(band_structs).alias("bk")).select(
        "id", *[f"sig_{i}" for i in range(k)], "bk.band", "bk.key"
    )
    bucket_ok = (
        banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") <= max_bucket)
        .select("band", "key")
    )
    banded = banded.join(bucket_ok, ["band", "key"])
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            *[
                (F.col(f"l.sig_{i}") == F.col(f"r.sig_{i}")).cast("int").alias(f"m_{i}")
                for i in range(k)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"m_{i}") for i in range(k)) / float(k)
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 1,
    threshold: float = 0.5,
    max_df_frac: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard for pairs sharing ≥1 retained shingle:
    explode distinct shingles, document-frequency cut, self-equi-join on
    shingle, count intersections, |A∪B| = |A|+|B|−|A∩B|.

    The DF cut is what keeps this linear at corpus scale: a shingle
    present in d documents contributes O(d²) candidate pairs, so one
    corpus-frequent token ("the") makes the join quadratic in a way AQE
    can only redistribute, not shrink. Shingles with document frequency
    > max_df (absolute) or > max_df_frac·n_docs are dropped from both
    the join AND the per-doc set sizes, i.e. Jaccard is computed
    consistently over the pruned (non-stop-shingle) vocabulary — the
    standard trick in n-gram dedup pipelines. Pass max_df_frac=1.0 and
    max_df=None for exact full-vocabulary semantics."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        cap = F.lit(int(max_df))
    else:
        n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
        dfreq = dfreq.crossJoin(F.broadcast(n_docs))
        cap = F.greatest(F.lit(1), F.floor(F.lit(float(max_df_frac)) * F.col("__n")))
    # shuffle join keyed on shingle — the same key the self-join uses, so
    # the partitioning is reused; dfreq is vocabulary-sized, never broadcast
    kept = sh.join(dfreq.filter(F.col("__df") <= cap).select("shingle"), "shingle")
    sizes = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        kept.alias("a")
        .join(kept.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # sizes is one row per doc — shuffle joins (never broadcast at scale)
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "n_b"), "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 2,
    threshold: float = 0.6,
    max_df_frac: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Directed n-gram-set CONTAINMENT: C(A→B) = |S_A ∩ S_B| / |S_A|.

    Jaccard misses asymmetric duplication — a paragraph fully quoted
    inside a 10× longer page has Jaccard ≈ 0.1 but containment ≈ 1.0.
    Containment is the right score for superset/quote/wrapper dedup
    (Broder 1997, "On the resemblance and containment of documents" —
    public), and it's what you key "keep the superset, drop the
    fragment" policies on.

    Returns (id_a, id_b, containment) for ORDERED pairs with
    containment(A→B) ≥ threshold, id_a ≠ id_b. Same skeleton and
    document-frequency cut as `ngram_jaccard_pairs` (the DF cut applies
    to both the join and the |S_A| denominator, so the score is
    consistent over the pruned vocabulary); the intersection is
    computed once per unordered pair and emitted in both directions —
    no second join."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        cap = F.lit(int(max_df))
    else:
        n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
        dfreq = dfreq.crossJoin(F.broadcast(n_docs))
        cap = F.greatest(F.lit(1), F.floor(F.lit(float(max_df_frac)) * F.col("__n")))
    kept = sh.join(dfreq.filter(F.col("__df") <= cap).select("shingle"), "shingle")
    sizes = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # join both set sizes once, then explode the two directions from the
    # SAME intersection row — a union of two selects over `inter` would
    # put the expensive shingle self-join in the plan twice.
    return (
        inter.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed(
                "n_shingles", "n_a"
            ),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("id", "id_b").withColumnRenamed(
                "n_shingles", "n_b"
            ),
            "id_b",
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a"),
                        F.col("id_b"),
                        (F.col("n_inter") / F.col("n_a")).alias("containment"),
                    ),
                    F.struct(
                        F.col("id_b").alias("id_a"),
                        F.col("id_a").alias("id_b"),
                        (F.col("n_inter") / F.col("n_b")).alias("containment"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
        .filter(F.col("containment") >= threshold)
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 60) -> DataFrame:
    """60-bit SimHash: token hash = first 15 hex chars of md5 (60 bits,
    stays in signed int64); per bit position sum ±1 over tokens; sign →
    bit. Two narrow shuffles keyed by doc id. Returns (id, simhash)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: F.length(w) > 0)
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    bitpos = toks.withColumn("__h", h).select(
        "id",
        F.posexplode(
            # SQL lambda: the shift amount is the lambda variable, which the
            # python shiftright() helper can't take — use the expr form
            F.expr(f"transform(sequence(0, {bits - 1}), i -> (__h >> i) & 1L)")
        ).alias("pos", "bit"),
    )
    acc = bitpos.groupBy("id", "pos").agg(
        F.sum(F.col("bit") * 2 - 1).alias("s")
    )
    return acc.groupBy("id").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(1L, pos) ELSE 0L END")).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8,
    bits: int = 60, chunks: int = 4, max_bucket: int = 10_000,
) -> DataFrame:
    """Near-dup candidates by SimHash: band the fingerprint into
    `chunks` bit-chunks; docs sharing any chunk value are candidates
    (pigeonhole: hamming ≤ max_hamming with chunks > max_hamming/... is
    heuristic recall, standard practice); verify with bit_count(xor).
    Chunk buckets larger than `max_bucket` are dropped before the
    self-join (degenerate-bucket guard, see minhash_lsh_pairs)."""
    sh = simhash(df, id_col, text_col, bits)
    per = bits // chunks
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("simhash"), c * per).bitwiseAND(
                    F.lit((1 << per) - 1)
                ).alias("val"),
            )
            for c in range(chunks)
        ]
    )
    banded = sh.select("id", "simhash", F.explode(chunk_arr).alias("ck")).select(
        "id", "simhash", "ck.chunk", "ck.val"
    )
    bucket_ok = (
        banded.groupBy("chunk", "val")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") <= max_bucket)
        .select("chunk", "val")
    )
    banded = banded.join(bucket_ok, ["chunk", "val"])
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return cand


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    candidate_threshold: float = 0.25,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """The production near-dup shape: MinHash-LSH candidate generation
    followed by EXACT Jaccard verification on just the candidate pairs
    (id_a, id_b, est_jaccard, jaccard).

    This composes the two primitives into the plan you actually run at
    100 TB: `ngram_jaccard_pairs` alone is quadratic in shingle document
    frequency, `minhash_lsh_pairs` alone returns estimates with banding
    false positives — LSH bounds the candidate count to near-linear,
    then the exact set intersection runs only on those pairs. The
    verification joins each candidate to the two docs' (distinct)
    shingle arrays and intersects JVM-side (`array_intersect`) — fine
    because candidates are bounded; for very long documents swap the
    array join for the exploded-shingle groupBy shape of
    `ngram_jaccard_pairs` restricted to candidate ids.

    `candidate_threshold` filters on the signature estimate (recall
    knob); `threshold` is the exact-Jaccard floor (precision knob).
    """
    cand = minhash_lsh_pairs(
        df, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n,
        threshold=candidate_threshold, max_bucket=max_bucket,
    )
    sets_df = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = sets_df.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, component), with
    component = min id reachable in the undirected pair graph.

    Pair emitters (`minhash_lsh_pairs`, `simhash_near_pairs`,
    `lsh_verified_pairs`, …) find EDGES; actual deduplication needs the
    CLUSTERS those edges form — A~B and B~C must collapse to one keeper
    even though (A, C) was never emitted. This is HashMin label
    propagation: every vertex repeatedly adopts the minimum label in its
    neighborhood; converges in O(graph diameter) rounds, and near-dup
    clusters have tiny diameters. Each round is one shuffle-join +
    aggregate (AQE handles skewed hub vertices); convergence is checked
    with a count of changed labels. No GraphFrames dependency.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist) after every round: an iterative
    # DataFrame algorithm otherwise DOUBLES its logical plan per round
    # (labels feeds both the join and the messages), and by ~10 rounds
    # plan compilation alone OOMs the driver. Checkpointing truncates
    # the lineage so each round plans against a materialized table — on
    # a real cluster use spark.sparkContext.setCheckpointDir + a
    # reliable .checkpoint() for executor-loss tolerance.
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, labels["id"] == msgs["dst"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint()
        )
        converged = new_labels.where(F.col("_changed")).isEmpty()
        labels = new_labels.drop("_changed")
        if converged:
            break
    edges.unpersist()
    if not converged:
        # A truncated propagation silently leaves >1 "canonical" doc per
        # true component; make that observable to callers.
        logger.warning(
            "connected_components stopped at max_iter=%d without "
            "converging; labels may split true components (graph "
            "diameter exceeds max_iter)", max_iter,
        )
    return labels


def dedup_by_components(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Drop every clustered doc except its component's canonical
    (min-id) representative; docs in no cluster pass through."""
    losers = components.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    # anti-join, not broadcast: the loser set scales with dup density and
    # AQE will still pick a broadcast when it happens to be small
    return df.join(losers, id_col, "left_anti")


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination — flag training documents that share
    ≥ `min_hits` distinct word n-grams with any benchmark document
    (the train/test-overlap filter every LLM data pipeline needs; same
    construction as GPT-3/PaLM-style 8-gram decontamination).

    Scale shape: the benchmark side is corpus-tiny (10⁴–10⁶ docs) next
    to a 10¹²-doc training set, so its exploded n-gram set is BROADCAST
    and the training corpus is only SCANNED — train n-grams are
    generated row-locally (word_shingles) and probed map-side; the only
    shuffle is the groupBy over actual HITS, which are rare by
    construction. Per-train-doc n-gram counts come from a row-local
    `size(word_shingles(...))`, never a second aggregation.

    Returns (train_id, benchmark_id, n_hits, train_ngrams,
    contamination_frac = n_hits / train_ngrams)."""
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    b = benchmark.select(
        F.col(id_col).alias("benchmark_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    sizes = train.select(
        F.col(id_col).alias("train_id"),
        F.size(word_shingles(F.col(text_col), n)).alias("train_ngrams"),
    )
    hits = (
        t.join(F.broadcast(b), "g")
        .groupBy("train_id", "benchmark_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    return hits.join(sizes, "train_id").select(
        "train_id", "benchmark_id", "n_hits", "train_ngrams",
        F.round(F.col("n_hits") / F.col("train_ngrams"), 6)
        .alias("contamination_frac"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-substring detection — the hashed-shingle
    approximation of suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a word
    position starts a duplicated span iff its `shingle_n`-gram occurs in
    ≥ `min_docs` distinct documents; duplicated positions are merged
    into maximal spans per document. Because each position covers
    `shingle_n` words, two start positions whose gap is < `shingle_n`
    produce overlapping word coverage — they are merged into ONE span,
    so the returned spans are disjoint and their word lengths sum to
    the true duplicated-word footprint.

    Returns (id, span_start, span_end, n_shingles) in word positions
    (span_end = last covered word, inclusive).

    Scale shape: positional shingles are exploded (linear in corpus
    words — the same footprint as tokenisation); the corpus-wide
    duplicated-shingle set comes from ONE groupBy on the shingle hash
    with map-side combine (boilerplate shingles collapse per map task
    before the shuffle); the join back is an equi-join on the hash that
    AQE skew-splits; span merging is a per-document window (bounded
    partitions — never corpus-global)."""
    from pyspark.sql import Window as W

    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    k = F.size(words) - (shingle_n - 1)
    shingles = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, shingle_n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = df.select(
        F.col(id_col).alias("id"), F.posexplode(shingles).alias("pos", "h")
    )
    dup_keys = (
        occ.groupBy("h")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    dup_occ = occ.join(dup_keys, "h").select("id", "pos")
    # island merge with coverage-aware gaps: a new span starts only when
    # the previous duplicated position's shingle no longer reaches this
    # one (gap >= shingle_n); the running sum of break flags is the
    # segment id. First position per doc: lag is null -> flag 0.
    w = W.partitionBy("id").orderBy("pos")
    brk = (
        F.when(F.col("pos") - F.lag("pos").over(w) >= shingle_n, 1)
        .otherwise(0)
        .alias("brk")
    )
    seg = dup_occ.select("id", "pos", brk).select(
        "id",
        "pos",
        F.sum("brk")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("grp"),
    )
    return (
        seg.groupBy("id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(shingle_n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .drop("grp")
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen: DataFrame | None,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Snapshot-incremental exact dedup: filter a NEW batch against the
    hashes of everything already accepted into the corpus, without ever
    re-reading the corpus text. Returns (kept_new, seen_delta):

    * kept_new — new rows that are neither duplicates of the seen set
      nor intra-batch duplicates (min id wins within the batch);
    * seen_delta — (text_hash, first_id) rows to APPEND to the seen
      table for the next batch (exactly the kept rows' hashes).

    This is the operator a rolling web crawl actually runs: each dump
    is deduped against the union of all prior dumps. The seen state is
    one 16-byte hash + id per accepted doc — ~3 orders of magnitude
    smaller than the corpus text — and the batch-vs-seen check is a
    LEFT ANTI equi-join on the hash, which AQE skew-splits; nothing
    ever shuffles corpus text. With `seen=None` (first dump) the seen
    side is skipped entirely, degenerating to plain exact_dedup.

    Complements exact_dedup (whole-corpus) the way the pipeline
    manifest complements a full re-run (sources/manifest.py) — the same
    incremental contract, at the document level.
    """
    hashed = new_docs.withColumn(
        "text_hash", F.md5(normalize_text(F.col(text_col)))
    )
    if seen is not None:
        hashed = hashed.join(
            seen.select("text_hash").distinct(), "text_hash", "left_anti"
        )
    from pyspark.sql import Window as W

    w = W.partitionBy("text_hash").orderBy(F.col(id_col).asc())
    kept = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    delta = kept.select(
        "text_hash", F.col(id_col).alias("first_id")
    )
    return kept.drop("text_hash"), delta


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Build the persistable LSH index state for a document set:
    ``(bands_df, sigs_df)`` where bands_df = (id, band, key) — one row
    per (doc, band), the probe table — and sigs_df = (id, sigs
    array<string>) — the k minhash components, used only to estimate
    Jaccard for candidates the probe surfaces.

    Split into TWO tables on purpose: at 10^12 docs the band keys are
    what every future batch equi-joins against (bands·16 bytes/doc),
    while the k-component signatures (k·32 bytes/doc) are touched only
    for the candidate ids — storing sigs denormalized per band row
    would multiply that payload by `bands` for no query benefit."""
    sig = minhash_signatures(df, id_col, text_col, k, shingle_n)
    rows_per_band = k // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
                    )
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    bands_df = sig.select("id", F.explode(band_structs).alias("bk")).select(
        "id", "bk.band", "bk.key"
    )
    sigs_df = sig.select(
        "id", F.array(*[F.col(f"sig_{i}") for i in range(k)]).alias("sigs")
    )
    return bands_df, sigs_df


def incremental_minhash_dedup(
    new_docs: DataFrame,
    index: DataFrame | None,
    sigs: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Snapshot-incremental NEAR-dup dedup: filter a new crawl batch
    against the LSH index of everything already accepted, without ever
    re-reading (or re-hashing) the accepted corpus text — the MinHash
    twin of `incremental_exact_dedup`, and the shape a rolling
    CommonCrawl ingest actually runs (each dump deduped against the
    union of all prior dumps' *state*, which is hashes, not text).

    Returns ``(kept_new, index_delta, sigs_delta)`` — append the deltas
    to the index/sigs tables for the next batch. With ``index=None``
    (first dump) the probe is skipped and only intra-batch dedup runs.

    Semantics (deterministic, oracle-replayable):

    1. *Corpus probe*: a new doc is dropped iff it shares a band key
       with an accepted doc AND the signature match fraction is
       ≥ ``threshold``. The probe is an equi-join on (band, key) — the
       candidate set, not the corpus, pays for signature comparison.
    2. *Intra-batch*: among corpus-surviving docs, a doc is dropped iff
       a SMALLER-id corpus-surviving doc is a near-dup of it (band
       collision + est Jaccard ≥ threshold). Greedy pairwise min-id —
       deliberately NOT connected components: each batch is bounded, a
       transitive chain across a batch is rare, and the greedy rule is
       one join instead of an iterative fixpoint. Whole-corpus CC
       dedup remains available as `dedup_by_components`.

    Scale notes: band buckets larger than ``max_bucket`` on either side
    are excluded from candidate generation (same degenerate-boilerplate
    rationale as `minhash_lsh_pairs`; such docs are caught by exact
    dedup far cheaper). At production scale the index-side bucket
    counts should be maintained incrementally with the index itself
    rather than recomputed per batch — here it is one groupBy over the
    (band, key) table, which never contains text."""
    new_bands, new_sigs = minhash_band_index(
        new_docs, id_col, text_col, k, bands, shingle_n
    )
    est = (
        F.aggregate(
            F.zip_with("sigs_a", "sigs_b", lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / float(k)
    )

    surviving_ids = new_sigs.select("id")
    if index is not None:
        idx_ok = (
            index.groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket)
            .select("band", "key")
        )
        cand = (
            new_bands.join(index.join(idx_ok, ["band", "key"])
                           .select("band", "key",
                                   F.col("id").alias("old_id")),
                           ["band", "key"])
            .select(F.col("id"), "old_id")
            .distinct()
        )
        scored = (
            cand.join(new_sigs.select("id", F.col("sigs").alias("sigs_a")), "id")
            .join(
                sigs.select(F.col("id").alias("old_id"),
                            F.col("sigs").alias("sigs_b")),
                "old_id",
            )
            .withColumn("est_jaccard", est)
        )
        corpus_dups = (
            scored.filter(F.col("est_jaccard") >= threshold)
            .select("id")
            .distinct()
        )
        surviving_ids = surviving_ids.join(corpus_dups, "id", "left_anti")

    surv_bands = new_bands.join(surviving_ids, "id")
    batch_ok = (
        surv_bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") <= max_bucket)
        .select("band", "key")
    )
    surv_bands = surv_bands.join(batch_ok, ["band", "key"])
    pair = (
        surv_bands.alias("l")
        .join(
            surv_bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("old_id"), F.col("r.id").alias("id"))
        .distinct()
    )
    intra_dups = (
        pair.join(new_sigs.select("id", F.col("sigs").alias("sigs_a")), "id")
        .join(
            new_sigs.select(F.col("id").alias("old_id"),
                            F.col("sigs").alias("sigs_b")),
            "old_id",
        )
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id")
        .distinct()
    )
    kept_ids = surviving_ids.join(intra_dups, "id", "left_anti")

    kept_new = new_docs.join(
        kept_ids.withColumnRenamed("id", id_col), id_col
    )
    index_delta = new_bands.join(kept_ids, "id")
    sigs_delta = new_sigs.join(kept_ids, "id")
    return kept_new, index_delta, sigs_delta


def dedup_threshold_sweep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    thresholds: tuple[float, ...] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Dedup-threshold tuning report: for each candidate Jaccard
    threshold, how many near-dup pairs fire and how many documents the
    greedy min-id rule would drop — the one-pass diagnostic behind
    choosing `threshold` for `incremental_minhash_dedup` /
    `dedup_by_components` (the near-dup analogue of
    `evalmetrics.rule_ablation` for row filters).

    ONE LSH candidate pass at the loosest threshold, then per-doc
    ``max_est`` = max estimated Jaccard against any SMALLER-id doc (a
    doc is greedy-dropped at t iff max_est ≥ t — monotone in t, so the
    whole sweep reads off one aggregate); the T thresholds explode from
    a literal array against the O(docs)-sized per-doc maxima, never
    against the corpus text. Returns (threshold, n_pairs, n_dropped)
    with one row per threshold WHEN the corpus yields at least one LSH
    candidate pair at the loosest threshold; a corpus with zero
    candidate pairs returns 0 rows (the grid explodes off the pair
    table — matching the DuckDB twin, which is empty then too)."""
    t_min = min(thresholds)
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n,
        threshold=t_min, max_bucket=max_bucket,
    )
    grid = F.array(*[F.lit(float(t)) for t in sorted(thresholds)])
    per_doc = pairs.groupBy("id_b").agg(F.max("est_jaccard").alias("max_est"))
    doc_side = (
        per_doc.select(F.explode(grid).alias("threshold"), "max_est")
        .groupBy("threshold")
        .agg(
            F.sum((F.col("max_est") >= F.col("threshold")).cast("long")).alias("n_dropped")
        )
    )
    pair_side = (
        pairs.select(F.explode(grid).alias("threshold"), "est_jaccard")
        .groupBy("threshold")
        .agg(
            F.sum((F.col("est_jaccard") >= F.col("threshold")).cast("long")).alias("n_pairs")
        )
    )
    return (
        pair_side.join(doc_side, "threshold")
        .select("threshold", "n_pairs", "n_dropped")
    )


def lsh_plan(
    spark,
    *,
    max_sig_len: int = 128,
    s_hi: float = 0.8,
    s_lo: float = 0.4,
    recall_target: float = 0.95,
    fp_budget: float = 0.05,
) -> DataFrame:
    """MinHash-LSH parameter planner: the full (bands b, rows r) grid
    with b·r ≤ ``max_sig_len`` scored by the S-curve
    ``P(candidate | s) = 1 − (1 − s^r)^b`` (Leskovec/Rajaraman/Ullman,
    Mining of Massive Datasets §3.4 — public formula).

    For each (b, r): the 50%-candidate threshold ``s50 = (1/b)^(1/r)``,
    ``recall_hi`` = P(candidate | s_hi) (near-dups we must catch),
    ``fp_lo`` = P(candidate | s_lo) (far pairs we must not verify), and
    ``feasible`` = recall_hi ≥ recall_target ∧ fp_lo ≤ fp_budget.

    Why it exists: at 10^12 documents the band count b multiplies the
    LSH shuffle volume (each doc emits b bucket keys) and r·b bounds
    the signature bytes carried per doc, so (b, r) is a real cost knob
    — this op turns the choice into a query instead of folklore. The
    grid is O(max_sig_len·ln(max_sig_len)) rows — driver-trivial,
    corpus-independent, zero data scan.

    Returns (bands, rows, sig_len, s50, recall_hi, fp_lo, feasible)
    sorted by (bands·rows, bands).
    """
    b = spark.range(1, max_sig_len + 1).select(F.col("id").alias("bands"))
    r = spark.range(1, max_sig_len + 1).select(F.col("id").alias("rows"))
    grid = (
        b.crossJoin(F.broadcast(r))
        .filter(F.col("bands") * F.col("rows") <= max_sig_len)
    )
    prob = lambda s: 1.0 - F.pow(  # noqa: E731
        1.0 - F.pow(F.lit(float(s)), F.col("rows")), F.col("bands")
    )
    return (
        grid.select(
            "bands",
            "rows",
            (F.col("bands") * F.col("rows")).alias("sig_len"),
            F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows")).alias("s50"),
            prob(s_hi).alias("recall_hi"),
            prob(s_lo).alias("fp_lo"),
            (
                (prob(s_hi) >= F.lit(float(recall_target)))
                & (prob(s_lo) <= F.lit(float(fp_budget)))
            ).alias("feasible"),
        )
        .orderBy("sig_len", "bands")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicate-text SURGERY (Lee et al. 2021): the
    rewrite step that ``duplicate_spans`` only reports. Every
    duplicated shingle keeps its FIRST corpus occurrence (min id, then
    min position — deterministic) and every other occurrence is
    removed from its document's text; removable positions are merged
    into coverage-aware spans exactly like ``duplicate_spans`` so the
    cut words are disjoint.

    Returns (id, clean_text, n_words, n_removed_words). ``clean_text``
    is rebuilt from the NORMALIZED word stream (the same
    ``normalize_text`` space-joined words the shingles were computed
    over) with covered positions dropped — the documented contract is
    word-level surgery on normalized text, not byte-preserving
    splicing of the raw string.

    Scale shape: same as ``duplicate_spans`` — positional shingle
    explode (linear in corpus words), ONE groupBy on the shingle hash
    for the duplicated set + canonical occurrence (min struct — same
    pass), equi-join back (AQE skew-split), per-document window for
    island merge, and the surgery itself is a row-local higher-order
    ``filter`` over the words array against the doc's own span list
    (collected per id — bounded by spans-per-doc, never corpus-wide).
    """
    from pyspark.sql import Window as W

    words_expr = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    base = df.select(F.col(id_col).alias("id"), words_expr.alias("ws"))
    k = F.size(F.col("ws")) - (shingle_n - 1)
    shingles = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("ws"), i + 1, shingle_n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("id", F.posexplode(shingles).alias("pos", "h"))
    per_hash = occ.groupBy("h").agg(
        F.count_distinct("id").alias("nd"),
        F.min(F.struct("id", "pos")).alias("first_occ"),
    )
    dup = per_hash.filter(F.col("nd") >= min_docs).select("h", "first_occ")
    removable = (
        occ.join(dup, "h")
        .filter(
            (F.col("id") != F.col("first_occ.id"))
            | (F.col("pos") != F.col("first_occ.pos"))
        )
        .select("id", "pos")
        .distinct()
    )
    w = W.partitionBy("id").orderBy("pos")
    seg = removable.select(
        "id",
        "pos",
        F.sum(
            F.when(F.col("pos") - F.lag("pos").over(w) >= shingle_n, 1).otherwise(0)
        )
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("grp"),
    )
    spans = (
        seg.groupBy("id", "grp")
        .agg(
            F.min("pos").cast("long").alias("s"),
            (F.max("pos") + F.lit(shingle_n - 1)).cast("long").alias("e"),
        )
        .groupBy("id")
        .agg(F.collect_list(F.struct("s", "e")).alias("spans"))
    )
    joined = base.join(spans, "id", "left").withColumn(
        "spans", F.coalesce(F.col("spans"), F.array().cast("array<struct<s:long,e:long>>"))
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("spans"), lambda sp: (sp["s"] <= i) & (i <= sp["e"])
    )
    kept = F.filter(F.col("ws"), lambda x, i: ~covered(i.cast("long")))
    return joined.select(
        "id",
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("ws").cast("long").alias("n_words"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed_words"),
    )


def shingle_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document novelty score: the fraction of a document's
    positional shingles NOT shared with ≥ ``min_docs`` documents —
    the continuous-signal companion to ``duplicate_spans`` (RefinedWeb
    reports this as the duplicated-content fraction used to TUNE the
    dedup thresholds rather than as a hard filter).

    Returns (id, n_shingles, n_dup_shingles, novelty) with
    novelty = 1 − n_dup/n (NULL when the doc is shorter than one
    shingle). Same scale shape as ``duplicate_spans`` minus the span
    window: positional explode, ONE hash groupBy for the duplicated
    set, equi-join back, one per-doc count agg.
    """
    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    k = F.size(words) - (shingle_n - 1)
    shingles = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, shingle_n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = df.select(
        F.col(id_col).alias("id"), F.explode(shingles).alias("h")
    )
    dup_keys = (
        occ.groupBy("h")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h", F.lit(True).alias("__dup"))
    )
    per_doc = (
        occ.join(dup_keys, "h", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.col("__dup").isNotNull().cast("long")).alias("n_dup_shingles"),
        )
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_dup_shingles", F.lit(0)).alias("n_dup_shingles"),
        F.when(
            F.coalesce("n_shingles", F.lit(0)) > 0,
            1.0 - F.col("n_dup_shingles") / F.col("n_shingles"),
        ).alias("novelty"),
    )


def soft_dedup_weights(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SoftDeDup-style duplicate DOWN-WEIGHTING (She et al. 2024,
    "SoftDedup: an Efficient Data Reweighting Method for Speeding Up
    Language Model Pre-training"): instead of dropping duplicates,
    keep every row and emit ``sample_weight = 1 / commonness`` where
    commonness = number of corpus copies of the normalized text. Each
    duplicate group then contributes the expected mass of ONE document
    to the training mix — duplication bias removed without the
    coverage loss of hard dedup (the reason soft dedup beats hard
    dedup on the paper's perplexity ablations).

    Returns (id_col, text_hash, n_copies, sample_weight); row-count
    preserving. Scale: ONE map-side-combined groupBy on the 128-bit
    text hash + an equi-join back on the hash — only hashes shuffle,
    never text; AQE splits the degenerate boilerplate-hash keys."""
    h = F.md5(normalize_text(F.col(text_col)))
    keyed = df.select(F.col(id_col), h.alias("text_hash"))
    counts = keyed.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return keyed.join(counts, "text_hash").select(
        id_col,
        "text_hash",
        "n_copies",
        (F.lit(1.0) / F.col("n_copies")).alias("sample_weight"),
    )


def best_quality_keeper(
    components: DataFrame,
    scores: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware canonical selection for near-dup clusters: per
    component keep the HIGHEST-scoring member (tie -> smallest id)
    instead of the blind min-id rule of `dedup_by_components` — the
    RefinedWeb/FineWeb-style refinement where a cluster's cleanest
    extraction survives rather than its earliest crawl.

    Inputs: ``components`` = (id, component) from
    `connected_components`; ``scores`` = (id, score). Returns one row
    per component: (component, keeper_id, keeper_score, cluster_size).

    Scale shape: one equi-join on id, then ONE groupBy(component)
    whose argmax rides as max(struct(score, -id)) — map-side combined,
    deterministic under ties, no window over the cluster table.
    """
    j = components.join(
        scores.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("__score")
        ),
        "id",
    )
    ranked = j.select(
        "component",
        F.struct(
            F.col("__score").cast("double").alias("s"),
            (-F.col("id")).alias("neg_id"),
        ).alias("pick"),
    )
    agg = ranked.groupBy("component").agg(
        F.max("pick").alias("best"), F.count(F.lit(1)).alias("cluster_size")
    )
    return agg.select(
        "component",
        (-F.col("best.neg_id")).alias("keeper_id"),
        F.col("best.s").alias("keeper_score"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


def oracle_best_quality_keeper_sql(
    components_sql: str, scores_sql: str, id_col: str, score_col: str
) -> str:
    """DuckDB twin of :func:`best_quality_keeper`."""
    return f"""
WITH comp AS ({components_sql}),
sc AS ({scores_sql}),
j AS (
  SELECT comp.component, comp.id, sc.{score_col}::double AS s
  FROM comp JOIN sc ON sc.{id_col} = comp.id
),
agg AS (
  SELECT component, max(struct_pack(s := s, neg_id := -id)) AS best,
         count(*)::bigint AS cluster_size
  FROM j GROUP BY 1
)
SELECT component, -(best.neg_id) AS keeper_id, best.s AS keeper_score,
       cluster_size
FROM agg"""


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float,
    shingle_n: int = 1,
) -> DataFrame:
    """EXACT Jaccard similarity join with PPJoin-style prefix filtering
    (Chaudhuri et al. 2006 / Xiao et al. 2008): order every document's
    shingles by GLOBAL document frequency ascending (rarest first,
    ties → lexicographic), keep only the first |d| − ⌈τ·|d|⌉ + 1 as
    its "prefix", and generate candidates ONLY from prefix-token
    collisions — the pigeonhole theorem guarantees every pair with
    J ≥ τ shares at least one prefix token, so unlike the MinHash/LSH
    family this join is exact with NO recall loss, and unlike
    ngram_jaccard_pairs' DF cut it prunes nothing from the Jaccard
    itself (full-vocabulary semantics).

    Scale design: the self-join key is the prefix tokens, which by
    construction are each document's RAREST shingles — the frequent
    tokens that make a naive token self-join quadratic never enter the
    join. dfreq join and candidate join share the shingle key; the
    rank window is per-document (bounded by doc length); the final
    Jaccard is row-local over per-doc collect_set arrays (doc-length
    bounded). Returns (id_a, id_b, jaccard) for pairs with J ≥ τ.
    """
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("tok"),
    )
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("__df"))
    w = W.partitionBy("id").orderBy("__df", "tok")
    ranked = (
        tok.join(dfreq, "tok")
        .select(
            "id",
            "tok",
            F.row_number().over(w).alias("pos"),
            F.count(F.lit(1)).over(W.partitionBy("id")).alias("sz"),
        )
    )
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
    ).select("id", "tok")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sets = tok.groupBy("id").agg(F.collect_set("tok").alias("toks"))
    out = (
        cand.join(
            sets.select(F.col("id").alias("id_a"), F.col("toks").alias("ta")),
            "id_a",
        )
        .join(
            sets.select(F.col("id").alias("id_b"), F.col("toks").alias("tb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ta", "tb")).cast("double")
            / F.size(F.array_union("ta", "tb")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
    return out


def oracle_prefix_jaccard_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    *,
    threshold: float,
) -> str:
    """DuckDB twin of :func:`prefix_jaccard_pairs` (shingle_n=1) —
    identical tokenization, global-DF prefix ordering, pigeonhole
    candidate join, and exact set Jaccard."""
    t = float(threshold)
    return f"""
WITH docs_in AS ({docs_sql}),
toks AS (
  SELECT {id_col} AS id, unnest(list_distinct(
           list_filter(string_split(trim(regexp_replace(lower({text_col}),
                       '\\s+', ' ', 'g')), ' '), x -> length(x) > 0))) AS tok
  FROM docs_in
),
dfreq AS (SELECT tok, count(*)::bigint AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT t.id, t.tok,
         row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.tok) AS pos,
         count(*) OVER (PARTITION BY t.id) AS sz
  FROM toks t JOIN dfreq d USING (tok)
),
prefix AS (
  SELECT id, tok FROM ranked WHERE pos <= sz - ceil({t!r} * sz) + 1
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.id < b.id
),
sizes AS (SELECT id, count(*)::bigint AS n FROM toks GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*)::bigint AS n_i
  FROM cand c
  JOIN toks ta ON ta.id = c.id_a
  JOIN toks tb ON tb.id = c.id_b AND tb.tok = ta.tok
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       i.n_i::double / (sa.n + sb.n - i.n_i)::double AS jaccard
FROM inter i
JOIN sizes sa ON sa.id = i.id_a
JOIN sizes sb ON sb.id = i.id_b
WHERE i.n_i::double / (sa.n + sb.n - i.n_i)::double >= {t!r}"""


def source_containment(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-group syndication matrix: for every ordered pair of groups
    (a, b), the fraction of a's distinct word n-gram shingles that also
    appear anywhere in b — mirror/wire-copy detection at the corpus
    level (a feed syndicated into b shows containment(a→b) ≈ 1 while
    Jaccard stays low if b is much larger). Complements
    ngram_containment_pairs, which is per-document.

    Returns (src_a, src_b, n_shingles_a, n_common, containment), self
    pairs excluded, pairs with zero common shingles omitted.

    Contract: group cardinality G is config-scale (sources, langs,
    bucketed domains — NOT raw urls): the output is at most G², and a
    shingle shared by every group fans out to G(G-1) join rows.
    Scale design: ONE distinct-shuffle keyed (group, shingle), then a
    self-join keyed on shingle that reuses that partitioning; the
    per-group size table is G rows and broadcast. No corpus-scale
    window or collect. Reference parity: recasts the reference's
    cross-table drift comparisons (drift/engine.py compare loop) as a
    set-overlap matrix over text shingles.
    """
    sh = df.select(
        F.col(group_col).alias("g"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("g").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.g") != F.col("b.g"))
        .groupBy(F.col("a.g").alias("src_a"), F.col("b.g").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("g", "src_a")), "src_a"
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_shingles").cast("bigint").alias("n_shingles_a"),
            "n_common",
            (F.col("n_common").cast("double")
             / F.col("n_shingles").cast("double")).alias("containment"),
        )
    )


def oracle_source_containment_sql(
    rows_sql: str, group_col: str, text_col: str, shingle_n: int = 3
) -> str:
    """DuckDB twin of :func:`source_containment` (same shingle spec as
    the minhash/jaccard oracles: normalize → split → n-gram windows,
    whole-text fallback when fewer than n words)."""
    n = shingle_n
    return f"""
WITH rows_in AS ({rows_sql}),
w AS (
  SELECT {group_col} AS g,
         list_filter(string_split(trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')), ' '),
                     x -> length(x) > 0) AS words
  FROM rows_in
),
sh0 AS (
  SELECT g, unnest(list_distinct(
           CASE WHEN len(words) - {n - 1} > 0
                THEN list_transform(range(0, len(words) - {n - 1}),
                                    i -> array_to_string(words[i+1:i+{n}], ' '))
                ELSE [array_to_string(words, ' ')] END)) AS shingle
  FROM w
),
sh AS (SELECT DISTINCT g, shingle FROM sh0),
sizes AS (SELECT g, count(*)::bigint AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.g AS src_a, b.g AS src_b, count(*)::bigint AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.g <> b.g
  GROUP BY 1, 2
)
SELECT src_a, src_b, s.n AS n_shingles_a, n_common,
       n_common::double / s.n::double AS containment
FROM inter JOIN sizes s ON s.g = inter.src_a"""


def shard_spillover(
    pairs: DataFrame,
    assignment: DataFrame,
    id_col: str,
    shard_col: str = "shard",
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Shard-locality audit for distributed dedup: given near-dup
    pairs and a shard assignment, what fraction of pairs CROSS shard
    boundaries — i.e. would be missed by a shard-local dedup pass?
    This is the number that decides between shard-local dedup (cheap,
    lossy by exactly this fraction) and the global LSH band join, and
    it scores sharding functions against each other (content-derived
    shards co-locate near-dups; hash shards split them ~uniformly).

    Returns ONE row: (n_pairs, n_same_shard, spillover_frac).

    Scale design: two equi-joins on the id key (pairs ⋈ assignment,
    assignment is O(docs) but joins shuffle only the pair ids), one
    1-row aggregate. No corpus-wide window, no cross join.
    """
    asg = assignment.select(
        F.col(id_col).alias("__id"), F.col(shard_col).alias("__s")
    )
    j = (
        pairs.select(a_col, b_col)
        .join(asg.withColumnRenamed("__s", "__sa"),
              F.col(a_col) == F.col("__id"))
        .drop("__id")
        .join(asg.withColumnRenamed("__s", "__sb"),
              F.col(b_col) == F.col("__id"))
    )
    same = (F.col("__sa") == F.col("__sb")).cast("int")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(same).cast("bigint").alias("n_same_shard"),
        F.round(F.lit(1.0) - F.sum(same) / F.count(F.lit(1)), 6).alias(
            "spillover_frac"
        ),
    )


def oracle_shard_spillover_sql(
    pairs_sql: str,
    assignment_sql: str,
    id_col: str,
    shard_col: str = "shard",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> str:
    """DuckDB twin of :func:`shard_spillover`."""
    return f"""
WITH pairs_in AS ({pairs_sql}),
asg AS ({assignment_sql}),
j AS (
  SELECT (sa.{shard_col} = sb.{shard_col})::int AS same
  FROM pairs_in p
  JOIN asg sa ON sa.{id_col} = p.{a_col}
  JOIN asg sb ON sb.{id_col} = p.{b_col}
)
SELECT count(*)::bigint AS n_pairs, sum(same)::bigint AS n_same_shard,
       round(1.0 - sum(same)::double / count(*), 6) AS spillover_frac
FROM j"""
