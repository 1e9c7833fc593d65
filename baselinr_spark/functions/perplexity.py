"""KenLM-style hashed n-gram perplexity scorer as a pandas UDF.

Model: word-level n-gram LM (orders 1..3; the table layout supports any
order) with stupid backoff (alpha=0.4), counts hashed by crc32 into an
int64-keyed table — the public KenLM idea (hashed n-grams, backoff) with a
deterministic in-repo training corpus instead of an external .arpa binary.

Tokenization: lowercase, split on whitespace, strip non-alphanumeric
edges. Perplexity = exp(-mean log P(w_i | context)). Unseen words bottom
out at a floor probability, so gibberish scores orders of magnitude above
in-vocabulary prose.

Execution: table built once on the driver (deterministic), broadcast;
pandas UDF dereferences per executor; scoring loops words in CPython but
only inside Arrow batches (no per-row serde).
"""

from __future__ import annotations

import math
import re
import zlib
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import synthlang as sl

BACKOFF = 0.4
MAX_ORDER = 3
_FLOOR_P = 1e-7
_EDGE = re.compile(r"^[^a-z0-9]+|[^a-z0-9]+$")


def tokenize(text: str) -> list[str]:
    out = []
    for w in text.lower().split():
        w = _EDGE.sub("", w)
        if w:
            out.append(w)
    return out


def _h(ngram: tuple[str, ...]) -> int:
    return zlib.crc32(" ".join(ngram).encode("utf-8"))


@lru_cache(maxsize=1)
def build_model() -> tuple[dict[int, int], int]:
    """counts[hash(ngram)] for orders 1..MAX_ORDER, plus total unigrams."""
    counts: dict[int, int] = {}
    total = 0
    for lang in sl.LANGS:
        for doc in sl.training_corpus(lang):
            toks = tokenize(doc)
            total += len(toks)
            for order in range(1, MAX_ORDER + 1):
                for i in range(len(toks) - order + 1):
                    k = _h(tuple(toks[i : i + order]))
                    counts[k] = counts.get(k, 0) + 1
    return counts, total


def _word_logprob(counts: dict[int, int], total: int,
                  toks: list[str], i: int) -> float:
    """Stupid-backoff log P(toks[i] | toks[i-2:i]) — reference-shaped slow
    path, kept as the readable spec; `_score_tokens` is the hot path and
    produces bit-identical values (asserted by tests)."""
    for order in range(min(MAX_ORDER, i + 1), 0, -1):
        ctx = tuple(toks[i - order + 1 : i + 1])
        c = counts.get(_h(ctx))
        if c:
            if order == 1:
                p = c / total
            else:
                denom = counts.get(_h(ctx[:-1]))
                if not denom:
                    continue
                p = c / denom
            return math.log(p) + (MAX_ORDER - order) * math.log(BACKOFF)
    return math.log(_FLOOR_P) + (MAX_ORDER - 1) * math.log(BACKOFF)


_LB = math.log(BACKOFF)
_LFLOOR = math.log(_FLOOR_P) + (MAX_ORDER - 1) * _LB


def _score_tokens(counts: dict[int, int], total: int, toks: list[str],
                  memo: dict) -> float:
    """Sum of per-word logprobs. Identical math to `_word_logprob` (same
    expressions, same evaluation order) with the per-call overhead removed:
    direct string keys instead of tuple slicing+join, precomputed log
    constants, and a memo keyed by the exact (window, position-class) the
    value depends on — logprob for i≥2 is a pure function of the trigram."""
    get = counts.get
    crc = zlib.crc32
    log = math.log
    lp = 0.0
    for i, w in enumerate(toks):
        if i >= 2:
            key = (toks[i - 2], toks[i - 1], w)
        elif i == 1:
            key = (None, toks[0], w)
        else:
            key = (None, None, w)
        v = memo.get(key)
        if v is None:
            v = _LFLOOR
            for order in range(min(MAX_ORDER, i + 1), 0, -1):
                s = " ".join(toks[i - order + 1 : i + 1])
                c = get(crc(s.encode("utf-8")))
                if c:
                    if order == 1:
                        p = c / total
                    else:
                        denom = get(crc(s.rsplit(" ", 1)[0].encode("utf-8")))
                        if not denom:
                            continue
                        p = c / denom
                    v = log(p) + (MAX_ORDER - order) * _LB
                    break
            memo[key] = v
        lp += v
    return lp


def perplexity(text: str | None,
               model: tuple[dict[int, int], int] | None = None,
               memo: dict | None = None) -> float:
    """Score one document (oracle path / UDF inner loop)."""
    if model is None:
        model = build_model()
    counts, total = model
    if not text:
        return float("inf")
    toks = tokenize(text)
    if not toks:
        return float("inf")
    lp = _score_tokens(counts, total, toks, {} if memo is None else memo)
    return math.exp(-lp / len(toks))


def make_perplexity_udf(spark):
    bc = spark.sparkContext.broadcast(build_model())

    @F.pandas_udf(T.DoubleType())
    def perplexity_udf(texts: pd.Series) -> pd.Series:
        model = bc.value
        memo: dict = {}  # shared across docs in the batch — values are
        # pure functions of the token window, so sharing changes nothing
        return pd.Series([perplexity(t, model, memo) for t in texts],
                         dtype="float64")

    return perplexity_udf
