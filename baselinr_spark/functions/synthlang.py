"""Deterministic synthetic languages.

Three ASCII 'languages' with disjoint-ish character statistics so that a
char-ngram classifier (functions/langid.py) separates them cleanly and a
hashed n-gram LM (functions/perplexity.py) assigns low perplexity to
in-vocabulary prose and high perplexity to gibberish. Everything is seeded
and wall-clock-free: the vocabularies, stopwords, and training corpus are
pure functions of constants in this file.

All text is ASCII so Java-regex (Spark), RE2 (DuckDB) and Python `re`
agree byte-for-byte on the scrub/feature patterns (SURVEY.md §7 risk
register: byte-identical scrubbed text).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

LANGS: tuple[str, ...] = ("aa", "bb", "cc")
UNKNOWN_LANG = "und"

# per-language letter inventories with distinct distributions
_ALPHABETS: dict[str, str] = {
    "aa": "aeiou" * 4 + "tnshrdl",          # vowel-heavy, en-like
    "bb": "kzwvgbb" * 3 + "aeiu" + "ckzt",  # consonant-cluster heavy
    "cc": "lmpqy" * 3 + "oia" + "lmfx",     # l/m/p heavy
}

_VOCAB_SIZE = 600
_N_STOPWORDS = 20
_SEED_BASE = 1_234_567


@lru_cache(maxsize=None)
def vocab(lang: str) -> tuple[str, ...]:
    """Deterministic vocabulary for a language (600 words, 2-9 chars)."""
    alphabet = np.array(list(_ALPHABETS[lang]))
    rng = np.random.default_rng(_SEED_BASE + hash_str(lang))
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < _VOCAB_SIZE:
        length = int(rng.integers(2, 10))
        w = "".join(rng.choice(alphabet, size=length))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return tuple(words)


@lru_cache(maxsize=None)
def stopwords(lang: str) -> tuple[str, ...]:
    """First N vocab words act as the language's stopwords (they are
    sampled most frequently by the Zipf draw in sample_words)."""
    return vocab(lang)[:_N_STOPWORDS]


@lru_cache(maxsize=None)
def all_stopwords() -> frozenset[str]:
    out: set[str] = set()
    for lang in LANGS:
        out.update(stopwords(lang))
    return frozenset(out)


def hash_str(s: str) -> int:
    """Deterministic 32-bit string hash (process-independent, unlike
    Python's builtin hash)."""
    import zlib

    return zlib.crc32(s.encode("utf-8"))


def zipf_probs(n: int, a: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-a
    return p / p.sum()


def sample_words(rng: np.random.Generator, lang: str, n: int,
                 exclude_stopwords: bool = False) -> list[str]:
    v = vocab(lang)
    if exclude_stopwords:
        v = v[_N_STOPWORDS:]
    probs = zipf_probs(len(v))
    idx = rng.choice(len(v), size=n, p=probs)
    return [v[i] for i in idx]


def gibberish_words(rng: np.random.Generator, n: int) -> list[str]:
    """Uniform-random char strings over the full a-z alphabet — outside
    every language's vocabulary with overwhelming probability."""
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    for _ in range(n):
        length = int(rng.integers(4, 14))
        out.append("".join(rng.choice(alphabet, size=length)))
    return out


def words_to_lines(rng: np.random.Generator, words: list[str],
                   words_per_line: tuple[int, int] = (8, 15)) -> str:
    """Assemble words into newline-separated lines with trailing periods."""
    lines: list[str] = []
    i = 0
    while i < len(words):
        k = int(rng.integers(*words_per_line))
        chunk = words[i : i + k]
        i += k
        if chunk:
            lines.append(" ".join(chunk) + ".")
    return "\n".join(lines)


@lru_cache(maxsize=None)
def training_corpus(lang: str, n_docs: int = 200, seed: int = 777) -> tuple[str, ...]:
    """Clean training documents used to fit the langid classifier and the
    perplexity LM. Seeded independently from any test fixture so that
    train and test corpora never share an RNG stream."""
    rng = np.random.default_rng(seed + hash_str(lang))
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(60, 300))
        docs.append(words_to_lines(rng, sample_words(rng, lang, n)))
    return tuple(docs)
