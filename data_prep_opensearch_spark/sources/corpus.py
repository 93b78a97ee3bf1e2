"""Deterministic synthetic source-code corpus (FIXTURES.md §F1).

Schema per BASELINE.json input_hint:
    repo string, path string, commit string, lang string, content string

Generation is STATELESS: every token of every doc is a pure function of
(seed, doc_id, position) via splitmix64 — so the corpus is byte-identical
regardless of partition count or visit order. That property is what makes
the determinism-under-parallelism test (SURVEY.md §5.5) and the N-vs-4N
scaling benchmark meaningful.

Token distribution: Zipfian vocabulary (~20k terms) + forced hot "code
stopwords" (def/return/import/...) at ~10% total mass to exercise the
hot-term shard-salting path, + planted rare "needle" terms with known
placement for query assertions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, types as T

SEED = 42
VOCAB_SIZE = 20_000
ZIPF_S = 1.07
STOPWORDS = [
    "def", "return", "import", "if", "else", "for", "while", "self",
    "class", "int", "str", "const", "var", "let", "func", "public",
]
STOPWORD_MASS = 0.10  # total probability mass of the hot terms
NEEDLE_EVERY = 101    # docs i with i % NEEDLE_EVERY == 0 get a needle term
N_NEEDLES = 64
LANGS = ["python", "java", "go", "js", "rust", "md", "txt"]
LANG_EXT = {"python": "py", "java": "java", "go": "go", "js": "js",
            "rust": "rs", "md": "md", "txt": "txt"}
MIN_LEN, MAX_LEN = 20, 4000
LEN_MU, LEN_SIGMA = 4.6, 0.8  # lognormal doclen params

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    z = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _hash2(a: np.ndarray, b: np.ndarray, salt: int) -> np.ndarray:
    return _splitmix64(
        _splitmix64(a.astype(_U64) ^ _U64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
        ^ b.astype(_U64)
    )


def _uniform(a: np.ndarray, b: np.ndarray, salt: int) -> np.ndarray:
    return _hash2(a, b, salt).astype(np.float64) / float(2**64)


def _build_vocab() -> tuple[np.ndarray, np.ndarray]:
    """(vocab array, cumulative probability) — stopwords first with fixed
    mass, then Zipf-weighted synthetic identifiers."""
    n_stop = len(STOPWORDS)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf = ranks ** (-ZIPF_S)
    zipf = zipf / zipf.sum() * (1.0 - STOPWORD_MASS)
    stop_p = np.full(n_stop, STOPWORD_MASS / n_stop)
    probs = np.concatenate([stop_p, zipf])
    words = np.array(
        STOPWORDS
        + [f"sym{i}" if i % 3 else f"fn{i}" for i in range(VOCAB_SIZE)],
        dtype=object,
    )
    return words, np.cumsum(probs)


_VOCAB, _CDF = _build_vocab()


def doc_lengths(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic lognormal-ish token count per doc (Box-Muller)."""
    i = doc_ids.astype(_U64)
    u1 = np.clip(_uniform(i, i, 1), 1e-12, 1.0)
    u2 = _uniform(i, i, 2)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    ln = np.exp(LEN_MU + LEN_SIGMA * z)
    return np.clip(ln, MIN_LEN, MAX_LEN).astype(np.int64)


def needle_token(doc_id: int) -> str | None:
    if doc_id % NEEDLE_EVERY == 0:
        return f"needle{(doc_id // NEEDLE_EVERY) % N_NEEDLES}"
    return None


def generate_chunk(doc_ids: np.ndarray) -> pd.DataFrame:
    """Generate corpus rows for the given doc ids (pure function)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n = doc_ids.shape[0]
    lens = doc_lengths(doc_ids)
    total = int(lens.sum())
    # token positions: (doc, j) pairs, fully vectorized
    doc_rep = np.repeat(doc_ids.astype(_U64), lens)
    j = np.arange(total, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    j = (j - np.repeat(starts, lens)).astype(_U64)
    u = _uniform(doc_rep, j, 3)
    tok_idx = np.searchsorted(_CDF, u, side="left")
    tok_idx = np.minimum(tok_idx, _VOCAB.shape[0] - 1)
    toks = _VOCAB[tok_idx]

    contents: list[str] = []
    langs: list[str] = []
    repos: list[str] = []
    paths: list[str] = []
    commits: list[str] = []
    for i in range(n):
        did = int(doc_ids[i])
        s, e = int(starts[i]), int(starts[i] + lens[i])
        words = toks[s:e].tolist()
        nd = needle_token(did)
        if nd is not None:
            # plant 1 + did%3 occurrences at deterministic positions
            for r in range(1 + did % 3):
                pos = int(_hash2(np.array([did], dtype=_U64),
                                 np.array([r], dtype=_U64), 4)[0] % len(words))
                words[pos] = nd
        # newline every 12 tokens: code-ish lines (exercises normalization)
        parts = []
        for w0 in range(0, len(words), 12):
            parts.append(" ".join(words[w0:w0 + 12]))
        content = "\n".join(parts)
        lang = LANGS[did % len(LANGS)]
        repo = f"org{did % 7}/repo{did % 53}"
        path = f"src/mod{did % 97}/file{did % 1009}.{LANG_EXT[lang]}"
        commit = hashlib.sha256(f"{repo}/{path}@{did}".encode()).hexdigest()[:40]
        contents.append(content)
        langs.append(lang)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
    return pd.DataFrame({
        "repo": repos, "path": paths, "commit": commits,
        "lang": langs, "content": contents,
    })


def corpus_df(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range -> mapInPandas(generate_chunk)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    rng = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield generate_chunk(pdf["id"].to_numpy())

    return rng.mapInPandas(gen, CORPUS_SCHEMA)


def corpus_pandas(n_docs: int) -> pd.DataFrame:
    """Single-process generation for unit tests / the oracle."""
    return generate_chunk(np.arange(n_docs, dtype=np.int64))
