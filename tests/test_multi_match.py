"""multi_match over per-field indexes vs brute-force dis_max."""
from __future__ import annotations

import os

import pytest

QUERY = "merge batch import"
TITLE_TOKENS = 4


@pytest.fixture(scope="module")
def title_corpus(oracle_index):
    """engine doc_id -> derived title (first TITLE_TOKENS simple
    tokens of the doc, reconstructed from the oracle's positional
    twin so it matches the engine corpus exactly)."""
    titles = {}
    for term, posting in oracle_index.pos.items():
        for d, positions in posting.items():
            for p in positions:
                if p < TITLE_TOKENS:
                    titles.setdefault(d, {})[p] = term
    out = {
        d: " ".join(t for _, t in sorted(slots.items()))
        for d, slots in titles.items()
    }
    # plant a title-only token in a few docs so the union (not join)
    # semantics of multi_match are testable: title tokens derived from
    # the text are otherwise always a subset of the text's
    for d in list(out):
        if d % 7 == 0:
            out[d] = out[d] + " zzmarker"
    return out


@pytest.fixture(scope="module")
def title_index(spark, tmp_root, built_index, title_corpus):
    """Second FIELD index over the titles, same keys + n_shards as the
    main index, so docIDs align."""
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.operators.manifest import read_doc_stats

    d, _ = built_index
    stats = read_doc_stats(spark, d).select(
        "doc_id", "repo", "path", "commit", "lang").collect()
    rows = [(r["repo"], r["path"], r["commit"], r["lang"],
             title_corpus.get(r["doc_id"], "")) for r in stats]
    src = spark.createDataFrame(
        rows, ["repo", "path", "commit", "lang", "content"])
    idx = os.path.join(tmp_root, "idx_titles")
    build_index(spark, src, idx, n_shards=4, n_groups=2)
    return idx


@pytest.fixture(scope="module")
def title_oracle(title_corpus):
    from data_prep_opensearch_spark.oracle import OracleIndex

    return OracleIndex(dict(title_corpus))


def _brute_mm(text_scores, title_scores, boost, match_type, tie, k=10):
    docs = set(text_scores) | set(title_scores)
    out = []
    for d in docs:
        parts = []
        if d in text_scores:
            parts.append(text_scores[d])
        if d in title_scores:
            parts.append(title_scores[d] * boost)
        best, total = max(parts), sum(parts)
        s = total if match_type == "most_fields" else best + tie * (total - best)
        out.append((d, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def engines(spark, built_index, title_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    return (BM25Engine(spark, d, cache=True),
            BM25Engine(spark, title_index, cache=True))


@pytest.mark.parametrize("match_type,tie,boost", [
    ("best_fields", 0.0, 2.0),
    ("best_fields", 0.4, 1.0),
    ("best_fields", 0.4, 3.0),
    ("most_fields", 0.0, 2.0),
])
def test_multi_match_parity(engines, oracle_index, title_oracle,
                            match_type, tie, boost):
    from data_prep_opensearch_spark.operators.multi_match import (
        multi_match_topk,
    )

    text_e, title_e = engines
    got = multi_match_topk(
        {"text": (text_e, 1.0), "title": (title_e, boost)},
        QUERY, k=10, match_type=match_type, tie_breaker=tie,
    ).collect()
    exp = _brute_mm(dict(oracle_index.query(QUERY, k=10 ** 9)),
                    dict(title_oracle.query(QUERY, k=10 ** 9)),
                    boost, match_type, tie)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_multi_match_guards(spark, engines, tmp_root):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.operators.multi_match import (
        multi_match_topk,
    )

    text_e, title_e = engines
    with pytest.raises(ValueError, match="match_type"):
        multi_match_topk({"a": (text_e, 1.0)}, QUERY, match_type="nope")
    # a corpus of a different size must be rejected (ids not aligned)
    small = os.path.join(tmp_root, "idx_mm_small")
    src = spark.createDataFrame(
        [("r", "p0", "c", "py", "merge batch")],
        ["repo", "path", "commit", "lang", "content"],
    )
    build_index(spark, src, small, n_shards=4, n_groups=1)
    other = BM25Engine(spark, small, cache=False)
    with pytest.raises(ValueError, match="not aligned"):
        multi_match_topk({"a": (text_e, 1.0), "b": (other, 1.0)}, QUERY)


def test_multi_match_title_only_match(engines, oracle_index, title_oracle):
    """A doc matching only in the title still surfaces (union, not
    join), scored as boost * title_score alone under pure dis_max."""
    from data_prep_opensearch_spark.operators.multi_match import (
        multi_match_topk,
    )

    query = "merge zzmarker"
    text_e, title_e = engines
    text_s = dict(oracle_index.query(query, k=10 ** 9))
    title_s = dict(title_oracle.query(query, k=10 ** 9))
    only_title = set(title_s) - set(text_s)
    assert only_title, "zzmarker docs must match in the title field only"
    got = {r["doc_id"]: r["score"] for r in multi_match_topk(
        {"text": (text_e, 1.0), "title": (title_e, 2.0)},
        query, k=10 ** 6, match_type="best_fields", tie_breaker=0.0,
    ).collect()}
    for d in only_title:
        assert got[d] == pytest.approx(2.0 * title_s[d], rel=1e-9)
