"""rescore window (Lucene QueryRescorer) vs brute-force recombination."""
from __future__ import annotations

import pytest

QUERY = "merge batch import"


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    return BM25Engine(spark, d, cache=True)


def _phrase_of(oracle):
    """A bigram that actually occurs in the corpus: take the first doc's
    first two adjacent tokens via the positional twin."""
    d = min(oracle.doclen)
    slots = {}
    for term, posting in oracle.pos.items():
        for p in posting.get(d, []):
            slots[p] = term
    return slots[0], slots[1]


def _brute(oracle, query, phrase_q, window, k, qw, rw, mode):
    prim = oracle.query(query, k=window)
    sec = dict(oracle.query(phrase_q, k=10 ** 9))
    out = []
    for d, s in prim:
        if d in sec:
            p, r = qw * s, rw * sec[d]
            ns = {"total": p + r, "multiply": p * r, "avg": (p + r) / 2,
                  "max": max(p, r), "min": min(p, r)}[mode]
        else:
            ns = qw * s
        out.append((d, s, sec.get(d), ns))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:k]


@pytest.mark.parametrize("mode", ["total", "multiply", "avg", "max", "min"])
def test_rescore_modes_parity(engine, oracle_index, mode):
    from data_prep_opensearch_spark.operators.search_body import rescore_topk

    a, b = _phrase_of(oracle_index)
    phrase_q = f'"{a} {b}"'
    exp = _brute(oracle_index, QUERY, phrase_q, 40, 10, 1.0, 2.0, mode)
    got = rescore_topk(engine, QUERY, phrase_q, window_size=40, k=10,
                       query_weight=1.0, rescore_weight=2.0,
                       score_mode=mode).collect()
    assert [r["doc_id"] for r in got] == [d for d, *_ in exp]
    for r, (_, s, rs, ns) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
        assert r["new_score"] == pytest.approx(ns, rel=1e-9)
        if rs is None:
            assert r["rescore_score"] is None
        else:
            assert r["rescore_score"] == pytest.approx(rs, rel=1e-9)


def test_rescore_non_matching_window_keeps_primary(engine, oracle_index):
    from data_prep_opensearch_spark.operators.search_body import rescore_topk

    got = rescore_topk(engine, QUERY, '"zzz qqq"', window_size=20,
                       k=10).collect()
    base = engine.topk(QUERY, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in base]
    assert all(r["rescore_score"] is None for r in got)


def test_rescore_guards_and_window(engine, oracle_index):
    from data_prep_opensearch_spark.operators.search_body import rescore_topk

    with pytest.raises(ValueError, match="score_mode"):
        rescore_topk(engine, QUERY, QUERY, score_mode="nope")
    a, b = _phrase_of(oracle_index)
    # a window smaller than k bounds the result set
    got = rescore_topk(engine, QUERY, f'"{a} {b}"', window_size=3,
                       k=10).collect()
    assert len(got) == 3
    # window docs == first-pass top-3 (re-ranked, not re-selected)
    first = {r["doc_id"] for r in engine.topk(QUERY, 3).collect()}
    assert {r["doc_id"] for r in got} == first
