"""Query-time synonyms (Lucene SynonymQuery blended statistics) vs a
brute-force recomputation, across all serving tiers."""
from __future__ import annotations

import math

import pytest


def _brute_synonyms(oracle, lits, groups, msm=1, k=10):
    """lits: plain literal terms; groups: list of member lists. Every
    group member scores idf(max group df) * own tf_norm; a group (or a
    literal) is one clause toward msm."""
    from data_prep_opensearch_spark.operators.bm25 import B, K1

    n, avgdl = oracle.n_docs, oracle.avgdl

    def _idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    scores: dict[int, float] = {}
    matched: dict[int, set[int]] = {}
    clauses = [([t], _idf(oracle.df[t])) for t in lits]
    for g in groups:
        live = [m for m in g if oracle.df[m] > 0]
        if live:
            clauses.append((live, _idf(max(oracle.df[m] for m in live))))
    for ci, (members, w_idf) in enumerate(clauses):
        for t in members:
            for d, tf in oracle.postings.get(t, []):
                dl = oracle.doclen[d]
                tfn = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + w_idf * tfn
                matched.setdefault(d, set()).add(ci)
    out = [(d, s) for d, s in scores.items() if len(matched[d]) >= msm]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    return BM25Engine(spark, d, cache=True)


def _common_terms(oracle, n=3):
    return [t for t, _ in sorted(oracle.df.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:n]]


def test_synonym_blended_parity_all_tiers(engine, oracle_index):
    a, b, c = _common_terms(oracle_index, 3)
    syn = {a: [b]}
    exp = _brute_synonyms(oracle_index, [c], [[a, b]], msm=1, k=10)
    got = engine.topk(f"{c} {a}", 10, synonyms=syn).collect()
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    loc = engine.topk_local(f"{c} {a}", 10, synonyms=syn, as_pandas=True)
    assert [(d, pytest.approx(s, rel=1e-12)) for d, s in
            zip(loc.doc_id, loc.score)] == \
        [(r["doc_id"], r["score"]) for r in got]
    bat = engine.topk_batch([f"{c} {a}"], 10, synonyms=syn).collect()
    assert [(r["doc_id"], pytest.approx(r["score"], rel=1e-12))
            for r in bat] == [(r["doc_id"], r["score"]) for r in got]


def test_synonym_group_counts_once_under_msm(engine, oracle_index):
    a, b, c = _common_terms(oracle_index, 3)
    syn = {a: [b]}
    exp = _brute_synonyms(oracle_index, [c], [[a, b]], msm=2, k=10)
    got = engine.topk(f"{c} {a}", 10, min_should_match="all",
                      synonyms=syn).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_synonym_blend_never_boosts_rare_member(engine, oracle_index):
    """A rare synonym's weight is idf(max df)/idf(own df) <= 1: the
    blended score of a doc matching only the rare member is <= its
    plain-query score."""
    by_df = sorted(oracle_index.df.items(), key=lambda kv: (-kv[1], kv[0]))
    rare = min((t for t, df in oracle_index.df.items() if df >= 3),
               key=lambda t: (oracle_index.df[t], t))
    rare_docs = {d for d, _ in oracle_index.postings[rare]}
    # a common term ABSENT from at least one rare-term doc, so a
    # doc scored by the rare member alone exists
    common = next(t for t, df in by_df
                  if df > oracle_index.df[rare]
                  and any(t not in oracle_index.tf[d] for d in rare_docs))
    plain = {r["doc_id"]: r["score"]
             for r in engine.topk(rare, 10 ** 6).collect()}
    blended = {r["doc_id"]: r["score"]
               for r in engine.topk(common, 10 ** 6,
                                    synonyms={common: [rare]}).collect()}
    only_rare = [d for d in plain
                 if rare in oracle_index.tf[d]
                 and common not in oracle_index.tf[d]]
    assert only_rare
    for d in only_rare:
        assert blended[d] <= plain[d] + 1e-12


def test_synonym_negation_and_unknown_members(engine, oracle_index):
    a, b, _ = _common_terms(oracle_index, 3)
    # -a expands through the map: docs containing b are excluded too
    got = engine.topk(f"{a} -{a}", 10, synonyms={a: [b]})
    assert got.count() == 0  # pos and neg same term -> nothing
    excl = {r["doc_id"] for r in engine.topk(
        f"{a} -{b}", 10 ** 6, synonyms={b: [a]}).collect()}
    assert not excl  # negation of b pulls in synonym a, killing all a-matches
    # unknown synonym members (df 0) drop silently
    got2 = engine.topk(a, 5, synonyms={a: ["zzznope"]}).collect()
    base = engine.topk(a, 5).collect()
    assert [(r["doc_id"], r["score"]) for r in got2] == \
        [(r["doc_id"], r["score"]) for r in base]
    # a multi-token synonym source is a contract error
    with pytest.raises(ValueError, match="exactly one"):
        engine.topk(a, 5, synonyms={"two words": [b]})


def test_synonym_member_also_literal_keeps_raw_idf(engine, oracle_index):
    """max-weight rule: when a group member is ALSO a standalone
    literal, the literal's raw idf (weight 1.0) wins over the blended
    ratio (<= 1)."""
    a, b, _ = _common_terms(oracle_index, 3)
    if oracle_index.df[b] >= oracle_index.df[a]:
        a, b = b, a  # ensure b is the RARER of the two
    got = {r["doc_id"]: r["score"] for r in engine.topk(
        f"{a} {b}", 10 ** 6, synonyms={a: [b]}).collect()}
    plain = {r["doc_id"]: r["score"] for r in engine.topk(
        f"{a} {b}", 10 ** 6).collect()}
    assert got == plain  # raw idf (weight 1.0) wins for the literal b
