"""explain API: per-clause breakdown sums to the hit's score; empty
frame means no match."""

from __future__ import annotations


def test_explain_sums_to_score(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    queries = [
        ("import def sym1", None),
        ("import^3 needle0~1", None),      # boosts + fuzzy expansion
        ('"import def" sym1', None),       # phrase clause
        ("import def sym1", 2),            # msm gate
    ]
    for q, msm in queries:
        hits = oracle_index.query(q, 5, min_should_match=msm)
        assert hits, q
        for doc, score in hits:
            pdf = eng.explain(q, doc, min_should_match=msm)
            assert len(pdf), (q, doc)
            assert abs(pdf["contribution"].sum() - score) <= 1e-9, (q, doc)
            # every contribution row is consistent: idf*weight*tf_norm
            for r in pdf.itertuples(index=False):
                assert abs((r.idf * r.weight) * r.tf_norm
                           - r.contribution) <= 1e-12


def test_explain_non_match_is_empty(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    # a doc without the term
    with_needle = {d_ for d_, _ in oracle_index.postings["needle0"]}
    without = next(d_ for d_ in oracle_index.tf if d_ not in with_needle)
    assert len(eng.explain("needle0", without)) == 0
    # must_not exclusion
    doc = next(iter(with_needle))
    assert len(eng.explain("import -needle0", doc)) == 0
    # msm unmet: a doc carries at most one planted needle, so an AND of
    # two needles can never be satisfied
    only_needle = next(
        d_ for d_ in with_needle
        if "needle1" not in oracle_index.tf[d_]
    )
    assert len(eng.explain("needle0 needle1", only_needle,
                           min_should_match="all")) == 0
    # ...but it matches under OR and the row names the clause
    pdf = eng.explain("needle0 needle1", only_needle)
    assert list(pdf["clause"]) == ["needle0"]
    assert list(pdf["kind"]) == ["term"]
    # phrase row reports phrase_freq in tf and kind='phrase'
    hits = oracle_index.query('"import def"', 1)
    if hits:
        pdf = eng.explain('"import def"', hits[0][0])
        ph = pdf[pdf["kind"] == "phrase"]
        assert len(ph) == 1 and ph.iloc[0]["tf"] >= 1
