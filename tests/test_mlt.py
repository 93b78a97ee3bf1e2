"""more_like_this: Lucene MLT term selection + similarity search."""

from __future__ import annotations


def test_mlt_term_selection(spark, built_index, oracle_index):
    """mlt_terms == hand-computed Lucene selection over the oracle's
    tf/df: tf >= min_term_freq, df >= min_doc_freq, top max_query_terms
    by tf*idf desc (ties term asc)."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine, idf

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    # rebuild a doc's text surrogate from the oracle's tf (order
    # irrelevant for selection)
    src = max(oracle_index.tf, key=lambda k: oracle_index.doclen[k])
    text = " ".join(
        t for t, c in sorted(oracle_index.tf[src].items()) for _ in range(c)
    )
    for mq, mtf, mdf in [(25, 2, 5), (5, 1, 1), (3, 3, 10)]:
        got = eng.mlt_terms(text, mq, mtf, mdf)
        expected = [
            t for t, _ in sorted(
                ((t, c * idf(oracle_index.n_docs, oracle_index.df[t]))
                 for t, c in oracle_index.tf[src].items()
                 if c >= mtf and oracle_index.df[t] >= mdf),
                key=lambda x: (-x[1], x[0]),
            )[:mq]
        ]
        assert got == expected, (mq, mtf, mdf)
    assert eng.mlt_terms("") == []
    assert eng.mlt_terms("zzz qqq") == []   # unindexed terms have df 0


def test_more_like_this_parity(spark, built_index, oracle_index):
    """more_like_this == BM25 over the selected terms, source doc
    excluded, next-best promoted into the page."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    src = max(oracle_index.tf, key=lambda k: oracle_index.doclen[k])
    text = " ".join(
        t for t, c in sorted(oracle_index.tf[src].items()) for _ in range(c)
    )
    terms = eng.mlt_terms(text)
    assert terms, "big doc must select terms"
    expected = [
        (d_, s) for d_, s in oracle_index.query(" ".join(terms), 11)
        if d_ != src
    ][:10]
    got = [(r["doc_id"], r["score"]) for r in
           eng.more_like_this(text, 10, exclude_doc_id=src).collect()]
    assert [d_ for d_, _ in got] == [d_ for d_, _ in expected]
    for (gd, gs), (_, es) in zip(got, expected):
        assert abs(gs - es) <= 1e-9, (gd, gs, es)
    assert src not in {d_ for d_, _ in got}
    assert len(got) == 10
    # without exclusion the source doc itself dominates (it contains
    # every selected term at max tf*idf weight)
    with_src = [r["doc_id"] for r in eng.more_like_this(text, 10).collect()]
    assert src in with_src
