"""search_after deep pagination: cursored pages tile the full ranking
exactly, on the distributed and driver-local tiers."""

from __future__ import annotations


def _rows(df_or_pdf):
    if hasattr(df_or_pdf, "collect"):
        return [(r["doc_id"], r["score"]) for r in df_or_pdf.collect()]
    return list(df_or_pdf.itertuples(index=False, name=None))


def test_pages_tile_the_ranking(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    q, k, pages = "import def sym1", 7, 4
    full = oracle_index.query(q, k * pages)
    got: list = []
    cursor = None
    for _ in range(pages):
        page = _rows(eng.topk(q, k, search_after=cursor))
        if not page:
            break
        got.extend(page)
        last_doc, last_score = page[-1]
        cursor = (last_score, last_doc)
    assert [d_ for d_, _ in got] == [d_ for d_, _ in full]
    for (gd, gs), (_, es) in zip(got, full):
        assert abs(gs - es) <= 1e-9, (gd, gs, es)
    # no duplicates across pages
    assert len({d_ for d_, _ in got}) == len(got)


def test_pages_local_tier_and_query_language(spark, built_index,
                                             oracle_index):
    """Cursoring agrees across tiers and composes with msm + fuzzy."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    cases = [
        ("needle0~1 import", None),
        ("import def sym1", 2),
    ]
    k = 5
    for q, msm in cases:
        full = oracle_index.query(q, 3 * k, min_should_match=msm)
        page1 = full[:k]
        cursor = (page1[-1][1], page1[-1][0])   # (score, doc_id)
        expected2 = full[k:2 * k]
        got_dist = _rows(eng.topk(q, k, min_should_match=msm,
                                  search_after=cursor))
        got_loc = _rows(eng.topk_local(q, k, min_should_match=msm,
                                       search_after=cursor,
                                       as_pandas=True))
        for got in (got_dist, got_loc):
            assert [d_ for d_, _ in got] == [d_ for d_, _ in expected2], q
            for (gd, gs), (_, es) in zip(got, expected2):
                assert abs(gs - es) <= 1e-9, (q, gd)


def test_cursor_past_end_is_empty(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    q = "needle0"
    full = oracle_index.query(q, 10**9)
    last = (full[-1][1], full[-1][0])           # (score, doc_id)
    assert _rows(eng.topk(q, 10, search_after=last)) == []
    assert _rows(eng.topk_local(q, 10, search_after=last,
                                as_pandas=True)) == []
