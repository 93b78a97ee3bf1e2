"""Faceted search: full-match-set retrieval (`match_ids`) and the
OpenSearch-style bucket aggregation (`facet_counts`)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_match_ids_full_query_language(spark, built_index, oracle_index):
    """match_ids == the oracle's full match set (score > 0) under OR,
    msm, must_not, fuzzy, and phrase clauses."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    cases = [
        ("needle0 needle1", None),
        ("import def sym1", 2),
        ("import -needle0", None),
        ("needle0~1", None),
        ('"import def" sym1', None),
        ("zzzznope", None),
    ]
    for q, msm in cases:
        expected = {d_ for d_, _ in
                    oracle_index.query(q, 10**9, min_should_match=msm)}
        got = {r["doc_id"] for r in
               eng.match_ids(q, min_should_match=msm).collect()}
        assert got == expected, (q, len(got), len(expected))


def test_facet_counts_semantics(spark):
    from data_prep_opensearch_spark.operators.facets import facet_counts

    rows = [
        (1, "en", 100), (2, "en", 300), (3, "de", 300),
        (4, "de", 100), (5, "fr", 520), (6, None, 100),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n"])
    out = facet_counts(
        df,
        {"lang": "lang", "bin": F.floor(F.col("n") / 256) * 256},
        size=2,
    ).collect()
    by_facet: dict[str, list] = {}
    for r in out:
        by_facet.setdefault(r["facet"], []).append(
            (r["value"], r["n_docs"]))
    # NULL lang skipped; tie between de(2) and en(2) -> value asc; fr
    # (1 doc) cut by size=2
    assert by_facet["lang"] == [("de", 2), ("en", 2)]
    # bins: 0 ->(100,100,100)=3... values 100,100,300,300,520,100 ->
    # bin 0: n=100 x3; bin 256: 300 x2; bin 512: 520 x1; size=2 cut
    assert by_facet["bin"] == [("0", 3), ("256", 2)]


def test_search_facets_end_to_end(spark, built_index, oracle_index):
    """search_facets over the engine index matches a hand-computed
    bucket count on the oracle's match set."""
    from data_prep_opensearch_spark.operators.facets import search_facets
    from data_prep_opensearch_spark.operators.manifest import read_doc_stats
    from data_prep_opensearch_spark.sources.corpus import corpus_pandas

    from tests.conftest import N_DOCS

    d, _ = built_index
    q = "import needle0"
    # attribute table in ENGINE docID space: doc_stats carries the
    # natural key, the corpus carries lang
    stats = read_doc_stats(spark, d).select(
        "doc_id", "repo", "path", "commit")
    pdf = corpus_pandas(N_DOCS)[["repo", "path", "commit", "lang"]]
    attrs = stats.join(
        spark.createDataFrame(pdf), ["repo", "path", "commit"]
    ).select("doc_id", "lang")
    out = search_facets(spark, d, q, attrs, {"lang": "lang"}, size=3)
    got = [(r["value"], r["n_docs"]) for r in out.collect()]

    match = {d_ for d_, _ in oracle_index.query(q, 10**9)}
    key2lang = {
        r["doc_id"]: r["lang"] for r in attrs.collect()
    }
    counts = Counter(key2lang[m] for m in match)
    expected = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:3]
    assert got == expected


def test_stats_counts(spark):
    from data_prep_opensearch_spark.operators.facets import stats_counts

    df = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, 40, None), (4, 30, 4.0)],
        ["doc_id", "a", "b"],
    )
    rows = {r["field"]: r for r in stats_counts(df, ["a", "b"]).collect()}
    a = rows["a"]
    assert (a["n_docs"], a["min_v"], a["max_v"], a["sum_v"]) == (4, 10, 40, 100)
    assert abs(a["avg_v"] - 25.0) <= 1e-12
    assert abs(a["p50"] - 25.0) <= 1e-12   # interpolated median of 10,20,30,40
    b = rows["b"]
    assert b["n_docs"] == 3 and abs(b["p50"] - 2.0) <= 1e-12  # nulls skipped


def test_date_histogram(spark):
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from data_prep_opensearch_spark.operators.facets import date_histogram

    rows = [
        (dt.datetime(2024, 1, 1, 5), "a", 10.0),
        (dt.datetime(2024, 1, 1, 9), "a", 20.0),
        (dt.datetime(2024, 1, 2, 1), "b", 5.0),
        (dt.datetime(2024, 2, 10, 0), "a", 7.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    got = date_histogram(df, "ts", "day", by=["k"],
                         metrics={"sum_v": F.sum("v")}).collect()
    assert [(r["bucket"].date().isoformat(), r["k"], r["n_docs"], r["sum_v"])
            for r in got] == [
        ("2024-01-01", "a", 2, 30.0),
        ("2024-01-02", "b", 1, 5.0),
        ("2024-02-10", "a", 1, 7.0),
    ]
    months = date_histogram(df, "ts", "month").collect()
    assert [(r["bucket"].date().isoformat(), r["n_docs"]) for r in months] \
        == [("2024-01-01", 3), ("2024-02-01", 1)]
    with pytest.raises(ValueError, match="interval"):
        date_histogram(df, "ts", "fortnight")
