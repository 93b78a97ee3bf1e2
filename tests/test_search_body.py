"""Search-body features (filter context / sort / function_score) vs the
brute-force OracleIndex."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

QUERY = "merge batch import"


@pytest.fixture(scope="module")
def engine(spark, built_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    return BM25Engine(spark, d, cache=True)


@pytest.fixture(scope="module")
def attrs(spark, oracle_index):
    """Deterministic attributes keyed by ENGINE doc_id: the doc's
    tokenized length and a 3-way bucket."""
    rows = [(d, int(n), int(d) % 3) for d, n in
            sorted(oracle_index.doclen.items())]
    return spark.createDataFrame(rows, "doc_id long, dlen long, bucket int")


@pytest.fixture(scope="module")
def full_scores(oracle_index):
    """doc_id -> score for every matching doc."""
    return dict(oracle_index.query(QUERY, k=10 ** 9))


def test_match_scores_is_full_emission(engine, full_scores):
    got = {r["doc_id"]: r["score"]
           for r in engine.match_scores(QUERY).collect()}
    assert set(got) == set(full_scores)
    for d, s in got.items():
        assert s == pytest.approx(full_scores[d], rel=1e-9)


def test_filtered_topk(engine, attrs, oracle_index, full_scores):
    from data_prep_opensearch_spark.operators.search_body import filtered_topk

    exp = sorted(
        ((d, s) for d, s in full_scores.items()
         if d % 3 == 1 and oracle_index.doclen[d] >= 50),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = filtered_topk(
        engine, QUERY, attrs,
        (F.col("bucket") == 1) & (F.col("dlen") >= 50), k=10,
    ).collect()
    assert [(r["doc_id"], pytest.approx(r["score"], rel=1e-9))
            for r in got] == exp
    # filter context must NOT change the scores vs the unfiltered set
    for r in got:
        assert r["score"] == pytest.approx(full_scores[r["doc_id"]], rel=1e-9)


def test_sorted_topk(engine, attrs, oracle_index, full_scores):
    from data_prep_opensearch_spark.operators.search_body import sorted_topk

    exp = sorted(
        ((d, s, oracle_index.doclen[d]) for d, s in full_scores.items()),
        key=lambda x: (-x[2], -x[1], x[0]),
    )[:7]
    got = sorted_topk(engine, QUERY, attrs,
                      sort=[("dlen", False), ("score", False)], k=7).collect()
    assert [(r["doc_id"], r["dlen"]) for r in got] == \
        [(d, n) for d, _, n in exp]
    # ascending variant reverses the field order
    exp_asc = sorted(
        ((d, s, oracle_index.doclen[d]) for d, s in full_scores.items()),
        key=lambda x: (x[2], -x[1], x[0]),
    )[:7]
    got_asc = sorted_topk(engine, QUERY, attrs,
                          sort=[("dlen", True), ("score", False)],
                          k=7).collect()
    assert [(r["doc_id"], r["dlen"]) for r in got_asc] == \
        [(d, n) for d, _, n in exp_asc]


@pytest.mark.parametrize("mode,combine", [
    ("multiply", lambda s, v: s * v),
    ("sum", lambda s, v: s + v),
    ("replace", lambda s, v: v),
    ("max", max),
    ("min", min),
    ("avg", lambda s, v: (s + v) / 2.0),
])
def test_function_score_modes(engine, attrs, oracle_index, full_scores,
                              mode, combine):
    from data_prep_opensearch_spark.operators.search_body import (
        function_score_topk,
    )

    func = {d: math.log1p(oracle_index.doclen[d]) for d in full_scores}
    exp = sorted(
        ((d, combine(s, func[d])) for d, s in full_scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = function_score_topk(
        engine, QUERY, attrs, F.log1p(F.col("dlen")), k=10, boost_mode=mode,
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (d, ns) in zip(got, exp):
        assert r["new_score"] == pytest.approx(ns, rel=1e-9)
        assert r["func_value"] == pytest.approx(func[d], rel=1e-9)
        assert r["score"] == pytest.approx(full_scores[d], rel=1e-9)


def test_function_score_bad_mode(engine, attrs):
    from data_prep_opensearch_spark.operators.search_body import (
        function_score_topk,
    )

    with pytest.raises(ValueError):
        function_score_topk(engine, QUERY, attrs, F.lit(1.0),
                            boost_mode="nope")


def test_search_body_empty_query(engine, attrs):
    from data_prep_opensearch_spark.operators.search_body import (
        filtered_topk,
        function_score_topk,
        sorted_topk,
    )

    assert filtered_topk(engine, "zzznope", attrs, F.lit(True)).count() == 0
    assert sorted_topk(engine, "zzznope", attrs,
                       sort=[("dlen", False)]).count() == 0
    assert function_score_topk(engine, "zzznope", attrs,
                               F.lit(1.0)).count() == 0


def test_match_scores_respects_msm(engine, oracle_index):
    full = dict(oracle_index.query(QUERY, k=10 ** 9, min_should_match=2))
    got = {r["doc_id"]: r["score"]
           for r in engine.match_scores(QUERY, min_should_match=2).collect()}
    assert set(got) == set(full)
    for d, s in got.items():
        assert s == pytest.approx(full[d], rel=1e-9)
