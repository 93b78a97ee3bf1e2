"""significant_terms aggregation vs a brute-force JLH recomputation."""
from __future__ import annotations

import os

import pytest

SIZE = 12
MIN_DC = 2


def _rare_query(oracle):
    """A genuinely selective term: smallest df >= 5 (ties term-asc) —
    its match set is a real subset, so significance is non-trivial."""
    return min((t for t, df in oracle.df.items()
                if df >= 5 and len(t) >= 4),
               key=lambda t: (oracle.df[t], t))


def _docs_df(spark, built_index):
    """(engine doc_id, text) for the shared index's corpus."""
    from data_prep_opensearch_spark.operators.manifest import read_doc_stats
    from data_prep_opensearch_spark.sources.corpus import corpus_pandas

    from tests.conftest import N_DOCS

    d, _ = built_index
    stats = read_doc_stats(spark, d).select(
        "doc_id", "repo", "path", "commit").collect()
    key2id = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in stats}
    pdf = corpus_pandas(N_DOCS)
    rows = [(key2id[(r.repo, r.path, r.commit)], r.content)
            for r in pdf.itertuples(index=False)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def brute_jlh(oracle, query, size, min_dc):
    matched = {d for d, _ in oracle.query(query, k=10 ** 9)}
    fg_n, bg_n = len(matched), oracle.n_docs
    out = []
    fg_counts = {}
    for d in matched:
        for t in oracle.tf[d]:
            fg_counts[t] = fg_counts.get(t, 0) + 1
    for t, fg in fg_counts.items():
        bg = oracle.df[t]
        fgp, bgp = fg / fg_n, bg / bg_n
        if fg >= min_dc and fgp > bgp:
            out.append((t, fg, bg, (fgp - bgp) * (fgp / bgp)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:size]


def test_significant_terms_parity(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.facets import significant_terms

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    docs = _docs_df(spark, built_index)
    query = _rare_query(oracle_index)
    got = significant_terms(eng, query, docs, size=SIZE,
                            min_doc_count=MIN_DC).collect()
    exp = brute_jlh(oracle_index, query, SIZE, MIN_DC)
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == \
        [(t, fg, bg) for t, fg, bg, _ in exp]
    for r, (_, _, _, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # the query term is maximally represented in its own match set
    assert got and got[0]["term"] == query


def test_significant_terms_msm_and_gates(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.facets import significant_terms

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    docs = _docs_df(spark, built_index)
    # pure-AND foreground is a strict subset -> still matches brute force
    query = _rare_query(oracle_index) + " merge"
    got = significant_terms(eng, query, docs, size=5, min_doc_count=1,
                            min_should_match="all").collect()
    matched = {d_ for d_, _ in
               oracle_index.query(query, k=10 ** 9, min_should_match=2)}
    fg_n, bg_n = len(matched), oracle_index.n_docs
    fg_counts = {}
    for dd in matched:
        for t in oracle_index.tf[dd]:
            fg_counts[t] = fg_counts.get(t, 0) + 1
    exp = sorted(
        ((t, (fg / fg_n - oracle_index.df[t] / bg_n)
          * (fg / fg_n) / (oracle_index.df[t] / bg_n))
         for t, fg in fg_counts.items()
         if fg / fg_n > oracle_index.df[t] / bg_n),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert [r["term"] for r in got] == [t for t, _ in exp]
    # an impossible min_doc_count empties the result
    few = significant_terms(eng, query, docs, size=50,
                            min_doc_count=10 ** 6)
    assert few.count() == 0


def test_significant_terms_code_tokenizer(spark, tmp_root):
    """The 'code' re-analyze branch: sub-tokens count as foreground
    terms exactly like the index's own analyzer."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.facets import significant_terms
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.operators.manifest import read_doc_stats

    texts = [
        "parseJson alpha beta", "parse_json alpha gamma",
        "loadData delta", "loadData epsilon", "unrelated words here",
        "other unrelated stuff", "more filler text", "yet more filler",
    ]
    idx = os.path.join(tmp_root, "idx_sig_code")
    src = spark.createDataFrame(
        [("r", f"d{i}", "c", "py", t) for i, t in enumerate(texts)],
        ["repo", "path", "commit", "lang", "content"],
    )
    build_index(spark, src, idx, n_shards=2, n_groups=1, tokenizer="code")
    eng = BM25Engine(spark, idx, cache=False)
    stats = read_doc_stats(spark, idx).collect()
    p2id = {r["path"]: r["doc_id"] for r in stats}
    docs = spark.createDataFrame(
        [(p2id[f"d{i}"], t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    # query 'parse' matches both parseJson and parse_json docs via
    # sub-token indexing; 'alpha' (2/2 fg vs 2/8 bg) must be significant
    got = {r["term"]: (r["fg_df"], r["bg_df"])
           for r in significant_terms(eng, "parse", docs, size=50,
                                      min_doc_count=1).collect()}
    assert got["alpha"] == (2, 2)
    assert "parse" in got and got["parse"][0] == 2
    assert "json" in got  # sub-token surfaced by the code re-analyzer
    assert "delta" not in got
