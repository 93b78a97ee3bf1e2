"""Phrase (match_phrase) queries over positional postings: engine-vs-
oracle parity on every serving tier, lifecycle (incremental add, merge,
delete) preservation of positions, code-tokenizer position semantics,
and the no-positions error path.

Scoring semantics under test (bm25._score_shard_phrase docstring): a
phrase clause contributes ``(Σ idf of its terms) * tf_term(phrase_freq,
dl)`` — Lucene's PhraseQuery weighting under BM25 — counts once toward
min_should_match, and ``-"..."`` excludes its matches (must_not).
"""

from __future__ import annotations

import os

import pytest

from data_prep_opensearch_spark.functions.tokenize import tokenize_simple
from data_prep_opensearch_spark.sources.corpus import corpus_pandas


def _real_phrases():
    """Derive phrase queries from ACTUAL adjacent tokens of the shared
    300-doc corpus, so matches are guaranteed without hand-picking."""
    pdf = corpus_pandas(300)
    toks0 = tokenize_simple(pdf.content.iloc[0])
    toks7 = tokenize_simple(pdf.content.iloc[7])
    bg = f"{toks0[3]} {toks0[4]}"
    tg = f"{toks7[10]} {toks7[11]} {toks7[12]}"
    return [
        f'"{bg}"',                       # real bigram
        f'"{tg}"',                       # real trigram
        f'"{bg}" import',                # phrase OR literal
        f'"{bg}" -return',               # phrase with term exclusion
        f'-"{bg}" {toks0[3]}',           # negated phrase, positive literal
        f'"zzz_absent {toks0[4]}"',      # unsatisfiable phrase
        f'"{toks0[4]} {toks0[3]}"',      # reversed order (likely rare/absent)
        f'"{bg}" needle0',               # phrase + needle
    ]


def test_phrase_parity_all_tiers(spark, built_index, oracle_index):
    """topk / topk_local / topk_batch must all equal the positional
    oracle — rank-identical, scores within 1e-9 (oracle docs are keyed
    by engine docIDs, so tiebreaks align exactly)."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    qs = _real_phrases()
    batched = eng.topk_batch(qs, 10).collect()
    by_q: dict[int, list] = {}
    for r in batched:
        by_q.setdefault(int(r["query_id"]), []).append(
            (r["doc_id"], r["score"])
        )
    any_hits = False
    for qi, q in enumerate(qs):
        expected = oracle_index.query(q, 10)
        any_hits = any_hits or bool(expected)
        got_b = sorted(by_q.get(qi, []), key=lambda x: (-x[1], x[0]))
        for tier, got in (
            ("topk", [(r["doc_id"], r["score"])
                      for r in eng.topk(q, 10).collect()]),
            ("local", [tuple(r) for r in eng.topk_local(
                q, 10, as_pandas=True).itertuples(index=False)]),
            ("batch", got_b),
        ):
            assert len(got) == len(expected), (tier, q, got, expected)
            for (gd, gs), (ed, es) in zip(got, expected):
                assert gd == ed, (tier, q, got, expected)
                assert abs(gs - es) <= 1e-9, (tier, q, gd, gs, es)
    assert any_hits, "at least one derived phrase must match"


def test_phrase_msm_counts_phrase_as_one_clause(spark, built_index,
                                                oracle_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    pdf = corpus_pandas(300)
    toks0 = tokenize_simple(pdf.content.iloc[0])
    bg = f"{toks0[3]} {toks0[4]}"
    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    for q, msm in [
        (f'"{bg}" import return', 2),
        (f'"{bg}" import', "all"),
        (f'"{bg}" needle0 sym*', 2),
    ]:
        expected = oracle_index.query(q, 10, min_should_match=msm)
        for tier, rows in (
            ("topk", eng.topk(q, 10, min_should_match=msm).collect()),
            ("local", eng.topk_local(q, 10, min_should_match=msm).collect()),
        ):
            got = [(r["doc_id"], r["score"]) for r in rows]
            assert len(got) == len(expected), (tier, q, msm, got, expected)
            for (gd, gs), (ed, es) in zip(got, expected):
                assert gd == ed, (tier, q, msm, got, expected)
                assert abs(gs - es) <= 1e-9, (tier, q, msm, gd, gs, es)


def test_phrase_semantic_spot_checks(spark, built_index, oracle_index):
    """Engine-independent invariants: every result of a phrase query
    contains the exact token sequence; a reversed phrase only matches
    docs that contain the reversed sequence."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    pdf = corpus_pandas(300)
    toks0 = tokenize_simple(pdf.content.iloc[0])
    a, b = toks0[3], toks0[4]
    got = [r["doc_id"] for r in eng.topk(f'"{a} {b}"', 50).collect()]
    assert got
    # reconstruct each hit's token stream through the oracle's positions
    for doc in got:
        pos_a = oracle_index.pos.get(a, {}).get(doc, [])
        pos_b = set(oracle_index.pos.get(b, {}).get(doc, []))
        assert any(p + 1 in pos_b for p in pos_a), (doc, a, b)


def test_phrase_lifecycle_add_merge_delete(spark, tmp_root):
    """Positions survive the full index lifecycle: incremental adds keep
    phrase matching across generations, merge compacts without changing
    results, apply_deletes removes a phrase hit."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.incremental import (
        add_documents,
        delete_documents,
    )
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.operators.manifest import read_doc_stats
    from data_prep_opensearch_spark.operators.segment_merge import merge_segments

    texts_a = [
        "alpha beta gamma delta",
        "beta gamma alpha",
        "unrelated words only here",
    ]
    texts_b = [
        "zeta alpha beta gamma",   # new gen doc matching "alpha beta"
        "gamma beta alpha zeta",
    ]
    idx = os.path.join(tmp_root, "idx_phrase_lifecycle")
    src_a = spark.createDataFrame(
        [("r", f"a{i}", "c", "py", t) for i, t in enumerate(texts_a)],
        ["repo", "path", "commit", "lang", "content"],
    )
    build_index(spark, src_a, idx, n_shards=2, n_groups=1)
    src_b = spark.createDataFrame(
        [("r", f"b{i}", "c", "py", t) for i, t in enumerate(texts_b)],
        ["repo", "path", "commit", "lang", "content"],
    )
    add_documents(spark, idx, src_b)

    def hits(eng):
        stats = read_doc_stats(spark, idx).toPandas()
        id2p = dict(zip(stats.doc_id, stats.path))
        return sorted(
            id2p[r["doc_id"]]
            for r in eng.topk('"alpha beta" "beta gamma"', 10).collect()
        )

    eng = BM25Engine(spark, idx, cache=False)
    got = hits(eng)
    assert "a0" in got and "b0" in got and "a2" not in got
    # a1 has both "beta gamma" (0,1) and ... "alpha" at 2: no "alpha beta"
    assert "a1" in got  # matches via "beta gamma" clause (OR semantics)

    merge_segments(spark, idx)
    eng2 = BM25Engine(spark, idx, cache=False)
    assert hits(eng2) == got, "merge must not change phrase results"

    # delete the cross-generation phrase hit and vacuum
    stats = read_doc_stats(spark, idx).toPandas()
    victim = int(stats[stats.path == "b0"].doc_id.iloc[0])
    delete_documents(
        spark, idx, spark.createDataFrame([(victim,)], ["doc_id"])
    )
    merge_segments(spark, idx, apply_deletes=True)
    eng3 = BM25Engine(spark, idx, cache=False)
    got3 = hits(eng3)
    assert "b0" not in got3 and "a0" in got3


def test_phrase_code_tokenizer_positions(spark, tmp_root):
    """'code' tokenizer: identifiers are positions; sub-tokens share
    their parent's position. A whole-identifier phrase matches adjacent
    identifiers; a phrase of one identifier's sub-tokens does NOT match
    (they're at the same position, not consecutive)."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.operators.manifest import read_doc_stats

    texts = [
        "parse_json loadData other",
        "loadData parse_json",
        "parsejson somewhere else",
    ]
    idx = os.path.join(tmp_root, "idx_phrase_code")
    src = spark.createDataFrame(
        [("r", f"d{i}", "c", "py", t) for i, t in enumerate(texts)],
        ["repo", "path", "commit", "lang", "content"],
    )
    build_index(spark, src, idx, n_shards=2, n_groups=1, tokenizer="code")
    eng = BM25Engine(spark, idx, cache=False)
    stats = read_doc_stats(spark, idx).toPandas()
    id2p = dict(zip(stats.doc_id, stats.path))

    got = sorted(
        id2p[r["doc_id"]]
        for r in eng.topk('"parse_json loadData"', 10).collect()
    )
    assert got == ["d0"]
    # sub-tokens of ONE identifier sit at one position: no phrase match
    assert eng.topk('"parse json"', 10).count() == 0
    # sub-token across identifiers: 'json loaddata'? json@0, loaddata@1
    got2 = sorted(
        id2p[r["doc_id"]]
        for r in eng.topk('"json loadData"', 10).collect()
    )
    assert got2 == ["d0"]


def test_phrase_requires_positions(spark, tmp_root):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.index_build import build_index

    idx = os.path.join(tmp_root, "idx_nopos")
    src = spark.createDataFrame(
        [("r", "d0", "c", "py", "alpha beta gamma")],
        ["repo", "path", "commit", "lang", "content"],
    )
    meta = build_index(spark, src, idx, n_shards=2, n_groups=1,
                       positions=False)
    assert meta["positions"] is False
    eng = BM25Engine(spark, idx, cache=False)
    # non-phrase queries work fine on a positionless index
    assert eng.topk("alpha", 10).count() == 1
    with pytest.raises(ValueError, match="positions"):
        eng.topk('"alpha beta"', 10).count()
    with pytest.raises(ValueError, match="positions"):
        eng.topk_local('"alpha beta"', 10)
