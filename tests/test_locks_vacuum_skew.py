"""Round-2 hardening gates: writer lock (I6), doc_stats vacuum score
parity after deletes, hot-shingle skew bound, latest-version pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_prep_opensearch_spark.operators.bm25 import BM25Engine
from data_prep_opensearch_spark.operators.incremental import (
    add_documents,
    delete_documents,
    superseded_doc_ids,
)
from data_prep_opensearch_spark.operators.index_build import build_index
from data_prep_opensearch_spark.operators.locks import IndexLockHeld, index_lock
from data_prep_opensearch_spark.operators.manifest import read_doc_stats
from data_prep_opensearch_spark.operators.segment_merge import merge_segments
from data_prep_opensearch_spark.sources.corpus import corpus_df


def test_index_lock_exclusive_and_stale_takeover(tmp_root):
    d = os.path.join(tmp_root, "lock_idx")
    with index_lock(d, purpose="outer"):
        with pytest.raises(IndexLockHeld):
            with index_lock(d, purpose="inner"):
                pass
    # released -> acquirable again
    with index_lock(d):
        pass
    # stale lock (dead pid): taken over silently
    os.makedirs(os.path.join(d, ".lock"), exist_ok=True)
    with open(os.path.join(d, ".lock", "status.json"), "w") as f:
        f.write('{"pid": 999999999, "purpose": "crashed"}')
    with index_lock(d):
        pass


def test_stale_takeover_never_touches_live_lock_path(tmp_root, monkeypatch):
    """The takeover claim must be an atomic rename to a PRIVATE path:
    whatever a claimant deletes, it is never ``.lock`` itself — so a
    concurrent winner's freshly re-created lock cannot be destroyed
    (the old rmtree-then-mkdir takeover had exactly that window)."""
    import shutil as _shutil

    from data_prep_opensearch_spark.operators import locks as locks_mod

    d = os.path.join(tmp_root, "lock_idx_claim")
    lock_dir = os.path.join(d, ".lock")
    os.makedirs(lock_dir)
    with open(os.path.join(lock_dir, "status.json"), "w") as f:
        f.write('{"pid": 999999999, "purpose": "crashed"}')

    removed = []
    real_rmtree = _shutil.rmtree

    def spy_rmtree(path, *a, **kw):
        removed.append(path)
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(locks_mod.shutil, "rmtree", spy_rmtree)
    with index_lock(d):
        pass
    # one removal for the claimed (renamed) stale dir, one for release
    claim_removals = [p for p in removed if ".stale-" in p]
    assert claim_removals, "stale takeover did not go through a rename-claim"
    # the live lock path is only ever removed by the final release
    assert removed[-1] == lock_dir
    assert lock_dir not in removed[:-1]


def test_lost_rename_claim_never_steals_new_holder(tmp_root, monkeypatch):
    """A claimant whose rename loses the race (lock already claimed and
    re-created by a live winner) must raise IndexLockHeld and leave the
    winner's lock intact."""
    from data_prep_opensearch_spark.operators import locks as locks_mod

    d = os.path.join(tmp_root, "lock_idx_lost")
    lock_dir = os.path.join(d, ".lock")
    os.makedirs(lock_dir)
    with open(os.path.join(lock_dir, "status.json"), "w") as f:
        f.write('{"pid": 999999999, "purpose": "crashed"}')

    real_rename = os.rename

    def losing_rename(src, dst):
        # simulate the interleave: the other claimant renames the stale
        # dir and re-creates a LIVE lock before our rename lands
        real_rename(src, dst + ".other-winner")
        os.makedirs(lock_dir)
        with open(os.path.join(lock_dir, "status.json"), "w") as f:
            json_s = '{"pid": %d, "purpose": "winner"}' % os.getpid()
            f.write(json_s)
        raise OSError("rename lost")

    monkeypatch.setattr(locks_mod.os, "rename", losing_rename)
    with pytest.raises(IndexLockHeld):
        with index_lock(d):
            pass
    # the winner's lock survives untouched
    assert os.path.isdir(lock_dir)
    assert os.path.exists(os.path.join(lock_dir, "status.json"))


def test_build_index_refuses_concurrent_writer(spark, tmp_root):
    d = os.path.join(tmp_root, "lock_idx2")
    with index_lock(d, purpose="other_writer"):
        with pytest.raises(IndexLockHeld):
            build_index(spark, corpus_df(spark, 20), d, n_shards=2, n_groups=1)


def _topk_by_key(spark, index_dir, query, k=10, **eng_kw):
    eng = BM25Engine(spark, index_dir, cache=False, **eng_kw)
    topk = eng.topk(query, k, scorer="wand")
    stats = read_doc_stats(spark, index_dir).select(
        F.col("doc_id").alias("eid"), "repo", "path", "commit"
    )
    rows = topk.join(stats, topk["doc_id"] == stats["eid"]).collect()
    return sorted(
        ((r["repo"], r["path"], r["commit"]), round(r["score"], 9)) for r in rows
    )


def test_vacuum_restores_fresh_build_scores(spark, tmp_root):
    """Delete + merge(apply_deletes) must yield the same BM25 SCORES as a
    fresh build of the surviving docs (N, avgdl, df all vacuumed) — the
    round-1 drift was retrieval-exact but score-stale. docIDs differ
    between the two indexes (survivors keep theirs; a fresh build packs
    densely), so parity is checked per document KEY."""
    full = corpus_df(spark, 150)
    victims_pred = F.xxhash64("repo", "path", "commit") % 4 == 0
    survivors = full.filter(~victims_pred)

    idx = os.path.join(tmp_root, "vac_idx")
    build_index(spark, full, idx, n_shards=4, n_groups=1)
    # tombstone the victims by looking up their docIDs
    stats = read_doc_stats(spark, idx)
    vic_keys = full.filter(victims_pred).select("repo", "path", "commit")
    vic_ids = stats.join(vic_keys, ["repo", "path", "commit"]).select("doc_id")
    n_vic = vic_ids.count()
    assert n_vic > 0
    delete_documents(spark, idx, vic_ids)
    merge_segments(spark, idx, apply_deletes=True)

    fresh = os.path.join(tmp_root, "vac_fresh")
    meta_fresh = build_index(spark, survivors, fresh, n_shards=4, n_groups=1)

    import json

    with open(os.path.join(idx, "meta.json")) as f:
        meta_vac = json.load(f)
    assert meta_vac["n_docs"] == meta_fresh["n_docs"]
    assert abs(meta_vac["avgdl"] - meta_fresh["avgdl"]) < 1e-9

    for q in ("import def", "needle0", "return batch sort"):
        a = _topk_by_key(spark, idx, q)
        b = _topk_by_key(spark, fresh, q)
        assert a == b, (q, a, b)


def test_add_after_vacuum_never_reuses_ids(spark, tmp_root):
    """Max-based id allocation: after a vacuum punches holes, new docs must
    get fresh ids above the per-shard max, not a survivor's id."""
    full = corpus_df(spark, 120)
    base = full.filter(F.xxhash64("repo", "path", "commit") % 3 != 0)
    delta = full.filter(F.xxhash64("repo", "path", "commit") % 3 == 0)
    idx = os.path.join(tmp_root, "vac_add_idx")
    build_index(spark, base, idx, n_shards=2, n_groups=1)
    stats = read_doc_stats(spark, idx)
    # materialize victim ids NOW: the vacuum rewrites doc_stats, so a lazy
    # plan over the pre-vacuum files cannot be re-evaluated afterwards
    vic = {
        r["doc_id"]
        for r in stats.orderBy("doc_id").limit(10).select("doc_id").collect()
    }
    vic_ids = spark.createDataFrame([(i,) for i in sorted(vic)], ["doc_id"])
    old_ids = {r["doc_id"] for r in read_doc_stats(spark, idx).select("doc_id").collect()}
    delete_documents(spark, idx, vic_ids)
    merge_segments(spark, idx, apply_deletes=True)
    add_documents(spark, idx, delta)
    new_stats = read_doc_stats(spark, idx)
    ids = [r["doc_id"] for r in new_stats.select("doc_id").collect()]
    assert len(ids) == len(set(ids)), "docID collision after vacuum+add"
    assert not (set(ids) & vic), "vacuumed slot was reused"
    assert old_ids - vic <= set(ids), "survivors must keep their ids"


def test_ngram_jaccard_hot_shingle_bound(spark):
    """Skewed corpus: one shingle in 50% of docs. With the df cap the
    candidate pair count stays bounded by the near-dup structure instead
    of exploding quadratically with the hot shingle."""
    from data_prep_opensearch_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_rows,
    )

    n = 200
    rows = []
    for i in range(n):
        # unique tail keeps docs distinct; every even doc shares the same
        # leading 3-token shingle ("common header line")
        head = "common header line " if i % 2 == 0 else f"head{i} h{i} l{i} "
        rows.append((i, head + f"tail{i} t{i} u{i} v{i}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # uncapped: the hot shingle alone creates 100*99/2 = 4950 candidates
    sh = shingle_rows(df)
    hot_df = sh.groupBy("shingle").agg(F.count("*").alias("c")).agg(F.max("c")).collect()[0][0]
    assert hot_df == n // 2

    capped = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_df=10)
    # with the cap, docs share no surviving shingles -> zero pairs
    assert capped.count() == 0

    uncapped = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_df=None)
    assert uncapped.count() == (n // 2) * (n // 2 - 1) // 2


def test_minhash_lsh_hot_bucket_bound(spark):
    """Degenerate LSH bucket: 50% of docs are one boilerplate template, so
    every band funnels them into ONE (band, band_hash) bucket. With the
    bucket cap the self-join fan-out stays bounded (here: zero pairs —
    the hot bucket is suppressed, unique docs share no bucket); uncapped
    it is the full O(m²) blow-up the guard exists to kill."""
    from data_prep_opensearch_spark.operators.dedup import minhash_lsh_pairs

    n = 100
    rows = []
    for i in range(n):
        text = (
            "common boilerplate header license apache version two"
            if i % 2 == 0
            else f"unique{i} body{i} text{i} alpha{i} beta{i} gamma{i}"
        )
        rows.append((i, text))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = minhash_lsh_pairs(df, max_bucket_size=10)
    assert capped.count() == 0

    uncapped = minhash_lsh_pairs(df, max_bucket_size=None)
    m = n // 2
    assert uncapped.count() == m * (m - 1) // 2


def test_embedding_near_dup_hot_bucket_bound(spark):
    """Degenerate embedding bucket: 50% of vectors are (near-)constant —
    one sign pattern holds half the table. The bucket cap suppresses it
    before the self-join; uncapped, the same operator pays O(m²)."""
    import numpy as np

    from data_prep_opensearch_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng_base = np.linspace(-1.0, 1.0, 64)
    rows = []
    for i in range(100):
        if i % 2 == 0:
            v = rng_base  # identical vector -> identical bucket, cos = 1
        else:
            v = np.cos(rng_base * (i + 3)) + 0.01 * i  # spread-out buckets
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    capped = embedding_near_dup_pairs(df, threshold=0.999, max_bucket_size=10)
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    hot_ids = {i for i in range(100) if i % 2 == 0}
    assert not any(a in hot_ids and b in hot_ids for a, b in capped_pairs)

    uncapped = embedding_near_dup_pairs(df, threshold=0.999, max_bucket_size=None)
    m = 50
    assert uncapped.count() >= m * (m - 1) // 2


def test_latest_version_pruning(spark, tmp_root):
    """superseded_doc_ids: older versions of a re-sent (repo, path) are
    masked; the latest generation's version survives."""
    full = corpus_df(spark, 60)
    idx = os.path.join(tmp_root, "latest_idx")
    build_index(spark, full, idx, n_shards=2, n_groups=1)
    # re-send every 4th doc with changed content => new commit, same path
    delta = (
        full.filter(F.xxhash64("repo", "path") % 4 == 0)
        .withColumn("content", F.concat(F.col("content"), F.lit(" changed")))
        .withColumn("commit", F.sha2(F.col("content"), 256).substr(1, 40))
    )
    n_delta = delta.count()
    assert n_delta > 0
    add_documents(spark, idx, delta)
    sup = superseded_doc_ids(spark, idx)
    assert sup.count() == n_delta
    # superseded ids are exactly the OLD-commit versions of re-sent keys
    # (note: ids are not ordered across versions — the new commit hashes
    # to a different shard, so identify old versions by commit)
    stats = read_doc_stats(spark, idx)
    old_versions = (
        stats.join(
            delta.select(
                "repo", "path", F.col("commit").alias("new_commit")
            ),
            ["repo", "path"],
        )
        .filter(F.col("commit") != F.col("new_commit"))
        .select("doc_id")
    )
    assert {r["doc_id"] for r in sup.collect()} == {
        r["doc_id"] for r in old_versions.collect()
    }