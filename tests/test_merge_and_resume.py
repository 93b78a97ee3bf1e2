"""Segment merge ≡ single-shot build; kill/resume yields the identical
index fingerprint and only re-runs incomplete groups (FIXTURES.md §F5/F6);
determinism under different parallelism (§5 plan #5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_prep_opensearch_spark.operators.bm25 import query_topk
from data_prep_opensearch_spark.operators.index_build import build_index, index_fingerprint
from data_prep_opensearch_spark.operators.manifest import read_segments
from data_prep_opensearch_spark.operators.segment_merge import merge_segments
from data_prep_opensearch_spark.sources.corpus import corpus_df

N = 220


def test_incremental_build_then_merge_equals_single_shot(spark, tmp_root):
    one = os.path.join(tmp_root, "idx_oneshot")
    inc = os.path.join(tmp_root, "idx_incremental")
    build_index(spark, corpus_df(spark, N), one, n_shards=4, n_groups=1)
    fp_one = index_fingerprint(spark, one)

    # incremental: same corpus in two halves. Build the first half, then
    # append the second half's postings as generation 1 of the SAME index
    # (docIDs assigned over the full corpus so both runs agree on ids).
    full = corpus_df(spark, N)
    half1 = full.filter(F.xxhash64("repo", "path", "commit") % 2 == 0)
    half2 = full.filter(F.xxhash64("repo", "path", "commit") % 2 != 0)
    # emulate a delta append by building each half against the full docID
    # assignment: use the internal pieces directly
    from data_prep_opensearch_spark.operators.index_build import (
        assign_doc_ids,
        encode_doclens,
        encode_segments,
        tokenize_to_postings,
    )

    docs = assign_doc_ids(full, 4).withColumn("sha256", F.sha2(F.col("content"), 256))
    docs.cache()
    os.makedirs(inc, exist_ok=True)
    for gen, pred in ((0, F.xxhash64("repo", "path", "commit") % 2 == 0),
                      (1, F.xxhash64("repo", "path", "commit") % 2 != 0)):
        part = docs.filter(pred)
        postings = tokenize_to_postings(part, "simple")
        encode_segments(postings, gen=gen).write.mode("append").parquet(
            os.path.join(inc, "segments"))
    # doclens/doc_stats/meta from the full corpus
    postings_all = tokenize_to_postings(docs, "simple")
    dlens = postings_all.groupBy("doc_id").agg(F.max("dl").alias("doclen"))
    stats = docs.select("doc_id", "shard", "repo", "path", "commit", "lang", "sha256") \
        .join(dlens, "doc_id", "left").fillna({"doclen": 0})
    stats.write.mode("overwrite").parquet(os.path.join(inc, "doc_stats"))
    encode_doclens(stats).write.mode("overwrite").parquet(os.path.join(inc, "doclens"))
    agg = stats.agg(F.count("*").alias("n"), F.avg("doclen").alias("a")).collect()[0]
    import json
    with open(os.path.join(inc, "meta.json"), "w") as f:
        json.dump({"n_docs": int(agg["n"]), "avgdl": float(agg["a"]),
                   "n_shards": 4, "shard_width": 1 << 20, "tokenizer": "simple",
                   "generations": [0, 1], "status": "complete"}, f)
    docs.unpersist()

    # two generations present before merge; logical index already equal
    assert index_fingerprint(spark, inc) == fp_one
    out = merge_segments(spark, inc, fan_in=8)
    assert len(out["generations"]) == 1
    # byte-level now: exactly one row per (term, shard), same logical fp
    assert index_fingerprint(spark, inc) == fp_one
    seg = read_segments(spark, inc)
    assert seg.groupBy("term", "shard").count().filter("count > 1").count() == 0
    # and queries agree end-to-end
    r1 = [(r["doc_id"], round(r["score"], 9)) for r in
          query_topk(spark, one, "import def", 10).collect()]
    r2 = [(r["doc_id"], round(r["score"], 9)) for r in
          query_topk(spark, inc, "import def", 10).collect()]
    assert r1 == r2


def test_kill_and_resume_identical_fp(spark, tmp_root):
    ref = os.path.join(tmp_root, "idx_ref")
    killed = os.path.join(tmp_root, "idx_killed")
    build_index(spark, corpus_df(spark, N), ref, n_shards=4, n_groups=4)
    fp_ref = index_fingerprint(spark, ref)

    out = build_index(spark, corpus_df(spark, N), killed, n_shards=4,
                      n_groups=4, stop_after_groups=2)
    assert out["status"] == "interrupted"
    assert not os.path.exists(os.path.join(killed, "meta.json"))
    lineage = spark.read.parquet(os.path.join(killed, "lineage"))
    assert lineage.filter("status = 'complete'").count() == 2

    meta = build_index(spark, corpus_df(spark, N), killed, n_shards=4,
                       n_groups=4, resume=True)
    assert meta["status"] == "complete"
    # resume added exactly the 2 missing groups — no group re-ran
    lineage = spark.read.parquet(os.path.join(killed, "lineage"))
    assert lineage.count() == 4
    assert lineage.select("group_id").distinct().count() == 4
    assert index_fingerprint(spark, killed) == fp_ref


def test_determinism_across_parallelism(spark, tmp_root):
    a = os.path.join(tmp_root, "idx_par2")
    b = os.path.join(tmp_root, "idx_par16")
    build_index(spark, corpus_df(spark, N, partitions=2), a, n_shards=4, n_groups=1)
    build_index(spark, corpus_df(spark, N, partitions=16), b, n_shards=4, n_groups=2)
    assert index_fingerprint(spark, a) == index_fingerprint(spark, b)


def test_reader_survives_merge_gc_grace(spark, tmp_root, monkeypatch):
    """Reader-visibility GC delay: with DPOSS_GC_GRACE_SEC set, a merge
    RETIRES the consumed dirs (manifest ledger) instead of deleting
    them, so a reader that resolved the PREVIOUS manifest completes its
    scan; a later drain past the grace deletes them for real."""
    from data_prep_opensearch_spark.operators import manifest as mf
    from data_prep_opensearch_spark.operators.incremental import add_documents

    idx = os.path.join(tmp_root, "idx_gc_grace")
    full = corpus_df(spark, N)
    base = full.filter(F.xxhash64("repo", "path", "commit") % 2 == 0)
    delta = full.filter(F.xxhash64("repo", "path", "commit") % 2 != 0)
    build_index(spark, base, idx, n_shards=4, n_groups=1)
    add_documents(spark, idx, delta)

    m_old = mf.load_manifest(idx)
    old_seg_rels = [e["path"] for e in m_old["segments"]]
    assert len(old_seg_rels) >= 2  # base + delta generation dirs
    # a reader bound to the CURRENT (soon to be previous) manifest
    reader = mf.read_segments(spark, idx)
    n_before = reader.count()

    monkeypatch.setenv(mf.GC_GRACE_ENV, "3600")
    merge_segments(spark, idx, fan_in=8)

    m_new = mf.load_manifest(idx)
    live = {e["path"] for e in m_new["segments"]}
    retired = {e["path"] for e in m_new.get("retired", [])}
    assert set(old_seg_rels) & retired, "consumed dirs must be ledgered"
    assert not (set(old_seg_rels) & live)
    # the reader's dirs still exist: its in-flight scan completes
    for rel in old_seg_rels:
        assert os.path.exists(os.path.join(idx, rel)), rel
    assert reader.count() == n_before
    assert [r for r in reader.limit(5).collect()]

    # nothing ages out inside the grace window
    assert mf.gc_retired(idx) == []
    # force the grace past: dirs are deleted and the ledger drains
    drained = mf.gc_retired(idx, grace_sec=0)
    assert set(drained) >= set(old_seg_rels) - live
    for rel in set(old_seg_rels) - live:
        assert not os.path.exists(os.path.join(idx, rel)), rel
    assert mf.load_manifest(idx).get("retired", []) == []


def test_gc_ledger_accumulates_across_merges(spark, tmp_root, monkeypatch):
    """Under a nonzero grace, SUCCESSIVE merges each append their consumed
    dirs to the retired ledger (nothing is silently dropped or deleted
    early), and one drain past the grace clears the whole backlog. Also
    pins the live-set cross-check: a ledger entry that (by future name
    reuse) points at a LIVE rel is never deleted — it is unledgered with
    a warning."""
    import warnings

    from data_prep_opensearch_spark.operators import manifest as mf
    from data_prep_opensearch_spark.operators.incremental import add_documents

    idx = os.path.join(tmp_root, "idx_gc_ledger")
    full = corpus_df(spark, N)
    base = full.filter(F.xxhash64("repo", "path", "commit") % 3 == 0)
    d1 = full.filter(F.xxhash64("repo", "path", "commit") % 3 == 1)
    d2 = full.filter(F.xxhash64("repo", "path", "commit") % 3 == 2)
    build_index(spark, base, idx, n_shards=4, n_groups=1)
    monkeypatch.setenv(mf.GC_GRACE_ENV, "3600")

    add_documents(spark, idx, d1)
    merge_segments(spark, idx, fan_in=8)
    led1 = {e["path"] for e in mf.load_manifest(idx).get("retired", [])}
    assert led1, "first merge must ledger its consumed dirs"

    add_documents(spark, idx, d2)
    merge_segments(spark, idx, fan_in=8)
    led2 = {e["path"] for e in mf.load_manifest(idx).get("retired", [])}
    assert led1 <= led2, "earlier ledger entries must survive later merges"
    assert len(led2) > len(led1), "second merge must append to the ledger"
    for rel in led2:  # grace not yet past: every ledgered dir still exists
        assert os.path.exists(os.path.join(idx, rel)), rel

    # live-set cross-check: ledger a rel the manifest still lists as live
    live_rel = mf.load_manifest(idx)["segments"][0]["path"]

    def _poison(m):
        m.setdefault("retired", []).append({"path": live_rel, "ts": 0.0})
    mf.update_manifest(idx, _poison)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        drained = mf.gc_retired(idx, grace_sec=0)
    assert any("WITHOUT deleting" in str(x.message) for x in w)
    assert live_rel not in drained
    assert os.path.exists(os.path.join(idx, live_rel))
    assert set(drained) == led2
    for rel in led2:
        assert not os.path.exists(os.path.join(idx, rel)), rel
    assert mf.load_manifest(idx).get("retired", []) == []
