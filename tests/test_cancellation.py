"""Cooperative cancellation (SURVEY.md §2.10 I5): a cancel request stops
writers at the next safe point, leaves a RESUMABLE index, consumes the
flag, and the resumed run converges to the crash-free result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_prep_opensearch_spark.operators.cancellation import (
    cancel_requested,
    clear_cancel,
    request_cancel,
)
from data_prep_opensearch_spark.operators.incremental import add_documents
from data_prep_opensearch_spark.operators.index_build import (
    build_index,
    index_fingerprint,
)
from data_prep_opensearch_spark.operators.segment_merge import merge_segments
from data_prep_opensearch_spark.sources.corpus import corpus_df


def test_cancel_mid_build_then_resume_identical(spark, tmp_root):
    src = corpus_df(spark, 200)
    idx = os.path.join(tmp_root, "cancel_idx")
    idx_ref = os.path.join(tmp_root, "cancel_idx_ref")

    # simulate a long build stopped after 1 of 3 groups (the existing
    # kill simulation), then a cancel request against the paused index
    out = build_index(spark, src, idx, n_shards=3, n_groups=3,
                      stop_after_groups=1)
    assert out["status"] == "interrupted"

    request_cancel(idx, reason="test")
    out2 = build_index(spark, src, idx, n_shards=3, n_groups=3, resume=True)
    assert out2["status"] == "interrupted" and out2.get("cancelled")
    # honored => flag consumed; no additional group ran
    assert not cancel_requested(idx)
    assert out2["groups_done"] == out["groups_done"]

    # resume completes and matches a crash-free build exactly
    meta = build_index(spark, src, idx, n_shards=3, n_groups=3, resume=True)
    assert meta["status"] == "complete" and meta["n_docs"] == 200
    build_index(spark, src, idx_ref, n_shards=3, n_groups=3)
    assert index_fingerprint(spark, idx) == index_fingerprint(spark, idx_ref)


def test_cancel_blocks_add_and_merge(spark, tmp_root):
    full = corpus_df(spark, 120)
    base = full.filter(F.xxhash64("repo", "path", "commit") % 3 != 0)
    delta = full.filter(F.xxhash64("repo", "path", "commit") % 3 == 0)
    idx = os.path.join(tmp_root, "cancel_idx2")
    build_index(spark, base, idx, n_shards=2, n_groups=1)

    request_cancel(idx)
    out = add_documents(spark, idx, delta)
    assert out.get("cancelled") and out["docs_added"] == 0
    assert not cancel_requested(idx)

    # the add now goes through; a cancelled merge leaves a valid
    # multi-generation index that a later merge consolidates
    added = add_documents(spark, idx, delta)
    assert added["docs_added"] == delta.count()
    fp = index_fingerprint(spark, idx)

    request_cancel(idx)
    m = merge_segments(spark, idx)
    assert m.get("cancelled") and m["passes"] == 0
    assert index_fingerprint(spark, idx) == fp  # untouched

    m2 = merge_segments(spark, idx)
    assert "cancelled" not in m2 and len(m2["generations"]) == 1
    assert index_fingerprint(spark, idx) == fp  # logical index preserved


def test_clear_cancel_is_idempotent(tmp_root):
    d = os.path.join(tmp_root, "cancel_flagdir")
    clear_cancel(d)  # no flag, no error
    request_cancel(d)
    request_cancel(d)  # idempotent
    assert cancel_requested(d)
    clear_cancel(d)
    assert not cancel_requested(d)
