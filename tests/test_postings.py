"""Posting-list codec: VByte/delta round-trips (property-based, FIXTURES.md
§F4), block-max metadata, and run merging."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_prep_opensearch_spark.operators.postings import (
    BLOCK,
    decode_posting_list,
    encode_posting_list,
    merge_posting_runs,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=2000))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (vbyte_decode(vbyte_encode(arr)) == arr).all()


@pytest.mark.parametrize("size", [0, 1, 2, 127, 128, 129, 10_000])
def test_posting_roundtrip_sizes(size):
    rng = np.random.default_rng(size + 7)
    gaps = rng.integers(1, 2**40, size=size).astype(np.int64) if size else np.zeros(0, np.int64)
    docs = np.cumsum(gaps)
    tfs = rng.integers(1, 1000, size=size).astype(np.int64)
    dls = rng.integers(20, 4000, size=size).astype(np.int64)
    db, tb, blk = encode_posting_list(docs, tfs, dls, base=0)
    d2, t2 = decode_posting_list(db, tb, base=0)
    assert (d2 == docs).all() and (t2 == tfs).all()
    nblocks = (size + BLOCK - 1) // BLOCK
    assert blk.first.shape[0] == nblocks
    if size:
        assert blk.first[0] == docs[0] and blk.last[-1] == docs[-1]


def test_block_metadata_boundaries():
    n = BLOCK * 2 + 5
    docs = np.arange(100, 100 + n, dtype=np.int64)
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(2000, 2000 - n, -1, dtype=np.int64)
    _, _, blk = encode_posting_list(docs, tfs, dls)
    # block 0: docs[0..127]; block 1: docs[128..255]; block 2: the tail
    assert blk.max_tf.tolist() == [BLOCK, 2 * BLOCK, n]
    assert blk.min_dl.tolist() == [2000 - BLOCK + 1, 2000 - 2 * BLOCK + 1, 2000 - n + 1]
    assert blk.first.tolist() == [100, 100 + BLOCK, 100 + 2 * BLOCK]
    assert blk.last.tolist() == [100 + BLOCK - 1, 100 + 2 * BLOCK - 1, 100 + n - 1]


def test_base_anchoring():
    docs = np.array([1 << 30, (1 << 30) + 3], dtype=np.int64)
    tfs = np.array([1, 2], dtype=np.int64)
    dls = np.array([10, 10], dtype=np.int64)
    db_anchored, _, _ = encode_posting_list(docs, tfs, dls, base=1 << 30)
    db_raw, _, _ = encode_posting_list(docs, tfs, dls, base=0)
    assert len(db_anchored) < len(db_raw)
    d2, _ = decode_posting_list(db_anchored, vbyte_encode(tfs.astype(np.uint64)), base=1 << 30)
    assert (d2 == docs).all()


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        encode_posting_list(
            np.array([5, 4], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([10, 10], dtype=np.int64),
        )


def test_merge_disjoint_runs_concat():
    a = (np.array([1, 5], dtype=np.int64), np.array([2, 3], dtype=np.int64))
    b = (np.array([7, 9], dtype=np.int64), np.array([1, 1], dtype=np.int64))
    docs, tfs = merge_posting_runs([a, b])
    assert docs.tolist() == [1, 5, 7, 9]
    assert tfs.tolist() == [2, 3, 1, 1]


def test_merge_overlap_last_wins():
    a = (np.array([1, 5, 9], dtype=np.int64), np.array([2, 3, 4], dtype=np.int64))
    b = (np.array([5, 7], dtype=np.int64), np.array([10, 1], dtype=np.int64))
    docs, tfs = merge_posting_runs([a, b])
    assert docs.tolist() == [1, 5, 7, 9]
    assert tfs.tolist() == [2, 10, 1, 4]  # docID 5 takes run b's tf


# ---------------------------------------------------------------------------
# Positional postings (phrase-query support)
# ---------------------------------------------------------------------------

from data_prep_opensearch_spark.operators.postings import (  # noqa: E402
    decode_positions,
    encode_positions,
    gather_token_runs,
    merge_posting_runs_with_pos,
)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**20), min_size=1, max_size=50),
        max_size=100,
    )
)
@settings(max_examples=150, deadline=None)
def test_positions_roundtrip(per_posting):
    # positions sorted ascending within each posting (dups allowed: the
    # code tokenizer emits sub-tokens at their parent's position)
    runs = [sorted(p) for p in per_posting]
    tfs = np.array([len(r) for r in runs], dtype=np.int64)
    pos = np.array([x for r in runs for x in r], dtype=np.int64)
    buf = encode_positions(pos, tfs)
    out = decode_positions(buf, tfs)
    assert (out == pos).all()


def test_positions_unsorted_within_posting_rejected():
    with pytest.raises(ValueError):
        encode_positions(
            np.array([5, 3], dtype=np.int64), np.array([2], dtype=np.int64)
        )


def test_positions_empty():
    assert encode_positions(np.zeros(0, np.int64), np.zeros(0, np.int64)) == b""
    assert decode_positions(b"", np.zeros(0, np.int64)).size == 0


def test_gather_token_runs_permutation():
    # postings with tfs [2,1,3]; reorder to [2,0,1]
    tfs = np.array([2, 1, 3], dtype=np.int64)
    idx = np.array([2, 0, 1], dtype=np.int64)
    g = gather_token_runs(idx, tfs)
    assert g.tolist() == [3, 4, 5, 0, 1, 2]


def test_merge_with_pos_last_wins():
    a = (
        np.array([1, 5], dtype=np.int64),
        np.array([2, 1], dtype=np.int64),
        np.array([0, 7, 3], dtype=np.int64),  # doc1: [0,7]; doc5: [3]
    )
    b = (
        np.array([5], dtype=np.int64),
        np.array([2], dtype=np.int64),
        np.array([4, 9], dtype=np.int64),  # doc5: [4,9] (wins)
    )
    docs, tfs, pos = merge_posting_runs_with_pos([a, b])
    assert docs.tolist() == [1, 5]
    assert tfs.tolist() == [2, 2]
    assert pos.tolist() == [0, 7, 4, 9]
