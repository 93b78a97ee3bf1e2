"""Log-structured segment merge (SURVEY.md §7.1 M3).

Incremental builds append new generations of (term, shard) posting runs;
this job consolidates them k-way per pass until one generation remains —
the tree-reduce shape of the reference's chunk-summary fan-in
(stages/enricher/vision.py:469-512), applied to postings.

Merging a (term, shard) group is a concat-of-sorted-runs with last-wins
dedup on docID (MERGE upsert semantics) — never a global re-sort, because
every run is already docID-sorted and the shard bounds group size.
Idempotency: the merged index's logical fingerprint equals the input's
(verified by tests), so re-running a merge is a no-op semantically.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, functions as F

from data_prep_opensearch_spark.operators.index_build import SEGMENT_SCHEMA, SHARD_WIDTH
from data_prep_opensearch_spark.operators.postings import (
    decode_posting_list,
    encode_posting_list,
    merge_posting_runs,
    vbyte_decode,
)


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    fan_in: int = 8,
    apply_deletes: bool = False,
) -> dict:
    """Merge generations until one remains, ``fan_in`` generations per pass.

    With ``apply_deletes``, tombstoned docIDs are physically dropped from
    the merged postings and the tombstone table is cleared afterwards
    (doc_stats rows and global N/avgdl are left to a separate vacuum
    policy; retrieval is already exact because scorers mask tombstones).
    """
    seg_dir = os.path.join(index_dir, "segments")
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)

    dl = spark.read.parquet(os.path.join(index_dir, "doclens")).select("shard", "dl_bytes")

    bc_tombs = None
    if apply_deletes:
        from data_prep_opensearch_spark.operators.incremental import load_tombstones

        tombs = load_tombstones(spark, index_dir)
        if tombs:
            bc_tombs = spark.sparkContext.broadcast(tombs)

    passes = 0
    force_full_pass = bc_tombs is not None  # deletes must touch every row
    while True:
        seg = spark.read.parquet(seg_dir)
        gens = sorted(r["gen"] for r in seg.select("gen").distinct().collect())
        if not gens or (len(gens) <= 1 and not force_full_pass):
            break
        batch = gens if force_full_pass else gens[:fan_in]
        force_full_pass = False
        next_gen = max(gens) + 1
        to_merge = seg.filter(F.col("gen").isin(batch))
        keep = seg.filter(~F.col("gen").isin(batch))
        merged = _merge_generation_df(to_merge, dl, next_gen, bc_tombs)
        bc_tombs = None  # applied in the (full) first pass
        tmp_dir = seg_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        keep.unionByName(merged).write.mode("overwrite").parquet(tmp_dir)
        # atomic-ish publish: write tmp, swap (atomic_write_json pattern,
        # pipeline/io.py:28-33)
        old = seg_dir + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(seg_dir, old)
        os.replace(tmp_dir, seg_dir)
        shutil.rmtree(old)
        passes += 1

    if apply_deletes:
        tomb_dir = os.path.join(index_dir, "tombstones")
        if os.path.exists(tomb_dir):
            shutil.rmtree(tomb_dir)

    seg = spark.read.parquet(seg_dir)
    gens = sorted(r["gen"] for r in seg.select("gen").distinct().collect())
    meta["generations"] = gens
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(meta_path + ".tmp", meta_path)
    return {"passes": passes, "generations": gens}


def _merge_generation_df(to_merge, doclens, next_gen: int, bc_tombs=None):
    """Decode -> last-wins merge [-> drop tombstoned docs] -> re-encode
    each (term, shard) group.

    Needs per-shard doclens to rebuild block_min_dl for merged blocks, so
    the (small) doclen sidecar is broadcast-joined in.
    """
    joined = to_merge.join(F.broadcast(doclens), "shard")

    def merge_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        rows = []
        for (term, shard), grp in pdf.groupby(["term", "shard"], sort=False):
            base = int(shard) * SHARD_WIDTH
            runs = []
            for row in grp.sort_values("gen").itertuples(index=False):
                runs.append(decode_posting_list(
                    bytes(row.doc_bytes), bytes(row.tf_bytes), base=base
                ))
            docs, tfs = merge_posting_runs(runs)
            if bc_tombs is not None:
                dead = bc_tombs.value.get(int(shard))
                if dead is not None and dead.size:
                    alive = ~np.isin(docs, dead, assume_unique=False)
                    docs, tfs = docs[alive], tfs[alive]
            if docs.shape[0] == 0:
                continue
            dl_arr = vbyte_decode(bytes(grp.iloc[0].dl_bytes)).astype(np.int64)
            dls = dl_arr[docs - base]
            doc_b, tf_b, blk = encode_posting_list(docs, tfs, dls, base=base)
            rows.append((
                term, int(shard), next_gen, int(docs.shape[0]), int(tfs.sum()),
                doc_b, tf_b,
                blk.first.tolist(), blk.last.tolist(),
                blk.max_tf.tolist(), blk.min_dl.tolist(),
            ))
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    spark = to_merge.sparkSession
    return joined.repartition(
        spark.sparkContext.defaultParallelism, "term", "shard"
    ).mapInPandas(merge_part, SEGMENT_SCHEMA)
