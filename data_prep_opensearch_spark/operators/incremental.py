"""Incremental index maintenance — the reference's core competency
(SURVEY.md §2.10) mapped to the segment index:

  - add_documents: index a DELTA corpus as a new segment generation.
    New docs get docIDs continuing each shard's dense rank; unchanged
    docs are skipped by content fingerprint (the P12-P14 anti-join).
  - delete_documents: tombstone docIDs (append-only side table); queries
    mask tombstoned docs; merge physically drops them and clears the
    tombstones (the history-suppressing MERGE of api/mysql_store.py:951-999).
  - The log-structured generation merge (segment_merge.merge_segments)
    consolidates after appends.

Everything is deterministic and resumable: adds append a lineage row per
batch; re-running an identical add is a no-op (input fingerprint match).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from data_prep_opensearch_spark.operators.index_build import (
    LINEAGE_SCHEMA,
    SHARD_WIDTH,
    encode_doclens,
    map_runs_and_stats,
    segments_from_runs,
)


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def _save_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def add_documents(
    spark: SparkSession, index_dir: str, new_docs: DataFrame
) -> dict:
    """Index a delta corpus into an existing index as a new generation.

    Skip semantics: rows whose (repo, path, commit) key already exists in
    doc_stats are dropped (unchanged re-sends — the fingerprint-gated skip,
    stages/enricher/utils.py:1152-1172). A changed file arrives as a new
    commit => a new key => a new docID; readers see both until a pruning
    policy (e.g. latest-commit-per-(repo,path)) filters at query time.
    """
    meta = _load_meta(index_dir)
    n_shards = int(meta["n_shards"])
    gen = max(meta["generations"]) + 1
    stats_dir = os.path.join(index_dir, "doc_stats")
    seg_dir = os.path.join(index_dir, "segments")
    dl_dir = os.path.join(index_dir, "doclens")

    existing = spark.read.parquet(stats_dir).select("repo", "path", "commit")
    fresh = new_docs.join(existing, ["repo", "path", "commit"], "left_anti")

    # per-shard current population -> rank offsets for the new docs
    counts = {
        int(r["shard"]): int(r["n"])
        for r in spark.read.parquet(stats_dir)
        .groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    offs = F.create_map(*[
        x for s in range(n_shards) for x in (F.lit(s), F.lit(counts.get(s, 0)))
    ])
    keyed = fresh.withColumn(
        "key_hash", F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
    ).withColumn("shard", F.pmod(F.col("key_hash"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy("key_hash", "repo", "path", "commit")
    docs = keyed.withColumn(
        "doc_id",
        F.col("shard").cast("long") * F.lit(SHARD_WIDTH)
        + offs[F.col("shard")].cast("long")
        + F.row_number().over(w).cast("long") - F.lit(1),
    ).drop("key_hash").withColumn("sha256", F.sha2(F.col("content"), 256))

    t0 = time.monotonic()
    staged_dir = os.path.join(index_dir, "staged", f"delta_gen={gen}")
    map_runs_and_stats(docs, meta["tokenizer"]).write.partitionBy("kind").mode(
        "overwrite"
    ).parquet(staged_dir)
    run_cols = ["term", "shard", "df", "cf", "doc_bytes", "tf_bytes", "dl_bytes"]
    kind0 = os.path.join(staged_dir, "kind=0")
    n_new = 0
    if os.path.exists(kind0):
        runs = spark.read.parquet(kind0).select(*run_cols)
        segments_from_runs(runs, gen=gen).write.mode("append").parquet(seg_dir)
        # keep the same partition-column name as the base build's group=N
        # dirs (mixed names break parquet partition discovery)
        stats_target = os.path.join(stats_dir, f"group={10000 + gen}")
        if os.path.exists(stats_target):
            import shutil

            shutil.rmtree(stats_target)
        os.rename(os.path.join(staged_dir, "kind=1"), stats_target)
        g_stats = spark.read.parquet(stats_target)
        n_new = g_stats.count()
        # doclen sidecar: re-encode affected shards over their FULL stats
        # (dense ranks => the sidecar is position-indexed per shard)
        shards_touched = [int(r["shard"]) for r in g_stats.select("shard").distinct().collect()]
        all_stats = spark.read.parquet(stats_dir).filter(F.col("shard").isin(shards_touched))
        new_dl = encode_doclens(all_stats)
        old_dl = spark.read.parquet(dl_dir).filter(~F.col("shard").isin(shards_touched))
        tmp_dl = dl_dir + ".tmp"
        old_dl.unionByName(new_dl).write.mode("overwrite").parquet(tmp_dl)
        import shutil

        old = dl_dir + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(dl_dir, old)
        os.replace(tmp_dl, dl_dir)
        shutil.rmtree(old)

    # refresh global stats + lineage
    stats = spark.read.parquet(stats_dir)
    agg = stats.select(F.count("*").alias("n"), F.avg("doclen").alias("a")).collect()[0]
    meta["n_docs"] = int(agg["n"])
    meta["avgdl"] = float(agg["a"])
    meta["generations"] = sorted(set(meta["generations"]) | {gen})
    _save_meta(index_dir, meta)
    lineage = spark.createDataFrame(
        [("add_documents", -1, gen, n_new, 0,
          0, int((time.monotonic() - t0) * 1000), "complete")],
        LINEAGE_SCHEMA,
    )
    lineage.write.mode("append").parquet(os.path.join(index_dir, "lineage"))
    return {"generation": gen, "docs_added": n_new, "n_docs": meta["n_docs"]}


def delete_documents(spark: SparkSession, index_dir: str, doc_ids: DataFrame) -> int:
    """Tombstone docIDs (column ``doc_id``). Queries mask them immediately;
    merge_segments with apply_deletes=True drops them physically."""
    tomb_dir = os.path.join(index_dir, "tombstones")
    rows = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    rows.write.mode("append").parquet(tomb_dir)
    return rows.count()


def load_tombstones(spark: SparkSession, index_dir: str) -> dict[int, np.ndarray]:
    """{shard: sorted int64 docIDs} — empty dict if none."""
    tomb_dir = os.path.join(index_dir, "tombstones")
    if not os.path.exists(tomb_dir):
        return {}
    pdf = spark.read.parquet(tomb_dir).toPandas()
    if pdf.empty:
        return {}
    ids = np.unique(pdf["doc_id"].to_numpy(dtype=np.int64))
    out: dict[int, np.ndarray] = {}
    for shard, grp in pd.Series(ids).groupby(ids // SHARD_WIDTH):
        out[int(shard)] = grp.to_numpy(dtype=np.int64)
    return out
