"""Inverted-index build: the engine's ETL entry point (SURVEY.md §3.3).

    scan -> normalize -> tokenize -> (term, docID, tf, dl)
         -> hash-repartition by (term, shard) -> encode sorted posting runs
         -> segments + doclen sidecar + doc stats + lineage

Shard/salting design (the skew strategy, SURVEY.md §4 X8):
  * ``shard = f(docID)`` — docIDs are assigned densely per shard, so a
    shard IS a contiguous docID range of width <= SHARD_WIDTH.
  * A posting group is (term, shard): a stopword-like hot term is split
    across all shards, so no encode task ever sees more than SHARD_WIDTH
    postings — the explicit salting the north rule demands (salt = shard
    = f(docID), which keeps per-salt runs disjoint and docID-sorted, so
    phase-2 merges are concat-of-sorted-runs, never a re-sort).
  * At 10^12 docs this scales by adding shards, never by growing tasks.

docID assignment (deterministic under ANY parallelism):
  * key_hash = xxhash64(repo, path, commit)  — pure row function
  * shard    = pmod(key_hash, n_shards)
  * doc_id   = shard * SHARD_WIDTH + (row_number within shard ordered by
               (key_hash, repo, path, commit) - 1)
  The window partitions by shard (a real shuffle, scales out); ordering is
  total, so ids never depend on partition layout. Dense per-shard ids give
  small deltas -> tight VByte compression.

Checkpoint / resume (SURVEY.md §2.10 I3/I4): shards are processed in
``n_groups`` commit groups; each group appends segments + doclens +
doc_stats and then a lineage row (phase, group, shard count, rows, fp,
wall_ms, status) — the Spark analogue of the reference's per-page
checkpoint writes (stages/downloader/service.py:60-94). A resumed build
anti-joins the lineage table and re-runs only incomplete groups
(the fingerprint-gated skip of stages/enricher/utils.py:1152-1172).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from data_prep_opensearch_spark.functions.tokenize import TOKENIZERS
from data_prep_opensearch_spark.operators.postings import (
    encode_posting_list,
    vbyte_encode,
)

SHARD_WIDTH = 1 << 20  # docID capacity per shard; ids are dense so actual
                       # shard population just has to stay below this

POSTING_ROW_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("dl", T.IntegerType(), False),
])

SEGMENT_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("gen", T.IntegerType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
    T.StructField("doc_bytes", T.BinaryType(), False),
    T.StructField("tf_bytes", T.BinaryType(), False),
    T.StructField("block_first", T.ArrayType(T.LongType()), False),
    T.StructField("block_last", T.ArrayType(T.LongType()), False),
    T.StructField("block_max_tf", T.ArrayType(T.IntegerType()), False),
    T.StructField("block_min_dl", T.ArrayType(T.IntegerType()), False),
])

DOCLEN_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("base", T.LongType(), False),
    T.StructField("n_docs", T.LongType(), False),
    T.StructField("dl_bytes", T.BinaryType(), False),
])

LINEAGE_SCHEMA = T.StructType([
    T.StructField("phase", T.StringType(), False),
    T.StructField("group_id", T.IntegerType(), False),
    T.StructField("gen", T.IntegerType(), False),
    T.StructField("n_docs", T.LongType(), False),
    T.StructField("n_postings", T.LongType(), False),
    T.StructField("input_fp", T.LongType(), False),
    T.StructField("wall_ms", T.LongType(), False),
    T.StructField("status", T.StringType(), False),
])


def assign_doc_ids(df: DataFrame, n_shards: int) -> DataFrame:
    """Deterministic dense-per-shard docIDs (see module docstring)."""
    keyed = df.withColumn(
        "key_hash", F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
    ).withColumn("shard", F.pmod(F.col("key_hash"), F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy("key_hash", "repo", "path", "commit")
    return keyed.withColumn(
        "doc_id",
        F.col("shard").cast("long") * F.lit(SHARD_WIDTH)
        + F.row_number().over(w).cast("long")
        - F.lit(1),
    ).drop("key_hash")


def tokenize_to_postings(docs: DataFrame, tokenizer: str = "simple") -> DataFrame:
    """(doc_id, shard, content) -> (term, doc_id, shard, tf, dl) rows.

    Arrow-vectorized: one pandas batch in, one exploded batch out — the
    UDTF-shaped flatMap of SURVEY.md §2.11.
    """
    tok = TOKENIZERS[tokenizer]

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in batches:
            terms: list[str] = []
            dids: list[int] = []
            shards: list[int] = []
            tfs: list[int] = []
            dls: list[int] = []
            for did, shard, content in zip(
                pdf["doc_id"], pdf["shard"], pdf["content"]
            ):
                counts = Counter(tok(content or ""))
                dl = sum(counts.values())
                for term, tf in counts.items():
                    terms.append(term)
                    dids.append(did)
                    shards.append(shard)
                    tfs.append(tf)
                    dls.append(dl)
            yield pd.DataFrame({
                "term": terms,
                "doc_id": pd.Series(dids, dtype="int64"),
                "shard": pd.Series(shards, dtype="int32"),
                "tf": pd.Series(tfs, dtype="int32"),
                "dl": pd.Series(dls, dtype="int32"),
            })

    return docs.select("doc_id", "shard", "content").mapInPandas(
        explode, POSTING_ROW_SCHEMA
    )


def encode_segments(postings: DataFrame, gen: int, n_partitions: int | None = None) -> DataFrame:
    """Hash-repartition by (term, shard) and encode each group's sorted run.

    Each (term, shard) group is <= SHARD_WIDTH postings by construction, so
    task memory is bounded however hot the term is. Encoding happens inside
    mapInPandas with a numpy groupby (sort + reduceat boundaries), not one
    applyInPandas call per group — the per-group overhead matters when the
    vocabulary is large.
    """
    if n_partitions is None:
        n_partitions = postings.sparkSession.sparkContext.defaultParallelism * 2

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["term", "shard", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy()
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        # group boundaries where (term, shard) changes
        change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
        )
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [terms.shape[0]]))
        rows = []
        for s, e in zip(starts, ends):
            base = int(shards[s]) * SHARD_WIDTH
            doc_b, tf_b, blk = encode_posting_list(docs[s:e], tfs[s:e], dls[s:e], base=base)
            rows.append((
                terms[s], int(shards[s]), gen, int(e - s), int(tfs[s:e].sum()),
                doc_b, tf_b,
                blk.first.tolist(), blk.last.tolist(),
                blk.max_tf.tolist(), blk.min_dl.tolist(),
            ))
        yield pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA.fields])

    return postings.repartition(n_partitions, "term", "shard").mapInPandas(
        encode, SEGMENT_SCHEMA
    )


def encode_doclens(doc_stats: DataFrame) -> DataFrame:
    """Per-shard dense doclen sidecar: dl_bytes = VByte of dl[rank] for the
    shard's contiguous docID range."""
    def enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(key[0])
        base = shard * SHARD_WIDTH
        dls = pdf["doclen"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "shard": [shard],
            "base": [base],
            "n_docs": [len(pdf)],
            "dl_bytes": [vbyte_encode(dls.astype(np.uint64))],
        })

    return doc_stats.groupBy("shard").applyInPandas(enc, DOCLEN_SCHEMA)


def _group_fp(docs: DataFrame) -> int:
    """Order-independent input fingerprint: sum of row key-hashes (the
    idempotent-export identity pattern, api/control_plane.py:698-704)."""
    row = docs.select(
        F.expr("bit_xor(xxhash64(repo, path, commit, content))").alias("fp"),
        F.count("*").alias("n"),
    ).collect()[0]
    return int(row["fp"] or 0) ^ int(row["n"])


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    n_shards: int = 8,
    tokenizer: str = "simple",
    n_groups: int = 4,
    resume: bool = False,
    stop_after_groups: int | None = None,
) -> dict:
    """Full index build with per-group checkpointing.

    ``stop_after_groups`` simulates a mid-build kill for the resume test
    (FIXTURES.md §F6). Returns the meta dict (also persisted to meta.json
    once ALL groups are complete).
    """
    os.makedirs(index_dir, exist_ok=True)
    seg_dir = os.path.join(index_dir, "segments")
    dl_dir = os.path.join(index_dir, "doclens")
    stats_dir = os.path.join(index_dir, "doc_stats")
    lineage_dir = os.path.join(index_dir, "lineage")

    docs = assign_doc_ids(source, n_shards)
    # content fingerprint invariant (input_hint): sha2(content, 256)
    docs = docs.withColumn("sha256", F.sha2(F.col("content"), 256))
    docs = docs.withColumn("group_id", F.pmod(F.col("shard"), F.lit(n_groups)).cast("int"))
    docs.cache()

    done_groups: set[int] = set()
    if resume and os.path.exists(lineage_dir):
        done = (
            spark.read.parquet(lineage_dir)
            .filter((F.col("phase") == "postings") & (F.col("status") == "complete"))
            .select("group_id")
            .distinct()
            .collect()
        )
        done_groups = {int(r["group_id"]) for r in done}

    todo = [g for g in range(n_groups) if g not in done_groups]
    if stop_after_groups is not None:
        todo = todo[:stop_after_groups]

    for g in todo:
        t0 = time.monotonic()
        gdocs = docs.filter(F.col("group_id") == g)
        fp = _group_fp(gdocs)
        postings = tokenize_to_postings(gdocs, tokenizer)
        postings.cache()
        seg = encode_segments(postings, gen=0)
        seg.write.mode("append").parquet(seg_dir)
        # left join from the docs side so zero-token docs keep a stats row
        # (dense per-shard ranks require every doc present in the sidecar)
        dlens = postings.groupBy("doc_id").agg(F.max("dl").alias("doclen"))
        doc_stats = (
            gdocs.select("doc_id", "shard", "repo", "path", "commit", "lang", "sha256")
            .join(dlens, "doc_id", "left")
            .fillna({"doclen": 0})
        )
        doc_stats.write.mode("append").parquet(stats_dir)
        encode_doclens(doc_stats).write.mode("append").parquet(dl_dir)
        n_docs = gdocs.count()
        n_postings = postings.count()
        postings.unpersist()
        wall = int((time.monotonic() - t0) * 1000)
        lineage = spark.createDataFrame(
            [("postings", g, 0, n_docs, n_postings, fp, wall, "complete")],
            LINEAGE_SCHEMA,
        )
        lineage.write.mode("append").parquet(lineage_dir)

    docs.unpersist()
    if stop_after_groups is not None and len(todo) < n_groups - len(done_groups):
        return {"status": "interrupted", "groups_done": sorted(done_groups | set(todo))}

    # finalize: global stats -> meta.json (atomic tmp+rename — the
    # reference's atomic_write_json, pipeline/io.py:28-33)
    stats = spark.read.parquet(stats_dir)
    agg = stats.select(
        F.count("*").alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    meta = {
        "n_docs": int(agg["n"]),
        "avgdl": float(agg["avgdl"]),
        "n_shards": n_shards,
        "shard_width": SHARD_WIDTH,
        "tokenizer": tokenizer,
        "generations": [0],
        "status": "complete",
    }
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def index_fingerprint(spark: SparkSession, index_dir: str) -> int:
    """Order-independent fingerprint of the LOGICAL index: per (term,
    shard), generations are merged (last-wins) and the canonical decoded
    postings are hashed; fingerprints sum mod 2^64. Equal fingerprints <=>
    identical retrievable index, regardless of segment layout."""
    import hashlib

    from data_prep_opensearch_spark.operators.postings import (
        decode_posting_list,
        merge_posting_runs,
    )

    seg = spark.read.parquet(os.path.join(index_dir, "segments"))

    out_schema = T.StructType([T.StructField("fp", T.LongType(), False)])

    def fp_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if pdf.empty:
            yield pd.DataFrame({"fp": pd.Series(dtype="int64")})
            return
        total = 0
        for (term, shard), grp in pdf.groupby(["term", "shard"]):
            runs = []
            for row in grp.sort_values("gen").itertuples(index=False):
                runs.append(decode_posting_list(
                    bytes(row.doc_bytes), bytes(row.tf_bytes),
                    base=int(shard) * SHARD_WIDTH,
                ))
            docs, tfs = merge_posting_runs(runs)
            h = hashlib.sha256()
            h.update(str(term).encode())
            h.update(int(shard).to_bytes(8, "little"))
            h.update(docs.astype("<i8").tobytes())
            h.update(tfs.astype("<i8").tobytes())
            total = (total + int.from_bytes(h.digest()[:8], "little")) % (1 << 64)
        yield pd.DataFrame({"fp": [total - (1 << 63)]})  # keep in int64 range

    parts = seg.repartition(
        seg.sparkSession.sparkContext.defaultParallelism, "term", "shard"
    ).mapInPandas(fp_part, out_schema)
    rows = parts.collect()
    total = 0
    for r in rows:
        total = (total + (int(r["fp"]) + (1 << 63))) % (1 << 64)
    return total
