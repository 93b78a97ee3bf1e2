"""BM25 scoring + the top-k query engine (exhaustive and block-max WAND).

Scoring constants and formula live HERE and only here — oracle, engine,
and SQL generator all import them, guaranteeing score parity
(SURVEY.md §7.3 "Rank-identical BM25").

  idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )           (Lucene form)
  score(d) = Σ_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

All floats are float64; top-k ties broken by ascending docID.

Query plan shape (the engine's second entry point, SURVEY.md §3.3):
  1. analyze query -> terms (same tokenizer as the build)
  2. dictionary semi-join: segment scan FILTERED on term — Catalyst pushes
     ``term IN (...)`` into the parquet scan (term is the leading sort key
     of segment files, so row-group min/max stats prune aggressively).
  3. global df per term: tiny agg collected to the driver = the broadcast
     dictionary step (X10 in SURVEY.md §4).
  4. join the per-shard doclen sidecar (small, broadcast).
  5. per-shard scoring in mapInPandas: decode + block-max WAND (or dense
     exhaustive) -> local top-k per shard.
  6. final top-k: orderBy(score desc, doc_id asc).limit(k) — Spark's
     TakeOrderedAndProject does the partial/final merge.
"""

from __future__ import annotations

import heapq
import json
import math
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from data_prep_opensearch_spark.functions.tokenize import TOKENIZERS
from data_prep_opensearch_spark.operators.postings import (
    decode_posting_list,
    merge_posting_runs,
    vbyte_decode,
)

K1 = 1.2
B = 0.75
INF_DOC = 1 << 62


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_tf_term(tf, dl, avgdl: float):
    """Vectorized tf normalization — works on numpy arrays or scalars."""
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * (dl / avgdl)))


def bm25_upper_bound(idf_t: float, max_tf: int, min_dl: int, avgdl: float) -> float:
    """Block upper bound: BM25 tf-term is increasing in tf, decreasing in dl."""
    return idf_t * bm25_tf_term(float(max_tf), float(min_dl), avgdl)


def bm25_sql_score_expr(tf: str, dl: str, df: str, n: str, avgdl: str) -> str:
    """ANSI-SQL BM25 fragment, valid in both Spark SQL and DuckDB."""
    return (
        f"ln(({n} - {df} + 0.5) / ({df} + 0.5) + 1.0) * "
        f"({tf} * ({K1} + 1.0)) / ({tf} + {K1} * (1.0 - {B} + {B} * ({dl} / {avgdl})))"
    )


TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


class BM25Engine:
    """Warm query engine. Init loads, once:
      - the term dictionary (term -> global df) into driver memory (tiny:
        one row per term; at web scale this becomes its own filtered-read
        table — the broadcast-dictionary step X10 of SURVEY.md §4),
      - segments CACHED pre-partitioned by shard (so a query is filter +
        mapInPandas with NO shuffle),
      - the per-shard doclen sidecar as a Spark broadcast (a few KB/shard;
        at web scale this would be a bucketed co-located join instead).
    A warm query is then exactly ONE Spark job:
      filter(term IN ...) -> per-shard block-max WAND / dense top-k
      -> TakeOrderedAndProject.
    """

    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = True) -> None:
        self.spark = spark
        self.meta = load_meta(index_dir)
        seg = spark.read.parquet(os.path.join(index_dir, "segments"))
        self._shard_partitioned = cache
        if cache:
            n_part = max(spark.sparkContext.defaultParallelism, self.meta["n_shards"])
            self.seg = seg.repartition(min(n_part, self.meta["n_shards"]), "shard").cache()
            self.seg.count()
        else:
            self.seg = seg
        # global term dictionary: sums df across shards/generations
        dict_pdf = (
            seg.groupBy("term").agg(F.sum("df").alias("df")).toPandas()
        )
        self.df_map = dict(zip(dict_pdf["term"], dict_pdf["df"].astype(int)))
        dl_rows = spark.read.parquet(os.path.join(index_dir, "doclens")).collect()
        from data_prep_opensearch_spark.operators.incremental import load_tombstones

        tombs = load_tombstones(spark, index_dir)
        self.bc_doclens = spark.sparkContext.broadcast({
            int(r["shard"]): (int(r["base"]), bytes(r["dl_bytes"]),
                              tombs.get(int(r["shard"])))
            for r in dl_rows
        })

    def topk(self, query: str, k: int = 10, scorer: str = "auto") -> DataFrame:
        spark = self.spark
        terms = sorted(set(TOKENIZERS[self.meta["tokenizer"]](query)))
        terms = [t for t in terms if t in self.df_map]
        if not terms:
            return spark.createDataFrame([], TOPK_SCHEMA)
        n_docs, avgdl = int(self.meta["n_docs"]), float(self.meta["avgdl"])
        idf_map = {t: idf(n_docs, self.df_map[t]) for t in terms}

        if scorer == "auto":
            # WAND's per-posting Python walk pays off when pruning can skip
            # work: several terms, none of them scanning most of the corpus.
            # Single-term or stopword-dominated queries score (nearly)
            # every posting either way -> vectorized dense path wins.
            hot = max(self.df_map[t] for t in terms) > 0.1 * n_docs
            scorer = "dense" if (len(terms) == 1 or hot) else "wand"
        scorer_fn = _score_shard_wand if scorer == "wand" else _score_shard_dense

        seg = self.seg.filter(F.col("term").isin(terms))
        if not self._shard_partitioned:
            # cold path: co-locate each shard's rows (the filtered set is
            # tiny — <= |terms| rows per shard — so this shuffle is cheap)
            seg = seg.repartition(F.col("shard"))
        bc = self.bc_doclens

        def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # a shard's rows can span Arrow batches: consume the WHOLE
            # partition before grouping, else a doc's score splits across
            # partial term sets (top-k would then rank partial sums)
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            for shard, grp in pdf.groupby("shard"):
                base, dl_bytes, deleted = bc.value[int(shard)]
                yield scorer_fn(grp, idf_map, avgdl, k, base, dl_bytes, deleted)

        local = seg.mapInPandas(score_partition, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def query_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    scorer: str = "wand",
) -> DataFrame:
    """One-shot top-k BM25 (cold engine) — see BM25Engine for warm reuse."""
    return BM25Engine(spark, index_dir, cache=False).topk(query, k, scorer)


# ---------------------------------------------------------------------------
# shard scorers (run inside mapInPandas; pure numpy/python on decoded arrays)
# ---------------------------------------------------------------------------

def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "score": pd.Series(dtype="float64"),
    })


def _decode_group(grp: pd.DataFrame, base: int) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Decode (and merge across generations) each term's postings."""
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for row in grp.itertuples(index=False):
        docs, tfs = decode_posting_list(bytes(row.doc_bytes), bytes(row.tf_bytes), base=base)
        if row.term in out:
            docs, tfs = merge_posting_runs([out[row.term], (docs, tfs)])
        out[row.term] = (docs, tfs)
    return out


def _score_shard_dense(
    grp: pd.DataFrame, idf_map: dict[str, float], avgdl: float, k: int,
    base: int, dl_bytes: bytes, deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exhaustive vectorized scorer: dense accumulator over the shard's
    contiguous docID range (shards ARE docID ranges by construction)."""
    postings = _decode_group(grp, base)
    dl_arr = vbyte_decode(dl_bytes).astype(np.int64)
    if not postings:
        return _empty_topk()
    acc = np.zeros(dl_arr.shape[0], dtype=np.float64)
    for term, (docs, tfs) in postings.items():
        if docs.size == 0:
            continue
        off = docs - base
        dl = dl_arr[off]
        acc[off] += idf_map[term] * bm25_tf_term(
            tfs.astype(np.float64), dl.astype(np.float64), avgdl
        )
    if deleted is not None and deleted.size:
        acc[deleted - base] = 0.0  # tombstone mask
    nz = np.flatnonzero(acc)
    if nz.size == 0:
        return _empty_topk()
    order = np.lexsort((nz, -acc[nz]))[:k]
    sel = nz[order]
    return pd.DataFrame({
        "doc_id": (sel + base).astype("int64"),
        "score": acc[sel],
    })


def _score_shard_wand(
    grp: pd.DataFrame, idf_map: dict[str, float], avgdl: float, k: int,
    base: int, dl_bytes: bytes, deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """Block-max WAND within one shard (Broder et al. CIKM'03; Ding & Suel
    SIGIR'11). Pruning is conservative around ties: candidates whose upper
    bound EQUALS the heap threshold are still scored, so results are exact
    under the (score desc, docID asc) order."""
    postings = _decode_group(grp, base)
    dl_arr = vbyte_decode(dl_bytes).astype(np.int64)
    terms = [t for t in postings if postings[t][0].size > 0]
    if not terms:
        return _empty_topk()

    # one block-metadata tuple per generation row; a doc's bound is the max
    # over generations (merged postings keep the last generation's tf, but
    # max-over-gens stays a valid upper bound)
    blocks: dict[str, list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]] = {}
    for row in grp.itertuples(index=False):
        blocks.setdefault(row.term, []).append((
            np.asarray(row.block_first, dtype=np.int64),
            np.asarray(row.block_last, dtype=np.int64),
            np.asarray(row.block_max_tf, dtype=np.int64),
            np.asarray(row.block_min_dl, dtype=np.int64),
        ))

    cursors = {t: 0 for t in terms}
    ub_term = {
        t: bm25_upper_bound(
            idf_map[t],
            int(postings[t][1].max()),
            min((int(b[3].min()) for b in blocks[t] if b[3].size), default=1),
            avgdl,
        )
        for t in terms
    }

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of current top-k

    def cur_doc(t: str) -> int:
        c = cursors[t]
        d = postings[t][0]
        return int(d[c]) if c < d.size else INF_DOC

    while True:
        live = sorted((t for t in terms if cursors[t] < postings[t][0].size), key=cur_doc)
        if not live:
            break
        threshold = heap[0][0] if len(heap) >= k else -math.inf
        ub_sum, pivot_idx = 0.0, -1
        for i, t in enumerate(live):
            ub_sum += ub_term[t]
            if ub_sum >= threshold:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no doc can reach the threshold anymore
        pivot_doc = cur_doc(live[pivot_idx])
        if pivot_doc >= INF_DOC:
            break
        if cur_doc(live[0]) == pivot_doc:
            # block-max refinement over EVERY term positioned at pivot_doc:
            # terms after the pivot index can sit at the same doc and their
            # contribution is real — omitting them under-estimates the
            # bound and wrongly prunes (caught by the 500k-doc parity run)
            upto = pivot_idx
            while upto + 1 < len(live) and cur_doc(live[upto + 1]) == pivot_doc:
                upto += 1
            refined = sum(
                _block_ub(t, pivot_doc, blocks, idf_map, avgdl)
                for t in live[: upto + 1]
            )
            if len(heap) >= k and refined < threshold:
                _advance_past(live[0], pivot_doc, postings, cursors)
                continue
            score = 0.0
            dl = float(dl_arr[pivot_doc - base])
            for t in live:
                docs, tfs = postings[t]
                c = cursors[t]
                if c < docs.size and docs[c] == pivot_doc:
                    score += idf_map[t] * bm25_tf_term(float(tfs[c]), dl, avgdl)
                    cursors[t] = c + 1
                elif cur_doc(t) > pivot_doc:
                    break
            if deleted is not None and deleted.size:
                di = int(np.searchsorted(deleted, pivot_doc))
                if di < deleted.size and deleted[di] == pivot_doc:
                    continue  # tombstoned: cursors advanced, doc not ranked
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
        else:
            for t in live[:pivot_idx]:
                _seek(t, pivot_doc, postings, cursors)

    rows = sorted(((s, -negd) for s, negd in heap), key=lambda x: (-x[0], x[1]))
    return pd.DataFrame({
        "doc_id": pd.Series([d for _, d in rows], dtype="int64"),
        "score": pd.Series([s for s, _ in rows], dtype="float64"),
    })


def _block_ub(t, doc, blocks, idf_map, avgdl) -> float:
    """Upper bound of term t's contribution at doc: max over generations'
    blocks containing doc; 0 if no block covers it (t can't match doc)."""
    gens = blocks.get(t)
    if not gens:
        return idf_map[t] * (K1 + 1.0)  # universal bound: tf-term < k1+1
    best = 0.0
    for first, last, max_tf, min_dl in gens:
        if first.size == 0:
            continue
        i = int(np.searchsorted(last, doc))
        if i >= first.size or first[i] > doc:
            continue
        best = max(best, bm25_upper_bound(idf_map[t], int(max_tf[i]), int(min_dl[i]), avgdl))
    return best


def _seek(t, doc, postings, cursors) -> None:
    cursors[t] = int(np.searchsorted(postings[t][0], doc, side="left"))


def _advance_past(t, doc, postings, cursors) -> None:
    cursors[t] = int(np.searchsorted(postings[t][0], doc, side="right"))
