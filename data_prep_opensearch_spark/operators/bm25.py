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

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache: bool = True,
        prune_superseded: bool = False,
    ) -> None:
        """``prune_superseded``: mask every document version except the
        latest per (repo, path) — tombstone-style masking (scores use
        full-corpus stats; superseded docs are excluded from results).
        The id set is collected like tombstones; at web scale both become
        a broadcast-built per-shard bitmap from the same anti-join."""
        from data_prep_opensearch_spark.operators.manifest import (
            read_doclens,
            read_segments,
        )

        self.spark = spark
        self.meta = load_meta(index_dir)
        seg = read_segments(spark, index_dir)
        self._shard_partitioned = cache
        if cache:
            n_part = max(spark.sparkContext.defaultParallelism, self.meta["n_shards"])
            self.seg = seg.repartition(min(n_part, self.meta["n_shards"]), "shard").cache()
            self.seg.count()
        else:
            self.seg = seg
        # term dictionary: resolved LAZILY per query via a `term IN (...)`
        # filtered aggregate over the (term-sorted) segment files — the
        # parquet scan prunes on term min/max stats, so this is a
        # dictionary-table point read, never a full-vocabulary collect
        # (the round-1 toPandas() pulled the whole vocab to the driver,
        # which cannot exist at 10^12 docs). Warm terms are cached.
        self._df_cache: dict[str, int] = {}
        dl_rows = read_doclens(spark, index_dir).collect()
        from data_prep_opensearch_spark.operators.incremental import load_tombstones

        tombs = load_tombstones(spark, index_dir)
        if prune_superseded:
            import numpy as np
            import pandas as pd

            from data_prep_opensearch_spark.operators.incremental import (
                superseded_doc_ids,
            )
            from data_prep_opensearch_spark.operators.index_build import SHARD_WIDTH

            sup = superseded_doc_ids(spark, index_dir).toPandas()
            if not sup.empty:
                ids = np.unique(sup["doc_id"].to_numpy(dtype=np.int64))
                for shard, grp in pd.Series(ids).groupby(ids // SHARD_WIDTH):
                    old = tombs.get(int(shard))
                    new = grp.to_numpy(dtype=np.int64)
                    tombs[int(shard)] = (
                        np.union1d(old, new) if old is not None else new
                    )
        self.bc_doclens = spark.sparkContext.broadcast({
            int(r["shard"]): (int(r["base"]), bytes(r["dl_bytes"]),
                              tombs.get(int(r["shard"])))
            for r in dl_rows
        })

    def resolve_df(self, terms: list[str]) -> dict[str, int]:
        """Global df per term (summed over shards/generations) via one tiny
        filtered-scan job for cache misses; absent terms resolve to 0."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            rows = (
                self.seg.filter(F.col("term").isin(missing))
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            if len(self._df_cache) > 4_000_000:  # bound driver memory
                self._df_cache.clear()
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    def topk(self, query: str, k: int = 10, scorer: str = "auto") -> DataFrame:
        spark = self.spark
        terms = sorted(set(TOKENIZERS[self.meta["tokenizer"]](query)))
        df_map = self.resolve_df(terms)
        terms = [t for t in terms if df_map[t] > 0]
        if not terms:
            return spark.createDataFrame([], TOPK_SCHEMA)
        n_docs, avgdl = int(self.meta["n_docs"]), float(self.meta["avgdl"])
        idf_map = {t: idf(n_docs, df_map[t]) for t in terms}

        if scorer == "auto":
            # the pruned scorer pays off when skipping can save work:
            # several terms, none of them scanning most of the corpus.
            # Single-term or stopword-dominated queries score (nearly)
            # every posting either way -> the dense accumulator wins.
            hot = max(df_map[t] for t in terms) > 0.1 * n_docs
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
        # tombstone mask; clip to the shard's populated range — a stale or
        # bogus tombstone id must not crash every query on this shard
        off = deleted - base
        acc[off[(off >= 0) & (off < acc.shape[0])]] = 0.0
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
    """Vectorized block-max MaxScore within one shard (Turtle & Flood '95
    term-at-a-time pruning with the block-derived bounds of Ding & Suel
    SIGIR'11). Replaces the round-1 per-posting Python WAND walk — every
    step here is a whole-array numpy operation:

      1. per-term upper bound = max over blocks of ub(block_max_tf,
         block_min_dl) — tighter than the global (max tf, min dl) pair;
      2. terms processed in descending-bound order; each round scores the
         docs containing the current term that were not seen before, with
         EXACT full scores (one searchsorted per query term — vectorized
         gather, no per-doc loop);
      3. stop when sum of the remaining terms' bounds is strictly below
         the current kth score: no unseen doc can reach the top-k. The
         strict `<` keeps ties conservative — a candidate whose bound
         EQUALS the threshold is still scored, so results are exact under
         the (score desc, docID asc) order.

    Exactness: every emitted score is a full sum over all query terms;
    pruning only ever skips docs whose total is provably below (not equal
    to) the kth score. Parity-tested against the exhaustive oracle.
    """
    postings = _decode_group(grp, base)
    dl_arr = vbyte_decode(dl_bytes).astype(np.int64)
    terms = [t for t in postings if postings[t][0].size > 0]
    if not terms:
        return _empty_topk()

    # per-term bound: max over generation rows & blocks (merged postings
    # keep the last generation's tf; max-over-gens stays a valid bound)
    ub: dict[str, float] = {}
    for row in grp.itertuples(index=False):
        mt = np.asarray(row.block_max_tf, dtype=np.float64)
        if mt.size:
            md = np.asarray(row.block_min_dl, dtype=np.float64)
            b = float(np.max(bm25_tf_term(mt, np.maximum(md, 1.0), avgdl)))
        else:
            b = K1 + 1.0  # universal bound: tf-term < k1+1
        b *= idf_map[row.term]
        ub[row.term] = max(ub.get(row.term, 0.0), b)

    order = sorted(terms, key=lambda t: (-ub[t], t))
    ubs = np.array([ub[t] for t in order], dtype=np.float64)
    # tail[i] = sum of bounds of terms after i (0 for the last)
    tail = np.concatenate((np.cumsum(ubs[::-1])[::-1][1:], [0.0]))

    pool_docs = np.zeros(0, dtype=np.int64)     # unique, sorted
    pool_scores = np.zeros(0, dtype=np.float64)
    threshold = -math.inf
    for i, t in enumerate(order):
        cand = postings[t][0]
        if pool_docs.size:
            cand = cand[~np.isin(cand, pool_docs, assume_unique=True)]
        if deleted is not None and deleted.size:
            cand = cand[~np.isin(cand, deleted)]
        if cand.size:
            dl = dl_arr[cand - base].astype(np.float64)
            sc = np.zeros(cand.size, dtype=np.float64)
            for u in terms:  # exact score over ALL query terms
                du, tu = postings[u]
                pos = np.searchsorted(du, cand)
                safe = np.minimum(pos, du.size - 1)
                hit = (pos < du.size) & (du[safe] == cand)
                if hit.any():
                    sc[hit] += idf_map[u] * bm25_tf_term(
                        tu[safe[hit]].astype(np.float64), dl[hit], avgdl
                    )
            pool_docs = np.concatenate((pool_docs, cand))
            pool_scores = np.concatenate((pool_scores, sc))
            o = np.argsort(pool_docs)
            pool_docs, pool_scores = pool_docs[o], pool_scores[o]
            if pool_docs.size >= k:
                threshold = float(
                    np.partition(pool_scores, pool_scores.size - k)[pool_scores.size - k]
                )
        if pool_docs.size >= k and tail[i] < threshold:
            break  # remaining terms can't lift any unseen doc into the top-k

    if pool_docs.size == 0:
        return _empty_topk()
    sel = np.lexsort((pool_docs, -pool_scores))[:k]
    return pd.DataFrame({
        "doc_id": pool_docs[sel].astype("int64"),
        "score": pool_scores[sel],
    })
