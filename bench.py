"""Benchmark harness (driver contract: prints ONE JSON line).

Three sections:
  1. scaling  — identical index build (synthetic code corpus) at
     local[N/4] and local[N]: docs/sec at both + scaling efficiency
     throughput(4N) / (4 * throughput(N)) — the sandbox stand-in for the
     north rule's N-vs-4N-executor criterion (BASELINE.md §2).
  2. bm25     — warm segment-index top-k latency over the fixed reference
     query set (p50/p95 ms).
  3. queries  — headline catalog queries at $SPARK_GRAFT_SF_DIR, wall
     seconds each.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_CORPUS_DOCS (default 24000).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "60000"))
N_SHARDS = 8  # corpus-determined, NOT core-count-determined: docIDs and the
              # index must be identical at every parallelism (determinism test)

HEADLINE = [
    "ft_bm25_topk",
    "ft_bm25_engine_topk",
    "ft_term_stats",
    "ft_minhash_signatures",
    "ft_lsh_pairs",
    "ft_simhash",
    "ft_exact_dedup",
    "ft_quality",
    "ft_langid",
    "emb_knn",
    "emb_near_dup",
    "rel_pricing_summary",
    "rel_top_revenue",
    "rel_change_classification",
    "str_windowed_counts",
    "str_sessionize",
]


def build_once(cores: int, n_docs: int) -> float:
    """One full index build at the given parallelism; returns wall sec."""
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.session import get_spark, stop_spark
    from data_prep_opensearch_spark.sources.corpus import corpus_df

    stop_spark()
    spark = get_spark(app_name=f"bench_build_{cores}", cores=cores)
    d = tempfile.mkdtemp(prefix=f"bench_idx_{cores}_")
    try:
        src = corpus_df(spark, n_docs, partitions=cores * 2)
        t0 = time.monotonic()
        build_index(spark, src, d, n_shards=N_SHARDS, n_groups=1)
        return time.monotonic() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
        stop_spark()


def main() -> None:
    result: dict = {"metric": "engine_bench", "unit": "sec", "sf": SF_DIR}

    # --- 1. scaling: N vs 4N cores on the SAME input ------------------
    low = max(CPUS // 4, 2)
    t_low = build_once(low, CORPUS_DOCS)
    t_high = build_once(CPUS, CORPUS_DOCS)
    thr_low = CORPUS_DOCS / t_low
    thr_high = CORPUS_DOCS / t_high
    result["index_build"] = {
        "docs": CORPUS_DOCS,
        f"local{low}_sec": round(t_low, 2),
        f"local{CPUS}_sec": round(t_high, 2),
        f"local{low}_docs_per_sec": round(thr_low, 1),
        f"local{CPUS}_docs_per_sec": round(thr_high, 1),
        "scaling_efficiency": round(thr_high / (thr_low * (CPUS / low)), 3),
    }

    # --- 2 + 3 on one warm session at full parallelism ----------------
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.index_build import build_index, sort_segments
    from data_prep_opensearch_spark.oracle import reference_query_set
    from data_prep_opensearch_spark.plans.queries import REGISTRY, load
    from data_prep_opensearch_spark.session import get_spark
    from data_prep_opensearch_spark.sources.corpus import corpus_df

    spark = get_spark(app_name="bench_queries", cores=CPUS)

    # warm index over the synthetic corpus for latency measurement
    idx_dir = tempfile.mkdtemp(prefix="bench_qidx_")
    try:
        build_index(spark, corpus_df(spark, CORPUS_DOCS), idx_dir,
                    n_shards=N_SHARDS, n_groups=1)
        sort_segments(spark, idx_dir)
        engine = BM25Engine(spark, idx_dir, cache=True)
        result["bm25"] = {"corpus_docs": CORPUS_DOCS}
        for scorer in ("wand", "auto"):
            lat_ms = []
            for q in reference_query_set():
                t0 = time.monotonic()
                engine.topk(q["query"], q["k"], scorer=scorer).collect()
                lat_ms.append((time.monotonic() - t0) * 1000)
            lat_sorted = sorted(lat_ms)
            result["bm25"][scorer] = {
                "n_queries": len(lat_ms),
                "p50_ms": round(statistics.median(lat_sorted), 1),
                "p95_ms": round(lat_sorted[int(0.95 * (len(lat_sorted) - 1))], 1),
            }
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # headline catalog queries at SF_DIR
    queries: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.monotonic()
        try:
            n = fn(spark, SF_DIR).count()
        except Exception as exc:  # record, don't die
            queries[name] = -1.0
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            continue
        wall = time.monotonic() - t0
        queries[name] = round(wall, 3)
        total += wall
    result["queries"] = queries
    result["value"] = round(total, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
