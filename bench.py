"""Benchmark harness (driver contract: prints ONE JSON line).

Sections:
  1. index_build — the same index build (synthetic code corpus, staged to
     parquet once, untimed) at local[N] and local[4N], each in a FRESH
     subprocess/JVM: docs/sec at both + scaling efficiency
     throughput(4N) / (4 * throughput(N)) — the sandbox stand-in for the
     north rule's N-vs-4N-executor criterion (BASELINE.md §2).

     Measurement protocol (round-2, after the 0.477-on-record artifact):
       a. VIRTUAL EXECUTORS — each run is pinned with ``taskset`` to
          2 CPUs per task slot (one JVM task thread + one python worker),
          so local[N] is genuinely N-slot-resource-constrained. Unpinned,
          the local[2] JVM borrows the machine's idle cores for GC/
          shuffle/codegen, inflating low-parallelism throughput and
          deflating the measured ratio — that is a measurement artifact,
          not a property of the engine.
       b. INTERLEAVED PAIRS — BENCH_TRIALS (default 5) low/high pairs,
          alternating which level runs first, so slow drift in external
          steal cancels in the per-pair ratio.
       c. STEAL CALIBRATION — a fixed single-thread numpy burn is timed
          immediately before every trial; each wall is normalized by its
          burn's slowdown vs the fastest burn observed.
       d. Headline ``scaling_efficiency`` = MEDIAN of per-pair
          efficiencies from normalized walls (min-of-trials throughputs
          are also reported).
  2. bm25 — warm segment-index top-k latency over the fixed reference
     query set (p50/p95 ms), wand and auto scorers (one untimed warmup
     pass resolves the term dictionary, as a warm engine would be).
  3. queries — headline catalog queries at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_CORPUS_DOCS (default 500000),
     BENCH_LOW_CORES (default 2), BENCH_TRIALS (default 5).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CORPUS_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "500000"))
LOW = int(os.environ.get("BENCH_LOW_CORES", "2"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
CPUS_PER_SLOT = 2  # 1 JVM task thread + 1 python worker per task slot
N_SHARDS = 32  # corpus-determined, NOT core-count-determined: docIDs and
               # the index must be identical at every parallelism

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
    "ft_clean_content",
    "ft_chunks",
    "ft_url_classify",
    "emb_knn",
    "emb_near_dup",
    "rel_pricing_summary",
    "rel_top_revenue",
    "rel_change_classification",
    "str_windowed_counts",
    "str_sessionize",
]


def _warm_workers(spark, cores: int) -> None:
    """One-time python-worker spawn + pandas/pyarrow import storm — paid
    before t0 so throughput reflects steady state, not environment setup."""
    import pandas as pd

    def warm(batches):
        import numpy  # noqa: F401
        import pyarrow.compute  # noqa: F401

        for _ in batches:
            pass
        yield pd.DataFrame({"x": [1]})

    spark.range(0, cores * 2, 1, cores * 2).mapInPandas(warm, "x long").count()


def build_once_subprocess(
    cores: int, n_docs: int, src_dir: str, pin: bool = True
) -> float:
    """Run one timed build in a fresh process/JVM (session churn inside one
    JVM contaminates timings), pinned to CPUS_PER_SLOT × cores CPUs so the
    run is a faithful N-slot 'virtual executor' (module docstring a)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--build-once",
           str(cores), str(n_docs), src_dir]
    if pin and shutil.which("taskset"):
        n_cpus = min(CPUS_PER_SLOT * cores, os.cpu_count() or 1)
        cmd = ["taskset", "-c", f"0-{n_cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WALL "):
            return float(line.split()[1])
    raise RuntimeError(f"build subprocess failed: {out.stderr[-2000:]}")


def steal_burn() -> float:
    """Fixed single-thread numpy workload timed in-process. External CPU
    steal inflates this the same way it inflates a build wall; the ratio
    to the fastest observed burn is the normalization factor."""
    import numpy as np

    a = np.arange(1_500_000, dtype=np.float64)
    t0 = time.monotonic()
    for _ in range(60):
        a = np.sqrt(a * 1.0000001 + 1.0)
    _ = float(a.sum())
    return time.monotonic() - t0


def _build_once_main(cores: int, n_docs: int, src_dir: str) -> None:
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.session import get_spark

    spark = get_spark(app_name=f"bench_build_{cores}", cores=cores)
    _warm_workers(spark, cores)
    d = tempfile.mkdtemp(prefix=f"bench_idx_{cores}_")
    try:
        src = spark.read.parquet(src_dir)
        t0 = time.monotonic()
        build_index(spark, src, d, n_shards=N_SHARDS, n_groups=1)
        print(f"WALL {time.monotonic() - t0:.3f}")
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


def main() -> None:
    result: dict = {"metric": "engine_bench", "unit": "sec", "sf": SF_DIR}

    from data_prep_opensearch_spark.session import get_spark
    from data_prep_opensearch_spark.sources.corpus import corpus_df

    # stage the synthetic corpus to parquet ONCE (untimed): the engine's
    # input contract is a table scan, not a generator
    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{CORPUS_DOCS}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        spark = get_spark(app_name="bench_prepare", cores=CPUS)
        corpus_df(spark, CORPUS_DOCS, partitions=CPUS * 2).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        spark.stop()

    # --- 1. scaling: N vs 4N virtual executors, same input -------------
    # Protocol (module docstring): pinned CPU sets, interleaved pairs,
    # steal-calibration burns, median of per-pair efficiencies.
    high = LOW * 4
    lows, highs = [], []          # (burn_sec, wall_sec) per trial
    for t in range(TRIALS):
        order = [(LOW, lows), (high, highs)]
        if t % 2 == 1:
            order.reverse()
        for cores, sink in order:
            b = steal_burn()
            w = build_once_subprocess(cores, CORPUS_DOCS, corpus_dir)
            sink.append((b, w))
    min_burn = min(b for b, _ in lows + highs)
    lows_n = [w * (min_burn / b) for b, w in lows]
    highs_n = [w * (min_burn / b) for b, w in highs]
    pair_eff = [wl / ((high / LOW) * wh) for wl, wh in zip(lows_n, highs_n)]
    pair_eff_sorted = sorted(pair_eff)
    eff_median = pair_eff_sorted[len(pair_eff_sorted) // 2] if TRIALS % 2 else \
        statistics.median(pair_eff_sorted)
    t_low, t_high = min(lows_n), min(highs_n)
    thr_low = CORPUS_DOCS / t_low
    thr_high = CORPUS_DOCS / t_high
    result["index_build"] = {
        "docs": CORPUS_DOCS,
        "protocol": (
            f"taskset {CPUS_PER_SLOT}cpu/slot; {TRIALS} interleaved pairs; "
            "steal-burn normalized; median of per-pair efficiencies"
        ),
        f"local{LOW}_sec": round(t_low, 2),
        f"local{high}_sec": round(t_high, 2),
        f"local{LOW}_trials_sec": [round(w, 1) for _, w in lows],
        f"local{high}_trials_sec": [round(w, 1) for _, w in highs],
        "burns_sec": [round(b, 2) for b, _ in lows + highs],
        f"local{LOW}_docs_per_sec": round(thr_low, 1),
        f"local{high}_docs_per_sec": round(thr_high, 1),
        "pair_efficiencies": [round(e, 3) for e in pair_eff],
        "scaling_efficiency": round(eff_median, 3),
        "scaling_efficiency_minwall": round(thr_high / (thr_low * (high / LOW)), 3),
    }

    # --- 2 + 3 on one warm session at full parallelism -----------------
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.index_build import (
        build_index,
        sort_segments,
    )
    from data_prep_opensearch_spark.oracle import reference_query_set
    from data_prep_opensearch_spark.plans.queries import REGISTRY

    spark = get_spark(app_name="bench_queries", cores=CPUS)
    _warm_workers(spark, CPUS)

    idx_dir = tempfile.mkdtemp(prefix="bench_qidx_")
    try:
        build_index(spark, spark.read.parquet(corpus_dir), idx_dir,
                    n_shards=N_SHARDS, n_groups=1)
        sort_segments(spark, idx_dir)
        engine = BM25Engine(spark, idx_dir, cache=True)
        # one untimed warmup pass: resolves each query's term dfs into the
        # engine's dictionary cache (a warm engine's steady state; cold
        # dictionary resolution is one extra tiny filtered-scan job)
        for q in reference_query_set():
            engine.topk(q["query"], q["k"], scorer="dense").collect()
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

    queries: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.monotonic()
        try:
            fn(spark, SF_DIR).count()
        except Exception as exc:
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
    if len(sys.argv) > 1 and sys.argv[1] == "--build-once":
        _build_once_main(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
