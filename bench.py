"""Benchmark harness. Prints the full detail JSON line, then a COMPACT
summary JSON line LAST (the driver-parseable record — r3's single grown
line outran the driver's tail window and recorded `parsed: null`); the
full detail also lands in BENCH_DETAIL.json.

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
       c. STEAL METER — a single-thread numpy loop runs CONCURRENTLY
          with every build, pinned to a CPU OUTSIDE the build's set, and
          reports its iteration rate over the exact build window.
          External hypervisor steal slows the meter and the build by the
          same factor (measured adjacent identical builds vary ±75% on
          this VM); each wall is normalized by meter_rate / best_rate.
       d. CPU-SET ROTATION — each trial pins to a different cpu range;
          contention on this VM is sticky to particular vCPUs.
       e. Headline ``scaling_efficiency`` = ratio of MIN normalized
          walls (contamination is additive, so the fastest rotated trial
          is the cleanest); per-pair efficiencies are also reported —
          their median runs HIGH because the longer low-parallelism run
          absorbs more steal than its paired high run.
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
TRIALS = int(os.environ.get("BENCH_TRIALS", "6"))
CPUS_PER_SLOT = 2  # 1 JVM task thread + 1 python worker per task slot
N_SHARDS = 128  # corpus-determined, NOT core-count-determined: docIDs and
                # the index must be identical at every parallelism.
                # 128 (not 32): the docID window shuffle hash-partitions
                # the SHARD column, so with shards == partitions the
                # balls-into-bins collisions leave ~40% of partitions
                # empty and hand one task 3 shards — a tokenize-stage
                # straggler that capped measured 2->8-slot scaling at
                # ~0.5. At 4x-partitions-per-shard granularity the
                # collision skew averages out (max/avg ~1.7 vs 3.0) and
                # the stage packs evenly at every slot count.

HEADLINE = [
    "ft_bm25_topk",
    "ft_bm25_engine_topk",
    "ft_bm25_code_topk",
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
    "rel_translations_merge",
    "mm_binary_detect",
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


_METER_CODE = r"""
import json, signal, sys, time
import numpy as np
stop = [False]
signal.signal(signal.SIGTERM, lambda *a: stop.__setitem__(0, True))
a = np.arange(200_000, dtype=np.float64)
for _ in range(20):                       # warm caches before t0
    a = np.sqrt(a * 1.0000001 + 1.0)
iters, t0 = 0, time.monotonic()
while not stop[0]:
    a = np.sqrt(a * 1.0000001 + 1.0)
    iters += 1
print(json.dumps({"iters": iters, "wall": time.monotonic() - t0}), flush=True)
"""


def build_once_subprocess(
    cores: int, n_docs: int, src_dir: str, pin: bool = True, cpu_offset: int = 0
) -> tuple[float, float]:
    """Run one timed build in a fresh process/JVM (session churn inside one
    JVM contaminates timings), pinned to CPUS_PER_SLOT × cores CPUs so the
    run is a faithful N-slot 'virtual executor' (module docstring a).
    ``cpu_offset`` rotates the pinned set between trials: host-side
    contention on this VM is sticky to particular vCPUs (adjacent
    identical runs on one set varied 3x while a meter on another cpu
    barely moved), so rotating decorrelates trials from a hot host core.
    A steal meter runs concurrently on a cpu outside the build's set.
    Returns (wall_sec, meter_rate)."""
    cmd = [sys.executable, os.path.abspath(__file__), "--build-once",
           str(cores), str(n_docs), src_dir]
    meter_cmd = [sys.executable, "-c", _METER_CODE]
    have_taskset = bool(shutil.which("taskset"))
    n_machine = os.cpu_count() or 1
    if pin and have_taskset:
        n_cpus = min(CPUS_PER_SLOT * cores, n_machine)
        cpus = [(cpu_offset + j) % n_machine for j in range(n_cpus)]
        cmd = ["taskset", "-c", ",".join(map(str, cpus))] + cmd
        meter_cmd = ["taskset", "-c",
                     str((cpu_offset + n_cpus) % n_machine)] + meter_cmd
    meter = subprocess.Popen(meter_cmd, stdout=subprocess.PIPE, text=True)
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
    finally:
        meter.terminate()
    m_out, _ = meter.communicate(timeout=60)
    m = json.loads(m_out.strip().splitlines()[-1])
    rate = m["iters"] / max(m["wall"], 1e-9)
    for line in out.stdout.splitlines():
        if line.startswith("WALL "):
            return float(line.split()[1]), rate
    raise RuntimeError(f"build subprocess failed: {out.stderr[-2000:]}")


# streaming meter for the query section: prints (wall-clock, iters)
# samples so the parent can compute the steal rate inside ANY window
_METER_STREAM_CODE = r"""
import json, signal, sys, time
import numpy as np
stop = [False]
signal.signal(signal.SIGTERM, lambda *a: stop.__setitem__(0, True))
a = np.arange(200_000, dtype=np.float64)
for _ in range(20):
    a = np.sqrt(a * 1.0000001 + 1.0)
iters, last = 0, time.time()
print(json.dumps({"t": time.time(), "iters": 0}), flush=True)
while not stop[0]:
    a = np.sqrt(a * 1.0000001 + 1.0)
    iters += 1
    now = time.time()
    if now - last >= 0.25:
        print(json.dumps({"t": now, "iters": iters}), flush=True)
        last = now
"""


class _StreamMeter:
    """Steal meter for the query section (round-2 VERDICT asked for
    contention context on per-query walls). The meter pins to the LAST
    cpu; the bench process (and the query JVM it spawns) is affined to
    the remaining cpus, so the meter measures EXTERNAL contention, not
    our own Spark load. Cost: one of 32 cpus (~3%), documented in the
    protocol string."""

    def __init__(self) -> None:
        import threading

        self.samples: list[tuple[float, int]] = []
        self.proc = None
        self._thread: threading.Thread | None = None
        n = os.cpu_count() or CPUS
        self.meter_cpu: int | None = n - 1 if n >= 4 else None
        if self.meter_cpu is None or not shutil.which("taskset"):
            self.meter_cpu = None
            return
        try:
            os.sched_setaffinity(0, set(range(n - 1)))
        except (AttributeError, OSError):
            self.meter_cpu = None
            return
        self.proc = subprocess.Popen(
            ["taskset", "-c", str(self.meter_cpu), sys.executable, "-c",
             _METER_STREAM_CODE],
            stdout=subprocess.PIPE, text=True,
        )

        def reader():
            for line in self.proc.stdout:
                try:
                    m = json.loads(line)
                    self.samples.append((float(m["t"]), int(m["iters"])))
                except Exception:
                    pass

        self._thread = threading.Thread(target=reader, daemon=True)
        self._thread.start()

    def rate(self, t0: float, t1: float) -> float | None:
        """Mean meter iterations/sec inside wall-clock window [t0, t1]."""
        inside = [s for s in self.samples if t0 <= s[0] <= t1]
        if len(inside) < 2:
            return None
        (ta, ia), (tb, ib) = inside[0], inside[-1]
        return (ib - ia) / (tb - ta) if tb > ta else None

    def stop(self) -> None:
        if self.proc is not None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=10)
            except Exception:
                self.proc.kill()
        if self._thread is not None:
            self._thread.join(timeout=5)
        n = os.cpu_count() or CPUS
        try:
            os.sched_setaffinity(0, set(range(n)))
        except (AttributeError, OSError):
            pass


def _scratch_root() -> str:
    """RAM-backed scratch when available: the scaling measurement is of
    the ENGINE's compute, and this VM's /tmp disk shows multi-x latency
    bursts under co-tenant IO that a cpu steal-meter cannot see. tmpfs
    takes the disk out of the measured quantity."""
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _build_once_main(cores: int, n_docs: int, src_dir: str) -> None:
    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.session import get_spark

    # shuffle granularity must scale WITH the slot count (4 waves of
    # equal-size tasks): a fixed 8 partitions makes local[8] one
    # straggler-bound wave while local[2] averages over 4 waves — that
    # alone cost ~2x at the high level (round-2 probe)
    scratch = tempfile.mkdtemp(prefix="bench_spark_local_", dir=_scratch_root())
    spark = get_spark(app_name=f"bench_build_{cores}", cores=cores,
                      shuffle_partitions=max(4 * cores, 8),
                      extra_conf={"spark.local.dir": scratch})
    _warm_workers(spark, cores)
    d = tempfile.mkdtemp(prefix=f"bench_idx_{cores}_", dir=_scratch_root())
    try:
        src = spark.read.parquet(src_dir)
        t0 = time.monotonic()
        build_index(spark, src, d, n_shards=N_SHARDS, n_groups=1)
        print(f"WALL {time.monotonic() - t0:.3f}")
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


def _cached_bytes(spark) -> int:
    """Executor storage-memory occupancy (bytes of cached RDD blocks) —
    recorded per bench section so a cache left resident by one section
    can be attributed when it taxes the next (r3 'what's wrong' #3)."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return int(sum(i.memSize() for i in infos))
    except Exception:
        return -1


def main() -> None:
    result: dict = {"metric": "engine_bench_detail", "unit": "sec", "sf": SF_DIR}

    from data_prep_opensearch_spark.session import get_spark
    from data_prep_opensearch_spark.sources.corpus import corpus_df

    # stage the synthetic corpus to parquet ONCE (untimed): the engine's
    # input contract is a table scan, not a generator. RAM-backed scratch
    # (see _scratch_root) keeps the sandbox disk out of the measurement.
    corpus_dir = os.path.join(_scratch_root(), f"bench_corpus_{CORPUS_DOCS}")
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
    n_machine = os.cpu_count() or 32
    lows, highs = [], []          # (wall_sec, meter_rate) per trial
    for t in range(TRIALS):
        order = [(LOW, lows), (high, highs)]
        if t % 2 == 1:
            order.reverse()
        for cores, sink in order:
            off = (t * (CPUS_PER_SLOT * high + 1)) % n_machine
            sink.append(build_once_subprocess(
                cores, CORPUS_DOCS, corpus_dir, cpu_offset=off))
    best_rate = max(r for _, r in lows + highs)
    lows_n = [w * (r / best_rate) for w, r in lows]
    highs_n = [w * (r / best_rate) for w, r in highs]
    pair_eff = [wl / ((high / LOW) * wh) for wl, wh in zip(lows_n, highs_n)]
    # HEADLINE estimator: min wall at each level. External contamination
    # is strictly additive, so the fastest of 5 rotated trials is the
    # cleanest estimate of the true wall; per-pair medians OVERESTIMATE
    # (the longer low-parallelism run absorbs more steal than its paired
    # high run, inflating the ratio — observed medians > 1.0).
    t_low, t_high = min(lows_n), min(highs_n)
    thr_low = CORPUS_DOCS / t_low
    thr_high = CORPUS_DOCS / t_high
    result["index_build"] = {
        "docs": CORPUS_DOCS,
        "protocol": (
            f"taskset {CPUS_PER_SLOT}cpu/slot virtual executors, rotated "
            f"cpu sets; {TRIALS} interleaved pairs; concurrent steal-meter "
            "normalization; efficiency from min (cleanest) walls"
        ),
        f"local{LOW}_sec": round(t_low, 2),
        f"local{high}_sec": round(t_high, 2),
        f"local{LOW}_trials_sec": [round(w, 1) for w, _ in lows],
        f"local{high}_trials_sec": [round(w, 1) for w, _ in highs],
        "meter_rates": [round(r, 1) for _, r in lows + highs],
        f"local{LOW}_docs_per_sec": round(thr_low, 1),
        f"local{high}_docs_per_sec": round(thr_high, 1),
        "pair_efficiencies": [round(e, 3) for e in pair_eff],
        "pair_efficiency_median": round(statistics.median(pair_eff), 3),
        "scaling_efficiency": round(thr_high / (thr_low * (high / LOW)), 3),
    }

    # --- 2 + 3 on one warm session at full parallelism -----------------
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.index_build import (
        build_index,
        sort_segments,
    )
    from data_prep_opensearch_spark.oracle import reference_query_set
    from data_prep_opensearch_spark.plans.queries import REGISTRY

    meter = _StreamMeter()  # affines us to cpus 0..n-2 BEFORE the JVM spawns
    # RAM-backed spark.local.dir: the query section's shuffle spills
    # otherwise land on the sandbox disk, whose co-tenant IO bursts are
    # INVISIBLE to the cpu steal-meter (r3 observed 3-5x walls on
    # shuffle-heavy queries with a clean meter — disk, not cpu)
    qscratch = tempfile.mkdtemp(prefix="bench_qlocal_", dir=_scratch_root())
    spark = get_spark(app_name="bench_queries", cores=CPUS,
                      extra_conf={"spark.local.dir": qscratch})
    _warm_workers(spark, CPUS)

    idx_dir = tempfile.mkdtemp(prefix="bench_qidx_", dir=_scratch_root())
    engine = None
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
            # min of 2 timed reps per query (additive-contamination
            # estimator, same as the scaling + catalog sections)
            lat_ms = []
            w0 = time.time()
            for q in reference_query_set():
                reps = []
                for _ in range(2):
                    t0 = time.monotonic()
                    engine.topk(q["query"], q["k"], scorer=scorer).collect()
                    reps.append((time.monotonic() - t0) * 1000)
                lat_ms.append(min(reps))
            rate = meter.rate(w0, time.time())
            lat_sorted = sorted(lat_ms)
            result["bm25"][scorer] = {
                "n_queries": len(lat_ms),
                "p50_ms": round(statistics.median(lat_sorted), 1),
                "p95_ms": round(lat_sorted[int(0.95 * (len(lat_sorted) - 1))], 1),
                "meter_rate": round(rate, 1) if rate is not None else None,
            }
        # driver-local latency tier: zero Spark jobs warm (the single-
        # query answer to the scheduling floor); min of 2 reps — rep 1
        # of each query pays the one-off cold fetch, rep 2 is warm
        lat_local, lat_local_pd = [], []
        for q in reference_query_set():
            reps, reps_pd = [], []
            for _ in range(2):
                t0 = time.monotonic()
                engine.topk_local(q["query"], q["k"]).collect()
                reps.append((time.monotonic() - t0) * 1000)
                t0 = time.monotonic()
                engine.topk_local(q["query"], q["k"], as_pandas=True)
                reps_pd.append((time.monotonic() - t0) * 1000)
            lat_local.append(min(reps))
            lat_local_pd.append(min(reps_pd))
        for tag, lat in (("local", lat_local), ("local_pd", lat_local_pd)):
            ls = sorted(lat)
            result["bm25"][tag] = {
                "n_queries": len(ls),
                "p50_ms": round(statistics.median(ls), 1),
                "p95_ms": round(ls[int(0.95 * (len(ls) - 1))], 1),
            }

        # batched path: all reference queries in ONE Spark job (the scale
        # answer to the ~0.4s per-job scheduling floor); min of 2 reps
        qs = [q["query"] for q in reference_query_set()]
        kk = max(q["k"] for q in reference_query_set())
        batch_walls = []
        for _ in range(2):
            t0 = time.monotonic()
            engine.topk_batch(qs, kk, scorer="auto").collect()
            batch_walls.append(time.monotonic() - t0)
        result["bm25"]["batch"] = {
            "n_queries": len(qs),
            "ms_per_query": round(min(batch_walls) * 1000 / len(qs), 1),
            "wall_sec": round(min(batch_walls), 3),
        }
        result["storage_bytes_bm25_section"] = _cached_bytes(spark)
    finally:
        # release the 500k-doc engine caches BEFORE the catalog loop:
        # r3 left them resident and the relational catalog queries paid
        # 3x walls (clean steal meters, unchanged plans — GC/memory
        # pressure from ~the whole executor storage pool being pinned)
        if engine is not None:
            engine.unpersist()
        shutil.rmtree(idx_dir, ignore_errors=True)
    result["storage_bytes_after_unpersist"] = _cached_bytes(spark)

    # engine-backed queries build-and-cache a /tmp index on first touch
    # (keyed by package + index-format version). Warm them UNTIMED so the
    # timed number is "query a built index" — the build itself is
    # benchmarked in section 1; without this, a version bump makes the
    # recorded wall a one-off cold build (r2->r3: 1.6s -> 15.8s artifact).
    for name in ("ft_bm25_engine_topk", "ft_engine_latest_prune",
                 "ft_bm25_code_topk"):
        if name in REGISTRY:
            try:
                REGISTRY[name].fn(spark, SF_DIR).count()
            except Exception:
                pass
    result["engine_queries_prewarmed"] = True
    result["storage_bytes_catalog_section"] = _cached_bytes(spark)

    # each query runs TWICE; the headline wall is the MIN (same estimator
    # philosophy as the scaling section: contamination and first-use JVM
    # warmup — plan analysis + Janino codegen of large generated classes,
    # measured ~8s on the biggest expression trees — are strictly
    # additive). The cold first-run wall is recorded alongside.
    queries: dict[str, float] = {}
    queries_cold: dict[str, float] = {}
    query_meter: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        walls, rates = [], []
        failed = False
        for rep in range(2):
            t0 = time.monotonic()
            w0 = time.time()
            try:
                fn(spark, SF_DIR).count()
            except Exception as exc:
                queries[name] = -1.0
                print(f"bench query {name} failed: {exc}", file=sys.stderr)
                failed = True
                break
            walls.append(time.monotonic() - t0)
            rates.append(meter.rate(w0, time.time()))
        if failed:
            continue
        best = min(range(2), key=lambda i: walls[i])
        if rates[best] is not None:
            query_meter[name] = round(rates[best], 1)
        queries[name] = round(walls[best], 3)
        queries_cold[name] = round(walls[0], 3)
        total += walls[best]
    meter.stop()
    result["queries_cold"] = queries_cold
    result["queries"] = queries
    if query_meter:
        best = max(query_meter.values())
        result["query_meter_rates"] = query_meter
        # wall normalized by the window's external-steal factor — the
        # number to compare ACROSS rounds (raw walls carry weather)
        result["queries_normalized"] = {
            n: round(queries[n] * (query_meter[n] / best), 3)
            for n in query_meter
            if queries.get(n, -1) > 0
        }
        result["query_meter_note"] = (
            "meter pinned to last cpu, bench+JVM affined to the rest; "
            "rate = external-contention proxy per query window"
        )
    result["value"] = round(total, 3)
    spark.stop()
    shutil.rmtree(qscratch, ignore_errors=True)

    # Output protocol (r3 post-mortem: the grown single JSON line outran
    # the driver's stdout tail window, so BENCH_r03.json recorded
    # `parsed: null` and the round's scaling number never reached the
    # driver record). Three artifacts now:
    #   1. BENCH_DETAIL.json — the full result (trials, meter rates,
    #      cold walls, normalized walls) committed as a side file;
    #   2. the full detail line (metric engine_bench_detail), printed
    #      first — best-effort;
    #   3. a COMPACT summary as the LAST stdout line (<2 KB): the driver
    #      contract fields (metric/value/unit/sf/queries) plus the
    #      headline scaling + latency numbers, so the tail window always
    #      holds one complete parseable record.
    ib = result.get("index_build", {})
    summary = {
        "metric": "engine_bench",
        "value": result["value"],
        "unit": "sec",
        "sf": SF_DIR,
        "queries": queries,
        "scaling_efficiency": ib.get("scaling_efficiency"),
        f"local{LOW}_sec": ib.get(f"local{LOW}_sec"),
        f"local{LOW * 4}_sec": ib.get(f"local{LOW * 4}_sec"),
        f"local{LOW * 4}_docs_per_sec": ib.get(f"local{LOW * 4}_docs_per_sec"),
        "bm25_p50_ms": {
            s: result.get("bm25", {}).get(s, {}).get("p50_ms")
            for s in ("wand", "auto", "local", "local_pd")
        },
        "bm25_batch_ms_per_query": result.get("bm25", {})
        .get("batch", {})
        .get("ms_per_query"),
        "detail": "BENCH_DETAIL.json",
    }
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass
    print(json.dumps(result))
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--build-once":
        _build_once_main(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
