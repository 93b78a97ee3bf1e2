"""Manifest-pointer commits for the on-disk index layout.

The round-1 layout published changes with whole-directory ``os.replace``
swaps (segments.tmp -> segments). That is atomic on one POSIX filesystem
and NOWHERE else — object stores have no atomic directory rename. This
module replaces every directory swap with the pattern the reference uses
for its latest-pointer (pipeline/io.py:36-76 resolve-latest +
io.py:28-33 atomic_write_json): writers append NEW immutable parquet
directories, then commit by atomically rewriting ONE small JSON file
(``manifest.json``) that lists the live directories. A single small-file
replace is a PUT on object storage — the only atomic primitive needed.

Manifest format (all paths relative to index_dir):

    {
      "version": 3,
      "segments": [{"path": "seg_b0_g0", "gens": [0]}, ...],
      "doclens":  ["dl_b0_g0", "dl_delta_g1", ...],
      "doc_stats": ["staged/group=0/kind=1", ...]
    }

Semantics:
  - ``segments``: union of all listed dirs is the live segment table;
    ``gens`` records which posting generations a dir holds so the
    log-structured merge can retire exactly the dirs it consumed.
  - ``doclens``: ordered; a LATER entry overrides an EARLIER one per
    shard (delta adds re-encode only the shards they touched).
  - ``doc_stats``: unioned; vacuum replaces the whole list.

Writers that re-run after a crash write to the SAME deterministic dir
name with mode("overwrite") and re-publish the same manifest entry —
commits are idempotent (the duplicate-append window flagged in round 1
is closed). Consumed dirs are RETIRED after the manifest swap: recorded
in the manifest's ``retired`` ledger and deleted only once they age past
$DPOSS_GC_GRACE_SEC (retire_paths/gc_retired), so on shared storage a
reader holding the previous manifest finishes its scan against dirs
that still exist.

Fallback: an index_dir with no manifest.json (hand-built test fixtures)
is read via the legacy flat directories (segments/, doclens/,
doc_stats/); ``adopt_legacy`` converts one in place so merge/sort/add
can manage it through the manifest path.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

MANIFEST = "manifest.json"


def load_manifest(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_manifest(index_dir: str, m: dict) -> None:
    tmp = os.path.join(index_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, MANIFEST))  # single-file atomic


def new_manifest() -> dict:
    return {"version": 0, "segments": [], "doclens": [], "doc_stats": []}


def update_manifest(index_dir: str, mutate) -> dict:
    """Read-modify-publish under the single-writer lock (locks.py)."""
    m = load_manifest(index_dir) or new_manifest()
    mutate(m)
    m["version"] = int(m.get("version", 0)) + 1
    save_manifest(index_dir, m)
    return m


def add_segment_entry(m: dict, rel: str, gens: list[int]) -> None:
    for e in m["segments"]:
        if e["path"] == rel:
            e["gens"] = sorted(set(e["gens"]) | set(gens))
            return
    m["segments"].append({"path": rel, "gens": sorted(gens)})


def add_unique(lst: list[str], rel: str) -> None:
    if rel not in lst:
        lst.append(rel)


def adopt_legacy(spark: SparkSession, index_dir: str) -> dict:
    """Wrap a legacy flat-directory index in a manifest (in place)."""
    m = new_manifest()
    seg_dir = os.path.join(index_dir, "segments")
    if os.path.exists(seg_dir):
        gens = sorted(
            int(r["gen"])
            for r in spark.read.parquet(seg_dir).select("gen").distinct().collect()
        )
        m["segments"].append({"path": "segments", "gens": gens})
    if os.path.exists(os.path.join(index_dir, "doclens")):
        m["doclens"].append("doclens")
    if os.path.exists(os.path.join(index_dir, "doc_stats")):
        m["doc_stats"].append("doc_stats")
    save_manifest(index_dir, m)
    return m


def _abs(index_dir: str, rel: str) -> str:
    return os.path.join(index_dir, rel)


def read_segments(spark: SparkSession, index_dir: str) -> DataFrame:
    m = load_manifest(index_dir)
    if m is None:
        return spark.read.parquet(os.path.join(index_dir, "segments"))
    paths = [_abs(index_dir, e["path"]) for e in m["segments"]]
    if not paths:
        raise FileNotFoundError(f"no live segments in {index_dir}/{MANIFEST}")
    return spark.read.parquet(*paths)


def read_doc_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Union of live doc_stats dirs; per-path reads + unionByName so dirs
    written at different times (e.g. a vacuumed dir carrying _gen next to
    fresh delta dirs without it) merge safely."""
    m = load_manifest(index_dir)
    if m is None:
        return spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    if not m["doc_stats"]:
        raise FileNotFoundError(f"no live doc_stats in {index_dir}/{MANIFEST}")
    parts = [spark.read.parquet(_abs(index_dir, p)) for p in m["doc_stats"]]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p, allowMissingColumns=True)
    return df


_DELTA_GEN = re.compile(r"delta_gen=(\d+)")


def read_doc_stats_with_gen(spark: SparkSession, index_dir: str) -> DataFrame:
    """doc_stats with a ``_gen`` column = the posting generation each row
    was indexed in (0 for the base build). The generation is recovered
    from the manifest entry's path (staged/delta_gen=K/kind=1); a
    vacuumed dir already carries ``_gen`` as a real column and keeps it.
    Used by the latest-version pruning policy (superseded_doc_ids)."""
    m = load_manifest(index_dir)
    if m is None:
        df = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
        return df if "_gen" in df.columns else df.withColumn("_gen", F.lit(0))
    if not m["doc_stats"]:
        raise FileNotFoundError(f"no live doc_stats in {index_dir}/{MANIFEST}")
    parts = []
    for p in m["doc_stats"]:
        df = spark.read.parquet(_abs(index_dir, p))
        if "_gen" not in df.columns:
            mm = _DELTA_GEN.search(p)
            df = df.withColumn("_gen", F.lit(int(mm.group(1)) if mm else 0))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def read_doclens(spark: SparkSession, index_dir: str) -> DataFrame:
    """Live per-shard doclen sidecar: later manifest entries override
    earlier ones per shard (delta adds re-encode touched shards only)."""
    m = load_manifest(index_dir)
    if m is None:
        return spark.read.parquet(os.path.join(index_dir, "doclens"))
    if not m["doclens"]:
        raise FileNotFoundError(f"no live doclens in {index_dir}/{MANIFEST}")
    if len(m["doclens"]) == 1:
        # single live dir (fresh build / post-merge steady state): no
        # override ranking to compute — skip the window's shuffle, which
        # costs every query an extra exchange round
        return spark.read.parquet(_abs(index_dir, m["doclens"][0]))
    parts = [
        spark.read.parquet(_abs(index_dir, p)).withColumn("_ord", F.lit(i))
        for i, p in enumerate(m["doclens"])
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    w = Window.partitionBy("shard").orderBy(F.desc("_ord"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ord")
    )


def committed_gens(m: dict) -> set[int]:
    """Every generation the manifest has PUBLISHED: segment entries' gens
    plus doc_stats delta dirs (staged/delta_gen=K/...). The manifest is
    the commit record; meta.json is a derived cache — crash recovery in
    add_documents derives the next generation from this, never from meta,
    so a re-run after a crash between manifest publish and meta refresh
    cannot reuse (and overwrite) a committed generation's directories."""
    out: set[int] = set()
    for e in m["segments"]:
        out |= set(int(g) for g in e["gens"])
    for p in m["doc_stats"]:
        mm = _DELTA_GEN.search(p)
        if mm:
            out.add(int(mm.group(1)))
    for p in m["doclens"]:
        mm = re.search(r"dl_delta_g(\d+)", p)
        if mm:
            out.add(int(mm.group(1)))
    return out


def live_gens(m: dict) -> list[int]:
    out: set[int] = set()
    for e in m["segments"]:
        out |= set(e["gens"])
    return sorted(out)


# reader-visibility GC delay: retired dirs are deleted only after this
# many seconds, so a concurrent reader that resolved the PREVIOUS
# manifest finishes its scan against dirs that still exist on shared
# storage. Default 0 = immediate (the single-writer sandbox); set the
# env for multi-reader deployments (e.g. 900 = any read slower than
# 15 min re-resolves the manifest).
GC_GRACE_ENV = "DPOSS_GC_GRACE_SEC"


def retire_paths(index_dir: str, rels: list[str],
                 grace_sec: float | None = None) -> None:
    """Retire dirs the manifest no longer references: record them in the
    manifest's ``retired`` ledger (with a wall-clock stamp), then drain
    whatever has aged past the grace period. Caller holds the writer
    lock. With grace 0 this degrades to immediate deletion; with a
    nonzero grace a reader holding the previous manifest never 404s
    mid-scan — the retired dirs outlive its read (gated in
    tests/test_merge_and_resume.py)."""
    rels = [r for r in rels if r]
    if rels:
        now = time.time()

        def _mut(m):
            led = m.setdefault("retired", [])
            have = {e["path"] for e in led}
            for r in rels:
                if r not in have:
                    led.append({"path": r, "ts": now})
        update_manifest(index_dir, _mut)
    gc_retired(index_dir, grace_sec)


def _live_rels(m: dict) -> set[str]:
    """Every rel the manifest currently references as LIVE data."""
    out = {e["path"] for e in m.get("segments", [])}
    out |= set(m.get("doclens", []))
    out |= set(m.get("doc_stats", []))
    return out


def gc_retired(index_dir: str, grace_sec: float | None = None) -> list[str]:
    """Delete ledgered dirs older than the grace period (``None`` reads
    $DPOSS_GC_GRACE_SEC, default 0) and drop them from the ledger.
    Returns the rels removed. Every writer operation calls this via
    retire_paths, so an active index converges; an idle one keeps its
    ledger until the next write (or an explicit call).

    Safety cross-check: a ledger entry whose path the manifest ALSO
    lists as live (segments/doclens/doc_stats) is never deleted — it is
    dropped from the ledger with a warning instead. Dir naming is
    monotonic today so this cannot happen, but a future name reuse
    (crash-replay re-publishing a prior deterministic rel) must not let
    an aged ledger row delete live data."""
    if grace_sec is None:
        grace_sec = float(os.environ.get(GC_GRACE_ENV, "0"))
    m = load_manifest(index_dir)
    if not m or not m.get("retired"):
        return []
    now = time.time()
    due = {e["path"] for e in m["retired"] if now - e["ts"] >= grace_sec}
    resurrected = due & _live_rels(m)
    if resurrected:
        import warnings

        warnings.warn(
            f"gc_retired: {sorted(resurrected)} are ledgered as retired "
            f"but live in {index_dir}/{MANIFEST}; dropping from the "
            "ledger WITHOUT deleting",
            stacklevel=2,
        )
        due -= resurrected

        def _unledger(mm):
            mm["retired"] = [e for e in mm.get("retired", [])
                             if e["path"] not in resurrected]
        update_manifest(index_dir, _unledger)
    if not due:
        return []
    for rel in due:
        shutil.rmtree(_abs(index_dir, rel), ignore_errors=True)

    def _mut(mm):
        mm["retired"] = [e for e in mm.get("retired", [])
                         if e["path"] not in due]
    update_manifest(index_dir, _mut)
    return sorted(due)


def gc_paths(index_dir: str, rels: list[str]) -> None:
    """Back-compat shim: retire + drain under the configured grace."""
    retire_paths(index_dir, rels)
