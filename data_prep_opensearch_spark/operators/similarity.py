"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: JVM-side zip_with/aggregate expressions —
    exact baseline, O(n) per query, fully codegen'd (no UDF).
  - LSH-bucketed ANN: sign-of-dot-product with H deterministic random
    hyperplanes (splitmix64-derived, no RNG state) -> bucket join; the
    scale path — candidate set shrinks ~2^H-fold; probe neighboring
    buckets for recall.

At 100 TB the brute-force path becomes a broadcast of the query matrix +
one pass over the table (still viable for few queries); the LSH path
turns it into a bucket-partitioned equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

DIM = 64  # testdata embedding dimensionality (asserted at runtime)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector (literal array —
    constant-folded into codegen; for a query BATCH, broadcast-join a
    query table instead)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(key),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(key))
        .limit(k)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix64 -> uniform
    [-1, 1); stateless, so every executor/test regenerates identically."""
    idx = np.arange(n_planes * dim, dtype=np.uint64)
    offset = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    z = idx + offset
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    u = z.astype(np.float64) / float(2**64)
    return (u * 2.0 - 1.0).reshape(n_planes, dim)


def lsh_bucket_col(vec: Column, n_planes: int = 8, dim: int = DIM, seed: int = 42) -> Column:
    """Bucket id = bit-vector of sign(v . h_i) packed to an int."""
    planes = _hyperplanes(n_planes, dim, seed)
    bucket = F.lit(0)
    for i in range(n_planes):
        h = F.array(*[F.lit(float(x)) for x in planes[i]])
        bucket = bucket + F.when(dot(vec, h) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("int")


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 1,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """ANN: score only vectors whose bucket is within hamming distance
    ``probe_radius`` of the query's bucket (multi-probe LSH).

    Recall honesty note (test_recall_gates): sign-random-projection LSH
    finds NEAR neighbors — P(same side of one plane) = 1 - θ/π. A true
    near-duplicate (θ≈2°) collides on all 8 planes w.p. ≈0.97 and is
    recovered ≈always under radius-1 probing; but on ISOTROPIC vectors
    the "top-10" sit at θ≈72° (cos≈0.3), where per-plane collision is
    only ≈0.6 — no bucketed method separates that from noise without
    probing most of the space. The recall gate therefore asserts ≥0.9 on
    planted-neighbor queries and a sanity floor on isotropic ones."""
    planes = _hyperplanes(n_planes, len(query_vec))
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << i) for i in range(n_planes) if float(planes[i] @ qv) > 0))
    probes = {qbucket}
    if probe_radius >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(n_planes)}
    if probe_radius >= 2:
        probes |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    probes = sorted(probes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), n_planes, len(query_vec)))
        .filter(F.col("_bucket").isin(probes))
        .select(
            F.col(key),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(key))
        .limit(k)
    )


def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 3, seed: int = 42) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample — the IVF
    coarse quantizer. At 100 TB the sample is a bounded-size
    `df.sample(...).limit(...)` collect; centroids stay driver-sized.

    Distances use the ||s||² − 2·s·c + ||c||² expansion (argmin drops the
    ||s||² row constant): an (n × k) matmul instead of the (n × k × dim)
    broadcast cube, so k=1024 trains in MBs, not GBs."""
    n = sample.shape[0]
    idx = np.arange(n, dtype=np.uint64)
    # compute the splitmix offset in Python ints (wraparound intended);
    # multiplying numpy uint64 scalars raises a RuntimeWarning instead
    offset = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        z = (idx + offset) * np.uint64(0xBF58476D1CE4E5B9)
    order = np.argsort(z)
    sample = sample.astype(np.float64)
    centroids = sample[order[:k]].copy()
    for _ in range(iters):
        c_sq = (centroids * centroids).sum(axis=1)
        assign = (c_sq[None, :] - 2.0 * (sample @ centroids.T)).argmin(axis=1)
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=centroids.shape[0])
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def ivf_train(
    df: DataFrame,
    n_clusters: int = 8,
    sample_rows: int = 2000,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> np.ndarray:
    """Train the IVF coarse quantizer on a bounded driver-side sample.
    The sample is the first ``sample_rows`` rows BY KEY ORDER — a bare
    ``limit()`` takes whatever partitions answer first, so the trained
    codebook (and every cluster assignment derived from it) would vary
    with cluster layout; ordering by the key makes training a pure
    function of the data."""
    rows = (
        df.select(key, vec_col).orderBy(key).limit(sample_rows).collect()
    )
    sample = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return _kmeans_lite(sample, n_clusters)


# above this, the expression argmin (linear-size tree, but k x dim
# float literals baked into the plan) stops being worth compiling —
# the Arrow-batched numpy argmin takes over
IVF_EXPR_MAX_CENTROIDS = 64


def _ivf_assign_np(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id via a broadcast-centroid numpy argmin in an
    Arrow-batched pandas UDF — one (batch × k) matmul per Arrow batch.
    The scale path for large codebooks (k up to tens of thousands):
    the centroid matrix ships once per worker in the UDF closure."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (cent * cent).sum(axis=1)

    @pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        # null embeddings yield null cluster ids (matching the JVM
        # expression path's null propagation), never a batch crash
        mask = v.notna().to_numpy()
        out = np.full(len(v), None, dtype=object)
        if mask.any():
            X = np.asarray([np.asarray(x, dtype=np.float64)
                            for x in v[mask]])
            d = c_sq[None, :] - 2.0 * (X @ cent.T)  # + ||x||^2 row-const
            out[mask] = d.argmin(axis=1).astype(np.int32)
        return pd.Series(out)

    return assign(vec)


def ivf_assign(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id; codegen'd JVM expression for small codebooks,
    Arrow-batched numpy argmin past IVF_EXPR_MAX_CENTROIDS.

    Tie caveat: the two paths compute mathematically equal distances
    with different floating-point rounding (sum of squared diffs vs the
    ||c||²−2x·c expansion), so a vector near-EQUIDISTANT to two
    centroids (difference inside double rounding) may be assigned to
    either — harmless for an ANN structure (recall gates hold; the
    parity test treats sub-1e-9 relative distance ties as agreement)."""
    if centroids.shape[0] <= IVF_EXPR_MAX_CENTROIDS:
        return ivf_assign_col(vec, centroids)
    return _ivf_assign_np(vec, centroids)


def ivf_assign_col(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid id as a JVM expression (argmin over per-centroid
    squared distances — no UDF; codegen'd per row). The distances form
    ONE array expression and the argmin is array_min + array_position
    (first occurrence = lowest index on ties, matching numpy), so the
    tree grows LINEARLY in k — the earlier when-chain re-embedded the
    running best under every branch, doubling the tree per centroid
    (2^k nodes: k=16 was already a 65k-node interpreted predicate)."""
    dists = F.array(*[
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in centroids[c]]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        for c in range(centroids.shape[0])
    ])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    sample_rows: int = 2000,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """IVF ANN, ad-hoc variant: coarse-quantize with k-means centroids
    (trained on a deterministic driver-side sample), score only the
    n_probe clusters nearest to the query — one full pass to assign.
    The scale path is ``ivf_write_clustered`` + ``ivf_probe_topk``:
    assign ONCE at write time, store partitioned by cluster id, and a
    probe becomes a partition-pruned scan of n_probe directories."""
    cents = ivf_train(df, n_clusters, sample_rows, vec_col, key)
    probes = _nearest_clusters(cents, query_vec, n_probe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("_cluster", ivf_assign(F.col(vec_col), cents))
        .filter(F.col("_cluster").isin(probes))
        .select(
            F.col(key),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(key))
        .limit(k)
    )


def _nearest_clusters(
    centroids: np.ndarray, query_vec: list[float], n_probe: int
) -> list[int]:
    qv = np.asarray(query_vec, dtype=np.float64)
    dists = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(dists)[:n_probe]]


def ivf_write_clustered(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> None:
    """Materialize the table PARTITIONED BY ivf cluster id (hive-style
    ``_cluster=N/`` directories) with the codebook stored alongside
    (dot-prefixed — invisible to the parquet reader). This is the write
    half of the IVF scale path: assignment cost is paid once; every
    probe afterwards reads only its n_probe directories (PartitionFilters
    in the scan, verified in tests/test_recall_gates.py)."""
    import io
    import os

    (
        df.withColumn("_cluster", ivf_assign(F.col(vec_col), centroids))
        .write.mode("overwrite")
        .partitionBy("_cluster")
        .parquet(path)
    )
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(centroids, dtype=np.float64))
    with open(os.path.join(path, ".ivf_centroids.npy"), "wb") as f:
        f.write(buf.getvalue())


def ivf_refresh(
    spark,
    path: str,
    n_clusters: int | None = None,
    sample_rows: int = 2000,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> dict:
    """Retrain the coarse quantizer and INCREMENTALLY re-cluster: only
    the ``_cluster=N/`` partitions whose membership changed are
    rewritten (closes the full-table-rewrite gap the round-4 review
    named — the fp-gated-recompute discipline applied to cluster
    assignment).

    Plan: one scan assigns every vector to the NEW codebook; rows whose
    assignment changed identify the AFFECTED partitions (every cluster
    that loses or gains at least one vector — a loser must be rewritten
    without its departed rows, and a gainer is rewritten rather than
    appended so each partition stays a single-write unit). A second
    scan, partition-pruned to the affected clusters' current rows plus
    the movers, rewrites exactly those partitions via dynamic partition
    overwrite; untouched ``_cluster=N/`` directories are never opened.
    An affected partition left EMPTY (every row departed) is deleted
    explicitly — dynamic overwrite only replaces partitions present in
    the written data. The new codebook is published LAST (single-file
    atomic replace, same commit discipline as manifest.json). Race
    window, stated honestly: the partition rewrites land BEFORE the
    codebook swap, so a probe racing the refresh can observe three
    states — old codebook + old partitions, old codebook + (some)
    rewritten partitions, or new codebook + all affected partitions
    rewritten. The middle state returns rows whose cluster assignment
    reflects the incoming codebook; recall degrades gracefully (probes
    still scan real vectors) but is not the old index's exact answer.
    A fully atomic swap would stage rewritten partitions to a temp
    prefix and commit them with the codebook in one manifest publish —
    the documented follow-up for serving-critical deployments.

    Centroid drift is usually local, so the moved fraction — and the
    rewrite — is typically a small multiple of the true churn instead
    of 100% of the table. Returns receipts:
    ``{n_moved, rewritten_partitions, deleted_partitions,
    total_partitions, n_clusters}``."""
    import os
    import shutil

    old_cents = ivf_read_centroids(path)
    if n_clusters is None:
        n_clusters = int(old_cents.shape[0])
    df = spark.read.parquet(path)
    new_cents = ivf_train(df, n_clusters, sample_rows, vec_col, key)

    assigned = df.withColumn("_new", ivf_assign(F.col(vec_col), new_cents))
    # null-safe: a null embedding assigns null under both codebooks and
    # must read as UNMOVED, not fall out of the comparison
    moved = assigned.filter(~F.col("_new").eqNullSafe(F.col("_cluster")))
    moved_stats = moved.select(
        F.count("*").alias("n"),
        F.collect_set("_cluster").alias("lost"),
        F.collect_set("_new").alias("gained"),
    ).collect()[0]
    n_moved = int(moved_stats["n"])
    affected = sorted(
        {int(c) for c in (moved_stats["lost"] or []) if c is not None}
        | {int(c) for c in (moved_stats["gained"] or []) if c is not None}
    )
    total_parts = sum(
        1 for d in os.listdir(path) if d.startswith("_cluster=")
    )
    rewritten: list[int] = []
    deleted: list[int] = []
    if affected:
        # rows that will live in an affected partition under the new
        # codebook: the scan is partition-pruned to affected ∪ (movers'
        # source partitions) = affected, so unaffected dirs stay closed
        # `_new ∈ affected` implies `_cluster ∈ affected` (a mover's
        # source is a loser; a non-mover's source IS its target), so the
        # extra conjunct on the PARTITION column changes nothing
        # logically but lets the scan prune to the affected directories
        out = (
            assigned.filter(F.col("_cluster").isin(affected))
            .filter(F.col("_new").isin(affected))
            .drop("_cluster")
            .withColumnRenamed("_new", "_cluster")
        )
        # materialize BEFORE overwriting: the write targets the same
        # path the plan reads (Spark rejects a self-overwriting file
        # scan, and lazily re-reading mid-overwrite would be a data
        # race). The churn set is bounded by the affected partitions;
        # at warehouse scale the same two-phase shape applies — stage
        # the affected partitions to a temp prefix, then commit
        out = out.localCheckpoint(eager=True)
        nonempty = {
            int(r["_cluster"])
            for r in out.select("_cluster").distinct().collect()
        }
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_cluster")
            .parquet(path)
        )
        rewritten = sorted(nonempty)
        for c in sorted(set(affected) - nonempty):
            d = os.path.join(path, f"_cluster={c}")
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
                deleted.append(c)
    buf_path = os.path.join(path, ".ivf_centroids.npy")
    import io

    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(new_cents, dtype=np.float64))
    tmp = buf_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, buf_path)
    return {
        "n_moved": n_moved,
        "rewritten_partitions": rewritten,
        "deleted_partitions": deleted,
        "total_partitions": total_parts,
        "n_clusters": n_clusters,
    }


def ivf_read_centroids(path: str) -> np.ndarray:
    import os

    with open(os.path.join(path, ".ivf_centroids.npy"), "rb") as f:
        import io

        return np.load(io.BytesIO(f.read()))


def ivf_probe_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    key: str = "vec_id",
) -> DataFrame:
    """Query half of the IVF scale path: rank the stored codebook's
    centroids against the query on the driver (codebook is MBs at tens
    of thousands of centroids), then scan ONLY the n_probe nearest
    ``_cluster=N/`` partitions — partition pruning, no assignment work,
    no full-table pass."""
    cents = ivf_read_centroids(path)
    probes = _nearest_clusters(cents, query_vec, n_probe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(path)
        .filter(F.col("_cluster").isin(probes))
        .select(
            F.col(key),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(key))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    vec_col: str = "embedding",
    key: str = "vec_id",
    max_bucket_size: int | None = 2000,
    log_drops: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket equi-join prunes candidates,
    exact cosine filters. Same-bucket-only keeps the join linear-ish;
    raise n_planes as the table grows.

    HOT-BUCKET SUPPRESSION (same guard as minhash_lsh_pairs): correlated
    embeddings — a cluster of near-constant vectors — can put a huge
    share of the table behind one sign pattern, re-creating the O(m²)
    blowup the bucketing exists to avoid. Buckets larger than
    ``max_bucket_size`` are dropped before the self-join (mirrored in
    the oracle; ``log_drops=True`` reports them; ``None`` uncaps).
    At scale, prefer RAISING n_planes first — the cap is the backstop
    for adversarial/degenerate inputs, not the sizing mechanism."""
    # materialize bucket assignment before the self-join (both sides would
    # otherwise recompute the n_planes dot products per row)
    withb = df.withColumn(
        "_bucket", lsh_bucket_col(F.col(vec_col), n_planes)
    ).localCheckpoint(eager=True)
    if max_bucket_size is not None:
        hot = (
            withb.groupBy("_bucket")
            .agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket_size)
            .select("_bucket")
        )
        if log_drops:
            n_hot = hot.count()
            if n_hot:
                print(
                    f"embedding_near_dup_pairs: suppressed {n_hot} buckets "
                    f"with > {max_bucket_size} members before the pair join"
                )
        withb = withb.join(F.broadcast(hot), "_bucket", "left_anti")
    a = withb.alias("a")
    b = withb.alias("b")
    return (
        a.join(b, (F.col("a._bucket") == F.col("b._bucket"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(
            F.col(f"a.{key}").alias("id_a"),
            F.col(f"b.{key}").alias("id_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
