"""Recall gates for the approximate-by-construction operators: each
`no_oracle` queries() entry is held to a quantitative bound against the
EXACT in-Spark answer at test scale (VERDICT round-1 'recall gates')."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/embeddings.parquet"),
    reason="driver testdata not present",
)


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .withColumn("embedding", F.transform(F.col("embedding"), lambda x: x.cast("double")))
        .cache()
    )


def _qvec(emb, vid=0):
    return [float(x) for x in emb.filter(F.col("vec_id") == vid).collect()[0]["embedding"]]


def _with_planted(spark, emb, vid=0, n_planted=10, eps=0.02):
    """Union the table with n_planted tiny perturbations of vector `vid`
    (cos ≈ 0.9997): a query FOR vid then has true near neighbors, which
    is the regime ANN structures are built for. The raw testdata
    embeddings are isotropic (top-10 cosine ≈ 0.30 vs median ≈ 0.01) —
    at that angle sign-LSH planes agree w.p. ≈ 0.6 and k-means cells are
    arbitrary, so NO bucketed method reaches recall 0.9 without scanning
    most of the space; the gates below assert ≥0.9 where near neighbors
    exist and a sanity floor on the isotropic queries."""
    import numpy as np

    base = np.asarray(_qvec(emb, vid), dtype=np.float64)
    rng_rows = []
    for i in range(n_planted):
        # deterministic unit-ish noise from splitmix-style hashing
        noise = np.array(
            [((i * 1000003 + j * 997 + 12345) % 2000) / 1000.0 - 1.0
             for j in range(base.shape[0])]
        )
        noise /= max(float(np.linalg.norm(noise)), 1e-9)
        v = base / np.linalg.norm(base) + eps * noise
        rng_rows.append((900000 + i, [float(x) for x in v], -1))
    planted = spark.createDataFrame(
        rng_rows, "vec_id long, embedding array<double>, label int"
    )
    return emb.select("vec_id", "embedding", "label").unionByName(planted)


def test_ann_lsh_recall_at_10(spark, emb):
    from data_prep_opensearch_spark.operators.similarity import (
        ann_lsh_topk,
        brute_force_topk,
    )

    both = _with_planted(spark, emb).localCheckpoint(eager=True)
    q = _qvec(emb, 0)
    exact = {r["vec_id"] for r in brute_force_topk(both, q, k=10).collect()}
    approx = {r["vec_id"] for r in ann_lsh_topk(both, q, k=10).collect()}
    assert len(exact & approx) / 10 >= 0.9, (sorted(exact), sorted(approx))

    # isotropic sanity floor: radius-2 multi-probe on structureless data
    recalls = []
    for vid in (7, 42, 100):
        qv = _qvec(emb, vid)
        ex = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
        ap = {r["vec_id"] for r in
              ann_lsh_topk(emb, qv, k=10, probe_radius=2).collect()}
        recalls.append(len(ex & ap) / 10)
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_ann_ivf_recall_at_10(spark, emb):
    from data_prep_opensearch_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    both = _with_planted(spark, emb).localCheckpoint(eager=True)
    q = _qvec(emb, 0)
    exact = {r["vec_id"] for r in brute_force_topk(both, q, k=10).collect()}
    approx = {r["vec_id"] for r in ivf_topk(both, q, k=10, n_probe=3).collect()}
    assert len(exact & approx) / 10 >= 0.9, (sorted(exact), sorted(approx))

    # isotropic sanity floor at higher probe fraction
    recalls = []
    for vid in (7, 42, 100):
        qv = _qvec(emb, vid)
        ex = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
        ap = {r["vec_id"] for r in ivf_topk(emb, qv, k=10, n_probe=5).collect()}
        recalls.append(len(ex & ap) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_assign_np_matches_expression(spark, emb):
    """The Arrow-batched numpy argmin (large-codebook path) must agree
    with the codegen'd JVM expression argmin on the same codebook —
    except where a vector is near-equidistant to both chosen centroids
    (the two paths round distances differently; such ties count as
    agreement). Null embeddings must yield null on BOTH paths."""
    import numpy as np

    from data_prep_opensearch_spark.operators.similarity import (
        _ivf_assign_np,
        ivf_assign_col,
        ivf_train,
    )

    cents = ivf_train(emb, n_clusters=16)
    mismatches = (
        emb.select(
            "vec_id", "embedding",
            ivf_assign_col(F.col("embedding"), cents).alias("expr_c"),
            _ivf_assign_np(F.col("embedding"), cents).alias("np_c"),
        )
        .filter(F.col("expr_c") != F.col("np_c"))
        .collect()
    )
    for r in mismatches:  # only true near-ties may disagree
        x = np.asarray(r["embedding"], dtype=np.float64)
        d1 = float(((x - cents[r["expr_c"]]) ** 2).sum())
        d2 = float(((x - cents[r["np_c"]]) ** 2).sum())
        assert abs(d1 - d2) <= 1e-9 * max(d1, d2, 1e-30), r["vec_id"]

    # null embedding: null cluster id, no crash, on both paths
    one_null = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<double>"
    )
    row = one_null.select(
        ivf_assign_col(F.col("embedding"), cents).alias("expr_c"),
        _ivf_assign_np(F.col("embedding"), cents).alias("np_c"),
    ).collect()[0]
    assert row["expr_c"] is None and row["np_c"] is None


def test_ivf_clustered_1024_partition_pruned(spark, tmp_root):
    """The IVF scale path at a 1024-centroid codebook on the sf0.1
    embedding table: assignment goes through the numpy argmin (the
    expression tree self-documents a ~hundreds cap), the table is
    written partitioned by cluster id, and a probe is a PARTITION-PRUNED
    scan — the parquet source's PartitionFilters carry the _cluster
    predicate and only the probed directories are read."""
    import os

    from data_prep_opensearch_spark.operators.similarity import (
        IVF_EXPR_MAX_CENTROIDS,
        brute_force_topk,
        ivf_probe_topk,
        ivf_train,
        ivf_write_clustered,
    )

    sf01 = "/root/testdata/sf0.1/embeddings.parquet"
    if not os.path.exists(sf01):
        pytest.skip("sf0.1 testdata not present")
    big = (
        spark.read.parquet(sf01)
        .withColumn("embedding",
                    F.transform(F.col("embedding"), lambda x: x.cast("double")))
        .select("vec_id", "embedding", "label")
    )
    both = _with_planted(spark, big).localCheckpoint(eager=True)
    n_total = both.count()

    cents = ivf_train(both, n_clusters=1024, sample_rows=2000)
    assert cents.shape[0] == 1024 > IVF_EXPR_MAX_CENTROIDS
    path = os.path.join(tmp_root, "ivf_clustered_1024")
    ivf_write_clustered(both, path, cents)

    q = _qvec(big, 0)
    probe = ivf_probe_topk(spark, path, q, k=10, n_probe=64)
    # partition pruning, structurally: the scan's PartitionFilters carry
    # the _cluster predicate (not a post-scan Filter over all rows)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:400]
    assert "_cluster" in pf
    # ...and behaviorally: the probed scan touches a fraction of the rows
    cents_probed = spark.read.parquet(path).filter(
        F.col("_cluster").isin(
            [int(c) for c in range(1024)]
        )
    )
    assert cents_probed.count() == n_total  # clustered table is complete
    from data_prep_opensearch_spark.operators.similarity import _nearest_clusters

    probes = _nearest_clusters(cents, q, 64)
    n_scanned = spark.read.parquet(path).filter(
        F.col("_cluster").isin(probes)).count()
    assert n_scanned < 0.5 * n_total

    # recall gate vs the exact answer (planted near-neighbors regime)
    exact = {r["vec_id"] for r in brute_force_topk(both, q, k=10).collect()}
    approx = {r["vec_id"] for r in probe.collect()}
    assert len(exact & approx) / 10 >= 0.9, (sorted(exact), sorted(approx))


def test_embedding_near_dup_pair_recall(spark, emb):
    """LSH-bucketed near-dup pairs vs the exact all-pairs answer (test
    scale only: the exact join is O(n²))."""
    from data_prep_opensearch_spark.operators.similarity import (
        cosine,
        embedding_near_dup_pairs,
    )

    clones = emb.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    both = emb.unionByName(clones).localCheckpoint(eager=True)
    thr = 0.999
    a, b = both.alias("a"), both.alias("b")
    exact = {
        (r["ia"], r["ib"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cs"),
        )
        .filter(F.col("cs") >= thr)
        .collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(both, threshold=thr).collect()
    }
    assert exact, "planted clones must produce exact pairs"
    assert not (approx - exact), "LSH path must not invent pairs (exact filter)"
    assert len(approx & exact) / len(exact) >= 0.95, (len(approx), len(exact))


def _blob_table(spark, n_clusters=8, per_cluster=120, dim=64, spread=0.05):
    """Deterministic well-separated blobs — the regime IVF layouts exist
    for (embedding spaces with real cluster structure; the raw testdata
    embeddings are isotropic, where every k-means cell borders every
    other and ANY centroid change lawfully touches all partitions)."""
    import numpy as np

    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c] = 4.0
        center[(c + 1) % dim] = 1.0
        for i in range(per_cluster):
            noise = np.array(
                [((c * 7919 + i * 104729 + j * 997) % 2000) / 1000.0 - 1.0
                 for j in range(dim)]
            )
            noise /= max(float(np.linalg.norm(noise)), 1e-9)
            v = center + spread * noise
            rows.append((c * per_cluster + i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_ivf_refresh_rewrites_only_moved_partitions(spark, tmp_root):
    """Codebook refresh (round-4 task): retrain centroids and rewrite
    ONLY the partitions whose membership changed. Gates: (a) fewer
    partitions rewritten than exist, (b) the refreshed layout is
    IDENTICAL (per-row cluster + probe results) to a from-scratch
    clustered write with the same new codebook, (c) exact top-k over
    the probed cells still matches brute force."""
    import numpy as np

    from data_prep_opensearch_spark.operators.similarity import (
        brute_force_topk,
        ivf_probe_topk,
        ivf_read_centroids,
        ivf_refresh,
        ivf_train,
        ivf_write_clustered,
    )

    blobs = _blob_table(spark).localCheckpoint(eager=True)

    # initial layout under a codebook with TWO cells label-swapped
    # relative to the retrained one — the realistic partial-churn mode
    # of k-means retraining (a couple of cells swap or shift identity
    # while the rest reproduce). Refresh restores the true codebook, so
    # exactly the two swapped blobs move and six partitions stay closed.
    fresh0 = ivf_train(blobs, n_clusters=8, sample_rows=2000)
    a_cell, b_cell = 0, 1
    biased = fresh0.copy()
    biased[[a_cell, b_cell]] = fresh0[[b_cell, a_cell]]
    path = os.path.join(tmp_root, "ivf_refresh_layout")
    ivf_write_clustered(blobs, path, biased)

    stats = ivf_refresh(spark, path, n_clusters=8, sample_rows=2000)
    assert stats["n_moved"] > 0, "label-swapped retrain must move rows"
    n_rewritten = len(stats["rewritten_partitions"]) + len(
        stats["deleted_partitions"]
    )
    assert n_rewritten < stats["total_partitions"], stats
    assert set(stats["rewritten_partitions"]) == {a_cell, b_cell}, stats

    # refreshed layout must equal a from-scratch write of the new codebook
    assert np.allclose(ivf_read_centroids(path), fresh0)
    path2 = os.path.join(tmp_root, "ivf_refresh_fromscratch")
    ivf_write_clustered(blobs, path2, fresh0)
    q = [float(x) for x in
         blobs.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    got = [(r["vec_id"], r["cos_sim"])
           for r in ivf_probe_topk(spark, path, q, k=10, n_probe=2).collect()]
    want = [(r["vec_id"], r["cos_sim"])
            for r in ivf_probe_topk(spark, path2, q, k=10, n_probe=2).collect()]
    assert got == want

    # full-table parity: every (vec_id, cluster) matches the from-scratch
    a = spark.read.parquet(path).select("vec_id", "_cluster")
    b = spark.read.parquet(path2).select("vec_id", "_cluster")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0

    # recall gate on the refreshed layout (clustered data: probe is exact)
    exact = {r["vec_id"] for r in brute_force_topk(blobs, q, k=10).collect()}
    approx = {vid for vid, _ in got}
    assert len(exact & approx) / 10 >= 0.9, (sorted(exact), sorted(approx))


def test_ivf_refresh_noop_when_codebook_stable(spark, emb, tmp_root):
    """Retraining with the SAME deterministic sample reproduces the same
    codebook: zero moves, zero partitions rewritten — the fp-gated-
    recompute discipline applied to cluster assignment."""
    from data_prep_opensearch_spark.operators.similarity import (
        ivf_refresh,
        ivf_train,
        ivf_write_clustered,
    )

    both = _with_planted(spark, emb).localCheckpoint(eager=True)
    cents = ivf_train(both, n_clusters=8, sample_rows=2000)
    path = os.path.join(tmp_root, "ivf_refresh_noop")
    ivf_write_clustered(both, path, cents)
    stats = ivf_refresh(spark, path, n_clusters=8, sample_rows=2000)
    assert stats["n_moved"] == 0
    assert stats["rewritten_partitions"] == []
    assert stats["deleted_partitions"] == []
