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
