"""Distributed Lloyd: numpy parity per iteration, partition
invariance, empty-cell semantics, convergence tolerance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
)
from mimic_iv_data_pipeline_spark.operators.similarity import _train_quantizer


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_lloyd(X, centers, iters):
    centers = centers.copy()
    for _ in range(iters):
        c2 = (centers**2).sum(axis=1)
        labels = np.argmax(2.0 * (X @ centers.T) - c2[None, :], axis=1)
        sums = np.zeros_like(centers)
        np.add.at(sums, labels, X)
        counts = np.bincount(labels, minlength=len(centers)).astype(np.float64)
        ne = counts > 0
        centers[ne] = sums[ne] / counts[ne, None]
    return centers


def test_distributed_lloyd_matches_numpy(spark, emb):
    """Running the distributed update on the WHOLE corpus must equal a
    numpy Lloyd over the collected matrix from the same init."""
    X = np.asarray(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    got = kmeans_fit(emb, "embedding", k=8, max_iter=3, id_col="vec_id")
    # reproduce the init: same hash-ordered sample + 2 sample-side iters
    rows = (
        emb.select(F.col("vec_id").cast("string").alias("__k"), F.col("embedding").alias("v"))
        .orderBy(F.xxhash64(F.col("__k"), F.lit("kmeans")).asc(), F.col("__k").asc())
        .limit(8192)
        .collect()
    )
    S = np.asarray([r["v"] for r in rows], dtype=np.float64)
    init = _train_quantizer(S, 8, seed=42, iters=2)
    want = _numpy_lloyd(X, init, 3)
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_kmeans_partition_invariant(spark, emb):
    shuffled = emb.repartition(23).sortWithinPartitions(F.col("vec_id").desc())
    a = kmeans_fit(emb, "embedding", k=4, max_iter=2, id_col="vec_id")
    b = kmeans_fit(shuffled, "embedding", k=4, max_iter=2, id_col="vec_id")
    assert np.allclose(a, b, atol=1e-9)


def test_kmeans_assign_covers_all_rows(spark, emb):
    centers = kmeans_fit(emb, "embedding", k=4, max_iter=2, id_col="vec_id")
    assigned = kmeans_assign(emb, "vec_id", "embedding", centers)
    assert assigned.count() == emb.count()
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(4))


def test_kmeans_tol_stops_early(spark, emb):
    """A huge tolerance must stop after one corpus iteration — the
    result equals max_iter=1 from the same init."""
    a = kmeans_fit(emb, "embedding", k=4, max_iter=1, id_col="vec_id")
    b = kmeans_fit(emb, "embedding", k=4, max_iter=10, tol=1e9, id_col="vec_id")
    assert np.allclose(a, b, atol=0)


def test_theta_sketch_accuracy_and_exactness(spark):
    """KMV estimates: exact below k; within the ~1/sqrt(k) relative
    error band above k; intersection estimate tracks the true overlap."""
    from mimic_iv_data_pipeline_spark.operators.sketches import (
        theta_set_cardinalities,
    )

    a = spark.range(0, 5000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    b = spark.range(2500, 7500).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    row = theta_set_cardinalities(a, b, "key", k=512).first()
    assert row["exact_a"] == 5000 and row["exact_b"] == 5000
    assert row["exact_union"] == 7500 and row["exact_inter"] == 2500
    for est, exact in [
        (row["est_a"], 5000),
        (row["est_b"], 5000),
        (row["est_union"], 7500),
    ]:
        assert abs(est - exact) / exact < 0.15, (est, exact)
    assert abs(row["est_inter"] - 2500) / 2500 < 0.25

    # below k: everything exact
    small_a = spark.range(0, 100).select(F.concat(F.lit("s"), F.col("id")).alias("key"))
    small_b = spark.range(50, 150).select(F.concat(F.lit("s"), F.col("id")).alias("key"))
    r2 = theta_set_cardinalities(small_a, small_b, "key", k=512).first()
    assert r2["est_a"] == 100.0 and r2["est_b"] == 100.0
    assert r2["est_union"] == 150.0
    # theta = 1 → intersection estimate is the exact retained count
    assert r2["est_inter"] == 50.0
