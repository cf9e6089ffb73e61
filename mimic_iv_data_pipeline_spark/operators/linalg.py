"""Distributed linear algebra over embedding columns.

Covariance / gram matrices via map-side partial aggregation: each Arrow
batch contributes one d×d partial product (a numpy matmul), the shuffle
carries O(batches · d²) tiny rows, and the reduce is an ordinary
``groupBy(i, j).sum`` with map-side combine. Nothing in the plan grows
with corpus row count except the narrow scan — the classic single-pass
moment-matrix shape (cf. Spark MLlib ``RowMatrix.computeGramianMatrix``,
re-expressed as a DataFrame aggregation so Catalyst/AQE schedule it).

PCA follows the standard small-d factorization: the covariance matrix is
O(d²) ≪ data, so eigendecomposition happens on the driver (numpy
``eigh`` on a 64×64 matrix) and the top-k components are broadcast back
for a narrow projection pass. This is exactly how MLlib's ``PCA`` and
scikit-learn's out-of-core IncrementalPCA split the work; at 100 TB the
only full-data passes are the one moment scan and the one projection
scan.

Reference parity: the reference's dimensionality handling is a pandas
``PCA``-free feature-selection step (``preprocessing/day_intervals_preproc``
feature summaries); embedding-space ops have no reference twin and are
part of the LLM-data-pipeline surface (SURVEY §9).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.functions.rounding import dround

__all__ = ["moment_rows", "covariance_matrix", "pca_components", "pca_project"]


def moment_rows(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """First and second moments of a vector column as a tall-skinny
    mergeable relation.

    Emits, per Arrow batch (map-side, one numpy matmul each):

    * ``(i, j, Σ xᵢ·xⱼ)`` for the gram upper triangle ``0 ≤ i ≤ j < d``
    * ``(i, -1, Σ xᵢ)``   per-dimension sums
    * ``(-1, -1, n)``     row count

    then sums partials with a single ``groupBy(i, j)`` — map-side
    combine collapses the per-batch rows before the shuffle, so the
    exchanged data is O(partitions · d²) regardless of corpus size.
    """
    out_schema = "i int, j int, v double"

    def batch_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(dims)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            g = (X.T @ X)[iu]
            s = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu[0], np.arange(dims), [-1]]),
                    "j": np.concatenate([iu[1], np.full(dims, -1), [-1]]),
                    "v": np.concatenate([g, s, [float(len(X))]]),
                }
            )

    partials = df.select(vec_col).mapInPandas(batch_moments, schema=out_schema)
    return partials.groupBy("i", "j").agg(F.sum("v").alias("v"))


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64, scale: int = 6
) -> DataFrame:
    """Full symmetric d×d covariance matrix as ``(i, j, cov)`` rows.

    cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n  (population covariance, matching
    ``numpy.cov(..., bias=True)`` and the DuckDB oracle twin).

    Everything after the moment aggregation operates on O(d²) rows —
    the joins below are driver-trivial at any corpus scale and Spark
    broadcasts them automatically.
    """
    m = moment_rows(df, vec_col, dims)
    gram = m.filter((F.col("i") >= 0) & (F.col("j") >= 0))
    sums = m.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("v").alias("s")
    )
    n = m.filter(F.col("i") == -1).select(F.col("v").alias("n"))

    # Mirror the upper triangle to emit the full symmetric matrix.
    lower = gram.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "v"
    )
    full = gram.unionByName(lower)

    si = sums.withColumnRenamed("d", "i").withColumnRenamed("s", "si")
    sj = sums.withColumnRenamed("d", "j").withColumnRenamed("s", "sj")
    return (
        full.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            dround((F.col("v") - F.col("si") * F.col("sj") / F.col("n")) / F.col("n"), scale).alias(
                "cov"
            ),
        )
    )


def pca_components(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal components from one distributed moment pass.

    Returns ``(mean[d], components[k, d], explained_var[k])``. The
    eigendecomposition runs on the driver over the d×d covariance —
    O(d³) with d=64 is microseconds; the corpus is touched exactly once.

    Component signs are fixed deterministically (largest-|loading|
    coordinate made positive, ties to the lowest index) so results are
    reproducible across partitionings and numpy versions.
    """
    rows = moment_rows(df, vec_col, dims).collect()  # ≤ d(d+1)/2 + d + 1 rows
    G = np.zeros((dims, dims))
    s = np.zeros(dims)
    n = 0.0
    for r in rows:
        if r.i == -1:
            n = r.v
        elif r.j == -1:
            s[r.i] = r.v
        else:
            G[r.i, r.j] = r.v
            G[r.j, r.i] = r.v
    if n == 0:
        raise ValueError("pca_components: empty input")
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for c in comps:
        pivot = np.argmax(np.abs(c))
        if c[pivot] < 0:
            c *= -1.0
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    k: int = 8,
    scale: int = 6,
) -> DataFrame:
    """Project each vector onto the top-k principal axes.

    Two full-data passes total (moments, then projection); the
    component matrix rides to executors inside the serialized closure
    (k·d doubles — a broadcast in spirit and in cost).
    """
    mean, comps, _ = pca_components(df, vec_col, dims, k)
    out_schema = f"{id_col} long, " + ", ".join(f"pc{c} double" for c in range(k))
    pc_names = [f"pc{c}" for c in range(k)]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            P = (X - mean) @ comps.T
            out = pd.DataFrame(P, columns=pc_names)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    proj = df.select(id_col, vec_col).mapInPandas(project, schema=out_schema)
    return proj.select(
        id_col, *[dround(F.col(c), scale).alias(c) for c in pc_names]
    )
