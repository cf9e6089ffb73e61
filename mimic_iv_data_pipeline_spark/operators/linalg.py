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


def _collect_moments(
    df: DataFrame, vec_col: str, dims: int
) -> tuple[float, np.ndarray, np.ndarray]:
    """One distributed moment pass → ``(n, mean, covariance)``.

    Collects the ≤ d(d+1)/2 + d + 1 aggregated rows (O(d²), corpus-size
    independent) and finishes the O(d²) arithmetic on the driver. A
    first cut kept the finishing joins relational — the plan audit
    showed Catalyst re-executing the corpus scan + Arrow pass once per
    moment branch (5 scans, no exchange reuse), so the bounded driver
    step is both simpler and 5× less work.
    """
    rows = moment_rows(df, vec_col, dims).collect()
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
        raise ValueError("moment pass over empty input")
    mean = s / n
    # (G − ssᵀ/n)/n on the RAW sums — the exact float op order of the
    # q90 DuckDB oracle ((g − si·sj/n)/n). G/n − outer(mean, mean) is
    # algebraically identical but rounds differently, and a value near a
    # .5e-6 half-up boundary can flip the driver's hash compare.
    return n, mean, (G - np.outer(s, s) / n) / n


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64, scale: int = 6
) -> DataFrame:
    """Full symmetric d×d covariance matrix as ``(i, j, cov)`` rows.

    cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n  (population covariance, matching
    ``numpy.cov(..., bias=True)`` and the DuckDB oracle twin). ONE
    corpus pass (the moment aggregate); the d×d result is materialized
    from the driver with the repo's half-up rounding rule applied in
    numpy (bit-compatible with ``functions.rounding.dround``).
    """
    _, _, cov = _collect_moments(df, vec_col, dims)
    factor = float(10**scale)
    rounded = np.floor(cov * factor + 0.5) / factor
    data = [
        (int(i), int(j), float(rounded[i, j]))
        for i in range(dims)
        for j in range(dims)
    ]
    return df.sparkSession.createDataFrame(data, "i long, j long, cov double")


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
    _, mean, cov = _collect_moments(df, vec_col, dims)
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
    components=None,
) -> DataFrame:
    """Project each vector onto the top-k principal axes.

    Two full-data passes total (moments, then projection); the
    component matrix rides to executors inside the serialized closure
    (k·d doubles — a broadcast in spirit and in cost).

    ``components=(mean, comps)`` skips the moment pass and projects
    onto the GIVEN basis — the serving shape for a basis fitted
    offline, and the q138 fixed seam: eigenvector sign/order is
    engine-specific (why q91 is rows-only), but the centering +
    matmul projection itself is exact arithmetic a SQL twin can
    recompute against a fixed basis.
    """
    if components is not None:
        mean, comps = (np.asarray(a, dtype=np.float64) for a in components)
    else:
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
