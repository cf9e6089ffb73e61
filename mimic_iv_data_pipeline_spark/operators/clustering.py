"""Distributed k-means: Lloyd iterations as DataFrame aggregations.

The bounded-driver-sample trainer (`similarity._train_quantizer`) is
the right tool when a ~256k-row sample characterizes the distribution —
FAISS's own practice, used by IVF/PQ/SemDeDup here. This operator is
the complement for when the FULL corpus must vote (fine-grained
clustering, heavy multi-modal mixtures, k·d too large to score against
a sample): classic distributed Lloyd where each iteration is

  assign:  broadcast centroids, one Arrow-batched argmin map
           (no shuffle — `similarity._assign_cells_pandas` kernel),
  update:  posexplode → groupBy(cell, dim).sum — ONE keyed shuffle of
           map-side-combined partials, k·d rows total back to the
           driver (k=64, d=64 → 4096 rows — microscopic at any corpus
           size).

Per-iteration cost is one corpus pass + one k·d-row aggregate; driver
state is the (k, d) centroid matrix only. The iterative-algorithm
pattern Spark wants: per-step work is declarative, the LOOP lives on
the driver, and each step's lineage is cut by re-broadcasting plain
numpy centroids (no ever-growing plan).

Deterministic: init draws from the hash-ordered bounded sample
(partition-order invariant, same primitive as every trainer here);
ties in assignment break to the lower cell id; empty cells keep their
previous centroid (FAISS semantics, matching `_train_quantizer`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_assign"]


def kmeans_assign(df: DataFrame, id_col: str, vec_col: str, centers) -> DataFrame:
    """Nearest-centroid assignment of every row: ``(id, cell)`` via the
    broadcast+Arrow-batch kernel (O(1) plan size in k)."""
    from mimic_iv_data_pipeline_spark.operators.similarity import (
        _assign_cells_pandas,
    )

    return _assign_cells_pandas(df, id_col, vec_col, centers, 1).select(
        id_col, "cell"
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 10,
    seed: int = 42,
    tol: float = 0.0,
    init_sample: int = 8192,
    id_col: str | None = None,
    init=None,
):
    """Fit ``k`` centroids over the FULL corpus; returns a (k, d) numpy
    matrix. ``tol`` > 0 stops early when the max centroid displacement
    (L2) falls below it — the convergence check is free driver work on
    the k·d aggregate the update step already returns.

    ``id_col`` seeds the deterministic init draw; pass the natural key
    when one exists (falls back to a content hash of the vector).
    ``init`` (a (k, d) array-like) skips the init draw and starts Lloyd
    from the GIVEN centroids — warm restarts, and the q137 fixed seam
    that lets one assignment+update step be hash-verified in SQL.
    """
    import numpy as np

    from mimic_iv_data_pipeline_spark.operators.similarity import (
        _train_quantizer,
        sampled_matrix,
    )

    if init is not None:
        centers = np.asarray(init, dtype=np.float64)
    else:
        key = (
            F.col(id_col).cast("string")
            if id_col
            else F.sha2(F.col(vec_col).cast("string"), 256)
        )
        X = sampled_matrix(
            df, id_col or vec_col, vec_col, init_sample, "kmeans", key_expr=key
        )
        # one cheap sample-side Lloyd pass for a sane init (k-means||
        # in spirit: better-than-random seeds at bounded cost), then
        # the corpus-scale iterations refine
        centers = _train_quantizer(X, k, seed=seed, iters=2)
    k_eff = len(centers)

    narrow = df.select(F.col(vec_col).alias("__v"))
    for _ in range(max_iter):
        bc = narrow.sparkSession.sparkContext.broadcast(
            (centers, (centers**2).sum(axis=1))
        )

        def assign(batches):
            import pandas as pd

            cent, cc2 = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
                # the SAME distance expression as _assign_cells_pandas
                # (|v|² + |c|² − 2v·c, first-min tie to the lower cell)
                # — the argmax(2v·c − c²) shortcut orders identically
                # in exact arithmetic but can disagree on float
                # near-ties, which made kmeans_fit's update and
                # kmeans_assign's counts internally inconsistent
                # (r5 review finding)
                d = (v * v).sum(axis=1)[:, None] + cc2[None, :] - 2.0 * (v @ cent.T)
                cells = np.argmin(d, axis=1)
                yield pd.DataFrame({"__v": pdf["__v"].to_numpy(), "cell": cells})

        assigned = narrow.mapInPandas(assign, schema="__v array<double>, cell long")
        stats = (
            assigned.select("cell", F.posexplode("__v").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_centers = centers.copy()
        counts = np.zeros(k_eff)
        sums = np.zeros_like(centers)
        for r in stats:
            sums[r["cell"], r["dim"]] = r["s"]
            counts[r["cell"]] = r["n"]
        # the collect() above consumed every read of this iteration's
        # broadcast — release it, or a long fit accumulates max_iter
        # live (k·d) broadcasts on the executors until the context dies
        bc.unpersist()
        nonempty = counts > 0
        new_centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.sqrt(((new_centers - centers) ** 2).sum(axis=1)).max())
        centers = new_centers
        if tol > 0 and shift < tol:
            break
    return centers
