"""Round-11 probe: semantic_dedup pair-strategy dial at 1M docs
(r10 verdict item 4's "measured win at >=1M rows" evidence).

Runs SemDeDup's within-cell prune on a 1M-doc blob corpus (the r11
probe-B generator: 256 clusters + 10% uniform tail, 64 dims) with the
SAME pre-trained quantizer through both pair strategies:

  pairs="join"   — cell-key self-join, interpreted expression cosine
                   per pair, Sigma|cell|^2/2 shuffle rows + a distinct
  pairs="pandas" — per-cell applyInPandas Gram kernel (sequential-fold
                   rank-one updates; bit-identical outputs)

and reports wall-clock + pruned-count equality. The quantizer is
trained once OUTSIDE the timed region (both paths consume identical
centroids), and the assignment relation cost is inside both timings
(it is shared work both must do; reuse=False keeps each run
self-contained).

Run:  python scripts/probe_r11_semdedup.py [--small] [--n-clusters 2048]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402
from scripts.scale_probes_r11 import blob_corpus  # noqa: E402


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from mimic_iv_data_pipeline_spark.operators.dedup import semantic_dedup
    from mimic_iv_data_pipeline_spark.operators.similarity import (
        _train_quantizer,
        sampled_matrix,
    )

    small = "--small" in sys.argv
    n_clusters = (
        int(sys.argv[sys.argv.index("--n-clusters") + 1])
        if "--n-clusters" in sys.argv
        else 2048
    )
    n_docs = 100_000 if small else 1_000_000
    threshold = 0.95

    spark = get_spark("probe_semdedup", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    tmp = tempfile.mkdtemp(prefix="probe_semdedup_")
    t0 = time.time()
    blob_corpus(spark, n_docs).repartition(64).write.parquet(f"{tmp}/c")
    emb = spark.read.parquet(f"{tmp}/c")
    print(f"datagen: {time.time() - t0:.1f} s ({n_docs} docs)", flush=True)

    t0 = time.time()
    X = sampled_matrix(emb, "vec_id", "embedding", 131_072, "semdedup-probe")
    centers = _train_quantizer(X, n_clusters, seed=42, iters=10)
    print(f"quantizer_train_{n_clusters}: {time.time() - t0:.1f} s", flush=True)

    results = {}
    for mode in ("pandas", "join"):
        t0 = time.time()
        out = semantic_dedup(
            emb,
            "vec_id",
            "embedding",
            threshold=threshold,
            centroids=centers,
            reuse=False,
            pairs=mode,
        )
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("pruned").cast("long")).alias("pruned"),
            F.bit_xor(F.xxhash64("id", "cell", "pruned")).alias("sig"),
        ).collect()[0]
        dt = time.time() - t0
        results[mode] = (dt, agg["n"], agg["pruned"], agg["sig"])
        print(
            f"pairs={mode:6s}: {dt:7.1f} s  rows={agg['n']}  "
            f"pruned={agg['pruned']}  sig={agg['sig']}",
            flush=True,
        )
    (dtp, np_, pp, sp), (dtj, nj, pj, sj) = results["pandas"], results["join"]
    same = (np_, pp, sp) == (nj, pj, sj)
    print(
        f"speedup: {dtj / max(dtp, 1e-9):.1f}x  identical={same}",
        flush=True,
    )
    if not same:
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
