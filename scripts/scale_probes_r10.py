"""Round-10 probes: (A) hard_negative_sample(ann="ivf") at a corpus
size where exact mining stops being the tool (r9 verdict item 4), and
(B) sf0.1 -> sf1 scaling exponents for the dedup/LSH/negative-mining
family the r9 battery did not cover (r9 verdict item 6).

A. 1M-doc / 1k-query synthetic 64-dim corpus (deterministic xxhash
   embeddings — no RNG, rerunnable):
     * exact mining (brute-force cosine, broadcast-query matmul path)
     * ivf mining, quantizer trained inline
     * ivf mining, PRE-TRAINED centroids passed via the existing
       ``centroids=`` kwarg (the serving amortization lever)
   Records wall-clock, zero-positive-leak checks, and the recall of
   ivf-mined negatives vs exact mining (pair-level). Then a 5M-doc
   ivf-only run — the regime where the 5 TB of exact scoring per query
   batch is the thing the seam exists to avoid.

B. q40_minhash_lsh, q210_geo_clusters, q220_negative_sample,
   q221_hard_negatives, q222_negative_sample_str at sf0.1 vs local sf1
   (scripts/gen_sf1.py — now also emits embeddings.parquet), exponent
   log10(t_sf1 / t_sf0.1). Protocol = bench.py's (warm run, min of 2).

Run:  python scripts/gen_sf1.py && python scripts/scale_probes_r10.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1", "sf1")
DIMS = 64


def synth_corpus(spark, n: int):
    """Deterministic n x 64 embedding relation: each dim is a xxhash64
    of (id, dim) mapped to [-1, 1) — uniform-ish, no RNG, no data file."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIMS - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)).cast("double")
                / F.lit(1000.0)
                - F.lit(1.0)
            ),
        ).alias("embedding"),
    )


def probe_a(spark) -> None:
    import tempfile

    from mimic_iv_data_pipeline_spark.operators.sampling import (
        hard_negative_sample,
    )
    from mimic_iv_data_pipeline_spark.operators.similarity import (
        _train_quantizer,
        sampled_matrix,
    )

    n_docs, n_q, k, depth = 1_000_000, 1_000, 4, 16
    # materialize the synthetic relations to parquet ONCE: the
    # transform-lambda embedding generator runs interpreted per element
    # (64 hashes/row), so regenerating on every retriever pass would
    # dominate the probe (the first r10 run timed out exactly here)
    tmp = tempfile.mkdtemp(prefix="probe_r10_")
    t0 = time.time()
    synth_corpus(spark, n_docs).repartition(64).write.parquet(f"{tmp}/c1m")
    synth_corpus(spark, 5_000_000).repartition(64).write.parquet(f"{tmp}/c5m")
    synth_corpus(spark, n_q).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.lit(0.001)
        ).alias("embedding"),  # distinct from any corpus vector
    ).repartition(4).write.parquet(f"{tmp}/q")
    print(f"A.datagen: {time.time() - t0:.1f} s (one-off)", flush=True)
    corpus = spark.read.parquet(f"{tmp}/c1m")
    queries = spark.read.parquet(f"{tmp}/q")
    # 4 deterministic positives per query
    positives = (
        spark.range(n_q)
        .select((F.col("id") + 10_000_000).alias("query_id"))
        .select(
            "query_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
        )
        .select(
            "query_id",
            F.pmod(F.xxhash64("query_id", "j"), F.lit(n_docs)).alias("doc_id"),
        )
    )
    pos_rows = {(r.query_id, r.doc_id) for r in positives.collect()}

    def run(name, ann, **kw):
        t0 = time.time()
        out = hard_negative_sample(
            positives, queries, corpus, k=k, depth=depth, ann=ann, **kw
        )
        rows = out.collect()
        dt = time.time() - t0
        pairs = {(r.query_id, r.doc_id) for r in rows}
        leaks = pairs & pos_rows
        print(
            f"A.{name}: {dt:.1f} s, {len(rows)} rows, leaks={len(leaks)}",
            flush=True,
        )
        assert not leaks
        return pairs, dt

    exact_pairs, t_exact = run("exact_1M", "exact")
    ivf_pairs, t_ivf = run(
        "ivf_1M(train inline, 256 cells/8 probe)", "ivf",
        n_cells=256, n_probe=8,
    )
    # pre-trained quantizer: the amortization seam — train once, mine
    # every epoch/batch against the same centroids
    t0 = time.time()
    X = sampled_matrix(corpus, "vec_id", "embedding", 262_144, "ivf")
    centers = _train_quantizer(X, 256, seed=42, iters=10)
    t_train = time.time() - t0
    print(f"A.quantizer_train_256: {t_train:.1f} s (amortizable)", flush=True)
    ivf_pre, t_pre = run(
        "ivf_1M(pre-trained centroids)", "ivf",
        n_cells=256, n_probe=8, centroids=centers,
    )
    recall = len(ivf_pairs & exact_pairs) / max(1, len(exact_pairs))
    recall_pre = len(ivf_pre & exact_pairs) / max(1, len(exact_pairs))
    print(
        f"A.recall_vs_exact: inline={recall:.3f} pretrained={recall_pre:.3f} "
        f"(n_probe/n_cells = 8/256); speedup exact->ivf(pre) "
        f"{t_exact / max(t_pre, 1e-9):.1f}x",
        flush=True,
    )

    # 5M docs: exact would score 5M x 1k pairs (~2.6 TFLOP + a full
    # corpus scan per mining run) — ivf-only, leak-checked
    corpus5 = spark.read.parquet(f"{tmp}/c5m")
    t0 = time.time()
    out5 = hard_negative_sample(
        positives, queries, corpus5, k=k, depth=depth,
        ann="ivf", n_cells=512, n_probe=8, centroids=None,
    )
    n5 = out5.count()
    print(f"A.ivf_5M: {time.time() - t0:.1f} s, {n5} rows", flush=True)


def probe_b(spark) -> None:
    from mimic_iv_data_pipeline_spark.queries import all_queries

    qs = all_queries()
    targets = [
        "q40_minhash_lsh",
        "q210_geo_clusters",
        "q220_negative_sample",
        "q221_hard_negatives",
        "q222_negative_sample_str",
    ]

    def timed(name: str, sf_dir: str) -> float:
        fn = qs[name]
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()  # warm (codegen, file listing)
        best = math.inf
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best

    print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'exponent':>9s}", flush=True)
    for name in targets:
        t0 = timed(name, SF01)
        t1 = timed(name, SF1)
        exp = math.log10(t1 / t0) if t0 > 0 else float("nan")
        print(f"{name:28s} {t0:8.2f} {t1:8.2f} {exp:9.2f}", flush=True)


def main() -> None:
    spark = get_spark("probes_r10", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if "a" in which:
        probe_a(spark)
    if "b" in which:
        if not os.path.exists(os.path.join(SF1, "embeddings.parquet")):
            print("B: run scripts/gen_sf1.py first (embeddings.parquet missing)")
        else:
            probe_b(spark)
    spark.stop()


if __name__ == "__main__":
    main()
