"""Round-5 scale probes: the r4 operator families at ~100× sf0.1.

Replicates the synthetic tables in-session (no writes outside /tmp) and
times each operator warm (second run), mirroring the r3 probe method
(PERF.md "r3 scale probes"). Families probed: PQ/ADC search (q103),
BM25 (q113), Kneser-Ney scoring (q108), incremental dedup (q107).

Usage: python scripts/scale_probes_r5.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _replicated_embeddings(spark, reps: int):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return (
        emb.crossJoin(spark.range(reps).select(F.col("id").alias("__rep")))
        .select(
            (F.col("vec_id") * reps + F.col("__rep")).alias("vec_id"),
            "embedding",
        )
    )


def _replicated_docs(spark, reps: int, salt_tokens: bool):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = docs.crossJoin(spark.range(reps).select(F.col("id").alias("__rep")))
    if salt_tokens:
        # rewrite EVERY token with a per-replica suffix so replicas are
        # fully distinct documents (no cross-replica shingle overlap) —
        # the probe then measures operator cost, not duplicate output
        toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        out = out.withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(toks, lambda t: F.concat(t, F.lit("_r"), F.col("__rep"))),
            ),
        )
    return out.select(
        (F.col("doc_id") * reps + F.col("__rep")).alias("doc_id"), "text"
    )


def _timed(tag, fn):
    fn()  # codegen warm-up
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.2f} s  ({n} rows)")
    return dt


def probe_pq(spark):
    from mimic_iv_data_pipeline_spark.operators.pq import pq_topk

    corpus = _replicated_embeddings(spark, 500).persist()  # 1M vectors
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") < 10)
    print(f"[pq] corpus {n} vectors, 10 queries")
    _timed("pq_topk 1M vectors (train+encode+ADC+rank)",
           lambda: pq_topk(queries, corpus=corpus, m=8, n_centroids=16, k=5).count())
    _timed("pq_topk 1M vectors rerank=100",
           lambda: pq_topk(queries, corpus=corpus, m=8, n_centroids=16, k=5,
                           rerank=100).count())
    corpus.unpersist()


def probe_bm25(spark):
    from mimic_iv_data_pipeline_spark.operators.retrieval import bm25_search

    docs = _replicated_docs(spark, 100, salt_tokens=False).persist()  # 500k docs
    n = docs.count()
    print(f"[bm25] {n} docs")
    _timed("bm25_search 500k docs, 3 terms, top-20",
           lambda: bm25_search(docs, ["hash", "join", "spark"], "doc_id",
                               top_k=20).count())
    docs.unpersist()


def probe_kn(spark):
    from mimic_iv_data_pipeline_spark.operators.text import kneser_ney_scores

    docs = _replicated_docs(spark, 100, salt_tokens=False).persist()  # 500k docs
    n = docs.count()
    print(f"[kn] {n} docs (~27M token bigrams)")
    _timed("kneser_ney_scores 500k docs",
           lambda: kneser_ney_scores(docs, "doc_id", "text",
                                     reuse=False).count())
    docs.unpersist()


def probe_incdedup(spark):
    from mimic_iv_data_pipeline_spark.operators.incremental import (
        build_minhash_index,
        dedup_against_index,
    )

    docs = _replicated_docs(spark, 100, salt_tokens=True).persist()  # 500k distinct
    n = docs.count()
    half = 250_000 * 2  # ids are doc_id*100+rep, range 0..500k
    old = docs.filter(F.col("doc_id") < half // 2)
    new = docs.filter(F.col("doc_id") >= half // 2)
    print(f"[incdedup] {n} docs: index {old.count()}, probe {new.count()}")
    index = build_minhash_index(old, "doc_id", "text").persist()
    index.count()
    _timed("dedup_against_index 250k new vs 250k indexed",
           lambda: dedup_against_index(new, index, "doc_id", "text",
                                       threshold=0.5).count())
    index.unpersist()
    docs.unpersist()


PROBES = {
    "pq": probe_pq,
    "bm25": probe_bm25,
    "kn": probe_kn,
    "incdedup": probe_incdedup,
}


def main():
    which = sys.argv[1:] or list(PROBES)
    # this process creates the JVM, so driver.memory is honored here;
    # the 100x replicas need real heap (the package default leaves the
    # local JVM at 1g — fine for sf0.1, GC-thrash at 50M tokens)
    spark = get_spark("scale_probes_r5", **{"spark.driver.memory": "48g"})
    for name in which:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
