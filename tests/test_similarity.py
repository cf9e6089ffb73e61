"""Similarity-search tests: pandas-vectorized == expression-tree
brute force; IVF recall against exact top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_pandas,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_pandas_cosine_matches_expression(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, cosine_topk(queries, emb, k=5).collect()))
    b = sorted(map(tuple, cosine_topk_pandas(queries, emb, k=5).collect()))
    assert a == b


def test_ivf_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, k=5).collect()
    approx = ivf_topk(queries, emb, n_cells=8, n_probe=4, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells must recover most true neighbors
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # every returned similarity must be exact (IVF approximates the
    # candidate set, never the scores)
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cos_sim"] == exact_scores[key]


def test_ivf_prunes_work(spark, emb):
    """The probed join must score fewer pairs than brute force."""
    queries = emb.filter(F.col("vec_id") < 20)
    n_corpus = emb.count()
    # count scored pairs by disabling the top-k cut
    scored = ivf_topk(queries, emb, n_cells=8, n_probe=2, k=10**9)
    assert scored.count() < 20 * (n_corpus - 1)
