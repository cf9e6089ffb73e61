"""RAG capstone: planted-relevance retrieval, rebuild determinism, and
embedding-similarity sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.retrieval import (
    embed_hashed_projection,
)
from mimic_iv_data_pipeline_spark.plans.rag_corpus import (
    build_chunk_index,
    retrieve,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)


def test_embedding_similarity_tracks_token_overlap(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # identical
            (3, "alpha beta gamma delta epsilon eta"),   # near
            (4, "omicron pi rho sigma tau upsilon"),     # disjoint
        ],
        "doc_id long, text string",
    )
    import numpy as np

    emb = {r["doc_id"]: np.array(r["embedding"]) for r in embed_hashed_projection(df).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(emb[1], emb[2]) == pytest.approx(1.0, abs=1e-9)
    assert cos(emb[1], emb[3]) > cos(emb[1], emb[4])


def test_retrieval_finds_planted_chunk(spark, docs):
    """A query that IS a chunk's text must retrieve that chunk first."""
    index = build_chunk_index(docs, window=32, stride=24, dims=64).persist()
    probe = index.orderBy("chunk_uid").limit(3).collect()
    queries = spark.createDataFrame(
        [(int(r["chunk_uid"]) + 10_000_000_000, r["chunk_text"]) for r in probe],
        "query_id long, query_text string",
    )
    got = retrieve(index, queries, k=3, n_cells=8, n_probe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["cos_sim"], r["neighbor_id"]))
    for r in probe:
        qid = int(r["chunk_uid"]) + 10_000_000_000
        hits = sorted(by_q[qid], reverse=True)
        # the planted chunk itself is the (or a tied) top hit at cos 1.0
        assert hits[0][0] == pytest.approx(1.0, abs=1e-6)
        top_ids = {h[1] for h in hits if h[0] == hits[0][0]}
        assert r["chunk_uid"] in top_ids


def test_index_rebuild_is_deterministic(spark, docs):
    a = build_chunk_index(docs, window=32, stride=24, dims=16)
    b = build_chunk_index(docs.repartition(11), window=32, stride=24, dims=16)
    ra = sorted(map(tuple, a.select("chunk_uid", "embedding").collect()))
    rb = sorted(map(tuple, b.select("chunk_uid", "embedding").collect()))
    assert ra == rb
