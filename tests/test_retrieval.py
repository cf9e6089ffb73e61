"""Lexical retrieval properties: BM25 hit semantics + ordering, TF-IDF
cosine bounds and the max_df wall. (Value-level checks are in the
registry oracle battery — q112/q113.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.retrieval import (
    bm25_search,
    tfidf_cosine_pairs,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bm25_only_hit_docs_and_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "spark join hash join"),
            (2, "spark spark spark spark"),
            (3, "nothing relevant at all"),
            (4, "join once here"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_search(df, ["spark", "join"], "doc_id", top_k=10).collect()
    ids = [r["doc"] for r in rows]
    assert 3 not in ids, "docs with no query term must not score"
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    by_id = {r["doc"]: r for r in rows}
    assert by_id[1]["n_hits"] == 2  # both terms present
    assert by_id[2]["n_hits"] == 1
    # tf saturation: 4 occurrences of one term can't dominate a doc
    # matching both terms
    assert by_id[1]["score"] > by_id[2]["score"]


def test_bm25_is_case_insensitive_on_query(spark, docs):
    a = {r["doc"]: r["score"] for r in bm25_search(docs, ["HASH"], "doc_id").collect()}
    b = {r["doc"]: r["score"] for r in bm25_search(docs, ["hash"], "doc_id").collect()}
    assert a == b


def test_cosine_pairs_bounded_and_symmetric_ids(spark, docs):
    rows = tfidf_cosine_pairs(docs.limit(120), "doc_id", threshold=0.85).collect()
    assert rows, "expected some near-topic pairs on the synthetic corpus"
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.85 <= r["cos_sim"] <= 1.0 + 1e-6


def test_cosine_identical_docs_score_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
        "doc_id long, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r["cos_sim"]
            for r in tfidf_cosine_pairs(df, "doc_id", threshold=0.5).collect()}
    assert rows[(1, 2)] == pytest.approx(1.0, abs=1e-6)
    assert (1, 3) not in rows and (2, 3) not in rows


def test_cosine_max_df_drops_only_stopword_mass(spark, docs):
    """Capping df must yield a subset of the uncapped candidate space
    with scores shifted only by the dropped stopword terms (here: the
    degenerate synthetic vocab makes every token high-df, so the cap
    empties the index — the documented behavior, asserted explicitly)."""
    sub = docs.limit(100)
    uncapped = tfidf_cosine_pairs(sub, "doc_id", threshold=0.85)
    capped = tfidf_cosine_pairs(sub, "doc_id", threshold=0.85, max_df=5)
    assert capped.count() <= uncapped.count()
