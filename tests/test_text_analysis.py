"""Property tests for the corpus-analysis wave: KN distribution
normalization, entropy bounds, Zipf slope sign, sentence stats.
(Value-level oracle checks live in the registry battery.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.text import (
    kneser_ney_scores,
    sentence_stats,
    token_entropy,
    zipf_slope,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_kneser_ney_is_proper_distribution(spark, docs):
    """Σ_w P_KN(w|prev) over the training vocabulary must be 1 for
    every context — the defining property of interpolated KN (discount
    mass exactly re-spent through the continuation distribution)."""
    sub = docs.filter(F.col("doc_id") < 40)
    pairs = (
        sub.select(
            F.explode(
                F.arrays_zip(
                    F.concat(
                        F.array(F.lit("<s>")),
                        F.slice(
                            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                            1,
                            F.greatest(
                                F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                                - 1,
                                F.lit(0),
                            ),
                        ),
                    ).alias("prev"),
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("tok"),
                )
            ).alias("p")
        )
        .select(F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
        .collect()
    )
    from collections import Counter, defaultdict

    c2 = Counter((r["prev"], r["tok"]) for r in pairs)
    c1 = Counter(r["prev"] for r in pairs)
    n1p_ctx = defaultdict(set)
    n1p_tok = defaultdict(set)
    for p, t in c2:
        n1p_ctx[p].add(t)
        n1p_tok[t].add(p)
    n1p_all = len(c2)
    vocab = {t for _, t in c2}
    D = 0.75
    for prev in list(c1)[:25]:
        total = 0.0
        for w in vocab:
            cnt = c2.get((prev, w), 0)
            total += max(cnt - D, 0.0) / c1[prev] + (
                D * len(n1p_ctx[prev]) / c1[prev]
            ) * (len(n1p_tok[w]) / n1p_all)
        # Σ_w P_cont(w) = 1 exactly, so the context sums to 1
        assert total == pytest.approx(1.0, abs=1e-9), prev


def test_kneser_ney_output_shape(spark, docs):
    out = kneser_ney_scores(docs.limit(50), "doc_id").collect()
    assert len(out) == 50
    for r in out:
        assert r["n_tokens"] > 0
        # perplexity is exp(-avg) of the UNROUNDED mean; recomputing
        # from the 6dp-rounded avg_logprob is off by up to ppl·5e-7
        assert r["perplexity"] == pytest.approx(
            math.exp(-r["avg_logprob"]), rel=1e-5
        )


def test_token_entropy_bounds(spark, docs):
    for r in token_entropy(docs.limit(100), "doc_id").collect():
        # 6dp half-up rounding can push H up to 5e-7 past the bound
        assert -1e-6 <= r["entropy"] <= math.log(r["n_types"]) + 1e-6
        assert r["n_types"] <= r["n_tokens"]


def test_token_entropy_extremes(spark):
    df = spark.createDataFrame(
        [(1, "x x x x x x"), (2, "a b c d e f")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in token_entropy(df, "doc_id").collect()}
    assert got[1]["entropy"] == 0.0
    assert got[2]["entropy"] == pytest.approx(round(math.log(6), 6), abs=1e-6)


def test_zipf_slope_negative_on_text(spark, docs):
    rows = zipf_slope(docs, "source", max_rank=500).collect()
    assert rows
    for r in rows:
        assert r["zipf_slope"] < 0, "frequency must decay with rank"


def test_sentence_stats_shapes(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three. four five! six?"),
            (2, "no terminal punctuation here"),
            (3, "!!!"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in sentence_stats(df, "doc_id").collect()}
    assert got[1]["n_sentences"] == 3
    assert got[1]["avg_sentence_words"] == pytest.approx(2.0, abs=1e-6)
    assert got[1]["max_sentence_words"] == 3
    assert got[2]["n_sentences"] == 1  # whole doc = one sentence
    assert 3 not in got  # punctuation-only doc has no sentences
