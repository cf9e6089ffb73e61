"""Hand-computed unit tests for the wave-5 corpus operators (q84-q89).

The oracle battery (tests/test_oracle.py) checks the registered queries
against DuckDB; these tests pin the OPERATOR semantics on tiny fixtures
where the expected output is derivable by hand — span merging edge
cases, quota nesting, NFC idempotence, SemDeDup pruning — which the
synthetic corpus can't isolate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.dedup import (
    duplicate_spans,
    semantic_dedup,
)
from mimic_iv_data_pipeline_spark.operators.sampling import quota_sample
from mimic_iv_data_pipeline_spark.operators.text import (
    gopher_quality,
    nfc_normalize,
)


# --- duplicate_spans ---------------------------------------------------------


def _spans(spark, rows, k=5):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(df, "doc_id", k=k)
    return {r["doc"]: (r["n_dup_spans"], r["dup_tokens"], r["n_tokens"]) for r in out.collect()}


def test_duplicate_spans_single_shared_gram(spark):
    got = _spans(
        spark,
        [(1, "a b c d e f g h"), (2, "x a b c d e y z")],
    )
    # the only shared 5-gram is "a b c d e": one span of 5 tokens each
    assert got[1] == (1, 5, 8)
    assert got[2] == (1, 5, 8)


def test_duplicate_spans_overlap_merges_to_full_doc(spark):
    got = _spans(spark, [(1, "m n o p q r s"), (2, "m n o p q r s")])
    # identical docs: all 3 sliding windows duplicated, overlapping
    # starts 1..3 merge into ONE island covering all 7 tokens
    assert got[1] == (1, 7, 7)
    assert got[2] == (1, 7, 7)


def test_duplicate_spans_gap_splits_islands(spark):
    # "a b c d e" repeats at positions 1 and 12 of doc 1 (and exists in
    # doc 2); middle filler Z1..Z6 is unique → two separate spans
    got = _spans(
        spark,
        [
            (1, "a b c d e z1 z2 z3 z4 z5 z6 a b c d e"),
            (2, "q a b c d e w"),
        ],
    )
    assert got[1] == (2, 10, 16)
    assert got[2] == (1, 5, 7)


def test_duplicate_spans_no_dups_and_short_docs(spark):
    got = _spans(spark, [(1, "a b c d e f"), (2, "p q r s t u"), (3, "x y")])
    # no shared 5-grams anywhere; doc 3 is shorter than the window
    assert got[1] == (0, 0, 6)
    assert got[2] == (0, 0, 6)
    assert got[3] == (0, 0, 2)


def test_duplicate_spans_within_one_doc(spark):
    # repetition INSIDE a single document counts too (min_df counts
    # occurrences, not distinct docs)
    got = _spans(spark, [(1, "a b c d e x x a b c d e")])
    assert got[1] == (2, 10, 12)


# --- quota_sample ------------------------------------------------------------


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, f"s{i % 3}") for i in range(90)]
    return spark.createDataFrame(rows, ["id", "src"])


def test_quota_sample_exact_counts_and_cap(spark, strata_df):
    out = quota_sample(strata_df, "id", "src", {"s0": 7, "s1": 30, "s2": 100})
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 7, "s1": 30, "s2": 30}  # s2 capped at stratum size


def test_quota_sample_nested_and_stable(spark, strata_df):
    small = {r["id"] for r in quota_sample(strata_df, "id", "src", {"s0": 5}).collect()}
    big = {r["id"] for r in quota_sample(strata_df, "id", "src", {"s0": 11}).collect()}
    assert small < big  # growing a quota never redraws
    # repartition-invariant: same drawn set under a different layout
    re = {r["id"] for r in quota_sample(strata_df.repartition(13), "id", "src", {"s0": 5}).collect()}
    assert re == small


def test_quota_sample_drops_unlisted_strata(spark, strata_df):
    out = quota_sample(strata_df, "id", "src", {"s1": 4})
    assert {r["src"] for r in out.collect()} == {"s1"}


# --- nfc_normalize -----------------------------------------------------------


def test_nfc_normalize_composes_and_is_idempotent(spark):
    decomp = "résumé"
    precomp = "résumé"
    df = spark.createDataFrame([(1, decomp), (2, precomp), (3, None)], ["id", "text"])
    out = nfc_normalize(df, "text").orderBy("id").collect()
    assert out[0]["text_nfc"] == precomp  # composed
    assert out[1]["text_nfc"] == precomp  # fixed point
    assert out[2]["text_nfc"] is None  # null-safe
    # idempotent: normalizing the normalized column is identity
    again = nfc_normalize(
        spark.createDataFrame([(1, precomp)], ["id", "text"]), "text"
    ).collect()
    assert again[0]["text_nfc"] == precomp


# --- gopher_quality ----------------------------------------------------------


def test_gopher_quality_hand_computed(spark):
    good = " ".join(["the", "batch", "value", "with", "table"] * 5)  # 25 toks
    short = "the tiny one"  # fails min_tokens
    symbols = " ".join(["###"] * 25)  # symbol ratio 1.0, no alpha
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality(df, min_tokens=20, min_stop_hits=2).collect()
    }
    g = out[1]
    assert g["g_n_tokens"] == 25
    assert g["g_mean_word_len"] == pytest.approx((3 + 5 + 5 + 4 + 5) * 5 / 25)
    assert g["g_symbol_ratio"] == 0.0
    assert g["g_alpha_word_frac"] == 1.0
    assert g["g_stop_hits"] == 10  # 'the' ×5 + 'with' ×5
    assert g["keep"] is True
    assert out[2]["keep"] is False  # too short
    s = out[3]
    # each "###" token contributes three '#' hits → 75/25 = 3 symbols/word
    assert s["g_alpha_word_frac"] == 0.0 and s["g_symbol_ratio"] == 3.0
    assert s["keep"] is False


# --- semantic_dedup ----------------------------------------------------------


def test_semantic_dedup_prunes_planted_duplicates(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant exact duplicates of vectors 0..4 as ids 100..104
    rows += [(100 + i, base[i].tolist()) for i in range(5)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(emb, "vec_id", "embedding", n_clusters=4, threshold=0.999)
    flags = {r["id"]: r["pruned"] for r in out.collect()}
    assert len(flags) == 45
    # every planted copy has a smaller-id twin in its (identical) cluster
    for i in range(5):
        assert flags[100 + i] is True
        assert flags[i] is False
    # random gaussian vectors in 8-d are nowhere near cos 0.999
    assert sum(flags.values()) == 5
    # deterministic: second run identical
    again = {r["id"]: r["pruned"] for r in
             semantic_dedup(emb, "vec_id", "embedding", n_clusters=4, threshold=0.999).collect()}
    assert again == flags


class TestChunkDocuments:
    def _chunks(self, spark, rows, window=5, stride=3):
        from mimic_iv_data_pipeline_spark.operators.text import chunk_documents

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_documents(df, "doc_id", "text", window=window, stride=stride)
        return sorted(
            (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
            for r in out.collect()
        )

    def test_short_doc_single_chunk(self, spark):
        got = self._chunks(spark, [(0, "a b c")])
        assert got == [(0, 0, 3, "a b c")]

    def test_empty_docs_yield_nothing(self, spark):
        assert self._chunks(spark, [(0, ""), (1, "   ")]) == []

    def test_overlap_and_tail(self, spark):
        text = " ".join(f"t{i}" for i in range(9))  # n=9, window=5, stride=3
        got = self._chunks(spark, [(0, text)])
        # stride starts [0, 3] plus the coverage tail at n-window=4
        assert [(c[1], c[3]) for c in got] == [
            (0, "t0 t1 t2 t3 t4"),
            (1, "t3 t4 t5 t6 t7"),
            (2, "t4 t5 t6 t7 t8"),
        ]
        covered = {t for c in got for t in c[3].split()}
        assert covered == {f"t{i}" for i in range(9)}

    def test_exact_cover_no_dup_tail(self, spark):
        text = " ".join(f"t{i}" for i in range(8))  # n-window=3 aligned
        got = self._chunks(spark, [(0, text)])
        assert [c[3] for c in got] == ["t0 t1 t2 t3 t4", "t3 t4 t5 t6 t7"]
        covered = {t for c in got for t in c[3].split()}
        assert covered == {f"t{i}" for i in range(8)}
