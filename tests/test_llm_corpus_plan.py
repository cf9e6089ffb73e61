"""End-to-end test of plans/llm_corpus.py with planted defects: each
pipeline stage must remove exactly the documents planted for it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.plans.llm_corpus import (
    CorpusConfig,
    build_corpus,
)

D0 = "the alpha study is about unique heart medicine outcomes for patients"
D1 = "a beta archive is regarding stars galaxies and cosmic dust tonight"
D2 = ("the gamma report is covering rivers mountains valley water "
      "levels call 555-111-2222")
BENCH = ("the holdout benchmark is asking which river flows beside "
         "the tall mountain range now")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # survivors — pairwise-dissimilar bodies, English markers
        (0, D0),
        (1, D1),
        (2, D2),
        # exact duplicate of 0 -> dropped at exact dedup (keep min id)
        (10, D0),
        # near duplicate of 1 (last word changed: 8/10 shingle overlap)
        (11, D1.replace("tonight", "today")),
        # too short -> dropped at quality
        (12, "tiny doc"),
        # different phone number than doc 2 -> identical AFTER the PII
        # scrub -> dropped at exact dedup (the scrub-before-dedup rule)
        (13, D2.replace("555-111-2222", "555-999-8888")),
        # contaminated: verbatim copy of the benchmark text
        (14, BENCH),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, BENCH)],
        "doc_id long, text string",
    )


def test_build_corpus_stage_accounting(spark, corpus, bench_docs):
    cfg = CorpusConfig(
        min_tokens=5,
        min_alpha_ratio=0.3,
        gopher_min_mean_word_len=1.0,
        gopher_min_stop_hits=1,
        jaccard_threshold=0.6,
        contamination_ngram=8,
        contamination_threshold=0.5,
        bpe_merges=30,
        chunk_window=16,
        chunk_stride=12,
    )
    out, st = build_corpus(corpus, benchmark=bench_docs, config=cfg)

    assert st.input_docs == 8
    assert st.after_quality == 7  # doc 12 out
    assert st.after_exact_dedup == 5  # docs 10, 13 out (13 dups 2)
    assert st.after_near_dedup == 4  # doc 11 out
    assert st.after_contamination == 3  # doc 14 out

    rows = out.collect()
    kept_docs = {r.doc_id for r in rows}
    assert kept_docs == {0, 1, 2}
    # chunks: bounded by window, inherit one split per doc, cover text
    assert all(r.n_chunk_tokens <= cfg.chunk_window for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_doc.values())
    # n_tokens (BPE) present and positive on every chunk row
    assert all(r.n_tokens > 0 for r in rows)


def test_build_corpus_no_benchmark_skips_decontamination(spark, corpus):
    cfg = CorpusConfig(
        min_tokens=5,
        min_alpha_ratio=0.3,
        gopher_min_mean_word_len=1.0,
        gopher_min_stop_hits=1,
        jaccard_threshold=0.6,
        bpe_merges=10,
        chunk_window=16,
        chunk_stride=12,
    )
    out, st = build_corpus(corpus, benchmark=None, config=cfg)
    assert st.after_contamination == st.after_near_dedup == 4
    assert {r.doc_id for r in out.collect()} == {0, 1, 2, 14}
