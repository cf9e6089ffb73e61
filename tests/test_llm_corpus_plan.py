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


# ---------------------------------------------------------------------------
# dedup_snapshot: the incremental (nightly) near-dedup mode
# ---------------------------------------------------------------------------


def _mk_texts():
    """Deterministic distinct word-soup texts (no shared 3-grams across
    different base texts, so cross-text estimated Jaccard is ~0)."""
    import hashlib

    def words(tag, k=40):
        return " ".join(
            hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:10] for i in range(k)
        )

    return {i: words(f"base{i}") for i in range(1, 10)}


@pytest.fixture(scope="module")
def snapshots(spark):
    t = _mk_texts()
    # clique-shaped duplicate groups (exact copies — the re-crawl case),
    # ids monotone in snapshot order
    s1 = [(1, t[1]), (2, t[2]), (3, t[3]), (4, t[4]), (5, t[5])]
    s2 = [(11, t[1]), (12, t[2]), (13, t[6]), (14, t[7]), (15, t[8]),
          (16, t[6]), (17, t[6])]
    s3 = [(21, t[1]), (22, t[6]), (23, t[9]), (24, t[9])]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(s1), mk(s2), mk(s3)


def _run_incremental(snaps, threshold=0.5):
    from mimic_iv_data_pipeline_spark.plans.llm_corpus import dedup_snapshot

    index = None
    kept = []
    for s in snaps:
        surv, index = dedup_snapshot(s, index, threshold=threshold)
        kept.extend(r.doc_id for r in surv.select("doc_id").collect())
    return sorted(kept), index


def test_dedup_snapshot_clique_equals_one_shot(spark, snapshots):
    """On clique-shaped duplicate groups, N-snapshot incremental keeps
    exactly what a one-shot batch dedup of the union keeps."""
    from mimic_iv_data_pipeline_spark.plans.llm_corpus import dedup_snapshot

    kept_inc, index = _run_incremental(snapshots)
    union = snapshots[0].unionByName(snapshots[1]).unionByName(snapshots[2])
    one_shot, _ = dedup_snapshot(union, None)
    kept_one = sorted(r.doc_id for r in one_shot.select("doc_id").collect())
    # groups: {1,11,21} {2,12} {13,16,17,22} {23,24}; singles 3,4,5,14,15
    assert kept_inc == kept_one == [1, 2, 3, 4, 5, 13, 14, 15, 23]
    # the index holds exactly the survivors' band rows
    assert {r.doc for r in index.select("doc").distinct().collect()} == set(kept_inc)


def test_dedup_snapshot_partition_invariant(spark, snapshots):
    a, _ = _run_incremental(snapshots)
    shuffled = tuple(s.repartition(7) for s in snapshots)
    b, _ = _run_incremental(shuffled)
    assert a == b


def test_dedup_snapshot_kept_set_is_independent(spark, snapshots):
    """No two kept docs (across all snapshots) are a flagged pair —
    the defining invariant of the accepted corpus."""
    from mimic_iv_data_pipeline_spark.operators.incremental import (
        build_minhash_index,
        within_batch_pairs,
    )

    kept, _ = _run_incremental(snapshots)
    union = snapshots[0].unionByName(snapshots[1]).unionByName(snapshots[2])
    kept_docs = union.filter(F.col("doc_id").isin(kept))
    banded = build_minhash_index(kept_docs, "doc_id", "text")
    assert within_batch_pairs(banded, threshold=0.5).count() == 0


def test_dedup_snapshot_chain_semantics(spark):
    """Cross-batch CHAINS are where incremental (first-crawl-wins) and
    one-shot (component-merge) legitimately differ; pin both sides.
    a=XY accepted in snapshot 1; b=XYZ (dup of a) arrives and is
    dropped in snapshot 2; c=YZ (dup of b, NOT of a) arrives in
    snapshot 3: incremental keeps c (b never entered the corpus),
    one-shot merges {a,b,c} and keeps only a."""
    import hashlib

    from mimic_iv_data_pipeline_spark.plans.llm_corpus import dedup_snapshot

    blk = lambda tag, k=25: " ".join(
        hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:10] for i in range(k)
    )
    X, Y, Z = blk("X"), blk("Y"), blk("Z")
    a, b, c = f"{X} {Y}", f"{X} {Y} {Z}", f"{Y} {Z}"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    snaps = [mk([(1, a)]), mk([(2, b)]), mk([(3, c)])]

    kept_inc, _ = _run_incremental(snaps, threshold=0.5)
    assert kept_inc == [1, 3]
    one_shot, _ = dedup_snapshot(
        mk([(1, a), (2, b), (3, c)]), None, threshold=0.5
    )
    assert sorted(r.doc_id for r in one_shot.collect()) == [1]
