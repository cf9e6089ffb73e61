"""End-to-end LLM pretraining-corpus recipe as ONE composable plan.

The batch counterpart of the C4 / Gopher / Dolma / RefinedWeb build
sequence, chaining this repo's operators in their canonical order:

    1. canonicalize   — Unicode NFC (`text.nfc_normalize`)
    2. quality gate   — heuristics + Gopher word rules + language ID
    3. PII scrub      — `privacy.with_pii_scrub`
    4. exact dedup    — content-hash keep-first (`dedup.exact_dedup`)
    5. near dedup     — n-gram Jaccard pairs → connected components →
                        keep canonical (`graph.dedup_keep_canonical`)
    6. contamination  — drop docs sharing ≥ threshold shingles with the
                        provided benchmark set (`dedup.ngram_contamination`)
    7. split          — content-addressed hash split (train/valid/test)
    8. tokenize+chunk — BPE encode (`bpe`), context windows
                        (`text.chunk_documents`)

Every stage is a DataFrame→DataFrame function; the composition stays a
single lazy plan per output except where an operator is inherently
multi-pass (near-dup verification, BPE training). ``CorpusStats``
counts each stage's survivors with ONE action per stage boundary —
at 100 TB you run it with ``stats=False`` and let the sinks count.

Stage order is load-bearing and matches the published recipes: NFC
before hashing (else equal texts hash apart), PII before dedup (else
scrubbing resurrects near-dups), dedup before contamination (cheaper),
split AFTER all corpus-level filters (else the split drifts as filters
change), chunking last (chunks inherit the doc's split so no window
leaks across train/valid).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.bpe import bpe_encode, bpe_train
from mimic_iv_data_pipeline_spark.operators.dedup import (
    exact_dedup_groups,
    ngram_jaccard_pairs,
    word_shingles,
)
from mimic_iv_data_pipeline_spark.operators.graph import dedup_keep_canonical
from mimic_iv_data_pipeline_spark.operators.privacy import with_pii_scrub
from mimic_iv_data_pipeline_spark.operators.sampling import hash_split
from mimic_iv_data_pipeline_spark.operators.text import (
    chunk_documents,
    gopher_quality,
    nfc_normalize,
    predict_language,
    with_quality_metrics,
)


@dataclass
class CorpusConfig:
    min_tokens: int = 5
    min_alpha_ratio: float = 0.5
    # Gopher word-rule bounds (full-strictness defaults live on the
    # operator; the plan exposes the two most corpus-dependent knobs)
    gopher_min_mean_word_len: float = 3.0
    gopher_min_stop_hits: int = 2
    languages: tuple[str, ...] = ("en",)
    jaccard_threshold: float = 0.8
    contamination_ngram: int = 8
    contamination_threshold: float = 0.5
    split_fractions: dict = field(
        default_factory=lambda: {"train": 0.9, "valid": 0.05, "test": 0.05}
    )
    bpe_merges: int = 100
    chunk_window: int = 512
    chunk_stride: int = 448


@dataclass
class CorpusStats:
    input_docs: int = 0
    after_quality: int = 0
    after_exact_dedup: int = 0
    after_near_dedup: int = 0
    after_contamination: int = 0
    train_chunks: int = 0
    # wall-clock seconds per stage boundary (the time from the previous
    # boundary's action to this one's — i.e. what the stage ADDED,
    # including the recompute of its lazy prefix; populated only when
    # ``stats=True``). Keys mirror the count fields above.
    stage_seconds: dict = field(default_factory=dict)


def build_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    config: CorpusConfig | None = None,
    stats: bool = True,
    reuse: bool = True,
) -> tuple[DataFrame, CorpusStats]:
    """Run the full recipe; returns ``(chunked_tokenized_corpus, stats)``.

    Output schema: ``(doc_id, split, chunk_id, n_chunk_tokens,
    chunk_text, n_tokens)`` — one row per context window, each window
    wholly inside one document and one split.

    ``reuse=True`` (default) pins the four MULTI-CONSUMER stage
    boundaries via :func:`~mimic_iv_data_pipeline_spark.engine.materialize`
    (post-PII, post-exact-dedup, post-near-dedup, post-split). Without
    it every stage that reads ``out`` more than once (dedup's
    group+semi-join pair, contamination's shingle aggregate + anti
    join, and stage 8's FOUR readers: BPE train, BPE encode, chunking,
    the split join) re-executes the whole upstream chain, and the
    recompute multiplies DOWN the chain — the r11 5M-doc probe measured
    stage 8 alone at 67% of the composed wall-clock from exactly this
    amplification (PERF r11). ``reuse=False`` keeps the old fully-lazy
    single-plan behavior for one-shot sub-corpus calls. Values are
    identical either way (materialize is a physical pin, not an
    operator; the q129-family twins stay green).
    """
    import time as _time

    from mimic_iv_data_pipeline_spark.engine import materialize

    def _pin(df: DataFrame) -> DataFrame:
        return materialize(df) if reuse else df

    cfg = config or CorpusConfig()
    st = CorpusStats()
    _t0 = _time.perf_counter()

    def _mark(field_name: str, n: int) -> int:
        nonlocal _t0
        now = _time.perf_counter()
        st.stage_seconds[field_name] = round(now - _t0, 3)
        _t0 = now
        return n

    if stats:
        st.input_docs = _mark("input_docs", docs.count())

    # 1-2: canonicalize, then the cheap narrow gates first (quality,
    # language) so every later stage touches fewer rows
    out = nfc_normalize(docs, "text", out_col="text")
    out = with_quality_metrics(out, "text")
    out = predict_language(out, "text")
    out = gopher_quality(
        out,
        min_tokens=cfg.min_tokens,
        min_mean_word_len=cfg.gopher_min_mean_word_len,
        min_stop_hits=cfg.gopher_min_stop_hits,
    )
    out = out.filter(
        (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("alpha_ratio") >= cfg.min_alpha_ratio)
        & F.col("pred_lang").isin(*cfg.languages)
        & F.col("keep")
    )
    out = out.select(*docs.columns)
    if stats:
        st.after_quality = _mark("after_quality", out.count())

    # 3: PII scrub (before dedup: two docs differing only in a phone
    # number SHOULD collapse once scrubbed). Pinned: stage 4 reads it
    # twice (digest aggregate + semi join).
    out = with_pii_scrub(out, "text").withColumn("text", F.col("redacted"))
    out = _pin(out.select(*docs.columns))

    # 4: exact dedup on the scrubbed canonical text — keep each digest
    # group's minimum id (one hash aggregate + a semi join)
    keep_ids = exact_dedup_groups(out, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    out = _pin(out.join(keep_ids, "doc_id", "left_semi"))
    if stats:
        st.after_exact_dedup = _mark("after_exact_dedup", out.count())

    # 5: near dedup — thresholded pair list is tiny vs the corpus; the
    # closure takes the driver union-find fast path under driver_cap
    pairs = ngram_jaccard_pairs(out, "doc_id", n=3, threshold=cfg.jaccard_threshold)
    out = _pin(dedup_keep_canonical(out, pairs, id_col="doc_id"))
    if stats:
        st.after_near_dedup = _mark("after_near_dedup", out.count())

    # 6: benchmark decontamination (GPT-3 appendix-C direction: drop
    # TRAINING docs overlapping the benchmark). The benchmark collapses
    # to its distinct shingle vocabulary BEFORE the join (the q65
    # shape); a corpus doc is dirty when ≥ threshold of its distinct
    # n-grams appear in that vocabulary.
    if benchmark is not None:
        n = cfg.contamination_ngram
        bench_vocab = benchmark.select(
            F.explode(word_shingles(F.col("text"), n)).alias("sh")
        ).distinct()
        corpus_sh = out.select(
            "doc_id", F.explode(word_shingles(F.col("text"), n)).alias("sh")
        )
        # ONE pass over the exploded shingles (r11): a left join against
        # the DISTINCT benchmark vocabulary (cannot duplicate rows)
        # carries a hit flag, so hits and totals come from a single
        # aggregate — the old left_semi + second groupBy scanned the
        # shingle relation twice
        dirty = (
            corpus_sh.join(
                bench_vocab.withColumn("__hit", F.lit(1)), "sh", "left"
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("__total"),
                F.coalesce(F.sum("__hit"), F.lit(0)).alias("__hits"),
            )
            .filter(F.col("__hits") / F.col("__total") >= cfg.contamination_threshold)
            .select("doc_id")
        )
        out = out.join(dirty, "doc_id", "left_anti")
    if stats:
        st.after_contamination = _mark("after_contamination", out.count())

    # 7: content-addressed split — stable under every upstream change
    # that doesn't touch the surviving doc_ids. Pinned: stage 8 reads
    # it FOUR times (BPE train, BPE encode, chunking, the split join).
    out = _pin(hash_split(out, "doc_id", cfg.split_fractions))

    # 8: BPE + chunking; chunks inherit the document's split
    merges = bpe_train(out, "text", num_merges=cfg.bpe_merges)
    toks = bpe_encode(out, "doc_id", "text", merges)
    chunks = chunk_documents(out, "doc_id", "text", cfg.chunk_window, cfg.chunk_stride)
    result = (
        chunks.join(out.select("doc_id", "split"), "doc_id")
        .join(toks.select("doc_id", "n_tokens"), "doc_id")
    )
    if stats:
        st.train_chunks = _mark(
            "train_chunks", result.filter(F.col("split") == "train").count()
        )
    return result, st


def dedup_snapshot(
    new_docs: DataFrame,
    index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    reuse: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One nightly increment of corpus near-dedup: the mode real
    pipelines run when the corpus grows in snapshots (Lee et al. 2022
    §4's incremental setting).

    Returns ``(survivors, new_index)``:

    * ``survivors`` — new docs kept after (a) dropping any doc whose
      signature-estimated Jaccard vs an INDEXED doc is ≥ ``threshold``
      (cross-batch: earlier crawls win), then (b) within-batch
      connected-components dedup of the remainder (keep each cluster's
      min id, same policy as ``build_corpus`` stage 5) — so the kept
      set is an independent set of the flagged-pair graph.
    * ``new_index`` — the input index plus the survivors' band rows;
      persist/write it (partitioned by ``band``) and feed it to the
      next snapshot. Only SURVIVORS are indexed: the accepted corpus
      is what future batches must not duplicate.

    Scale shape: the new batch is shingled/signatured ONCE (the banded
    relation feeds the index probe, the within-batch self-join, and
    the index append); the cross-batch check is an equi-join on
    (band, bucket) — O(|new| · hits) with the index side partition-
    pruned by band — and the OLD CORPUS TEXT IS NEVER RESCANNED. Per-
    snapshot cost is O(new batch) + index-join, vs re-running
    ``minhash_lsh_pairs`` over old ∪ new every night.

    Semantics note (tested in ``tests/test_llm_corpus_plan.py``): on
    clique-shaped duplicate groups — the overwhelmingly common case,
    e.g. re-crawls of the same page — N-snapshot incremental keeps
    EXACTLY the docs a one-shot batch dedup of the union keeps. The
    two can differ only on cross-batch CHAINS (b≈a accepted earlier,
    c≈b but c̸≈a: one-shot's component merge drops c, incremental
    keeps it — by then b was never accepted, so c duplicates nothing
    IN THE CORPUS). That is the defining behavior of first-crawl-wins
    incremental dedup, not an approximation error.

    ``reuse=True`` persists the snapshot's banded relation (three
    consumers: index probe, within-batch self-join, index append).
    One entry per DISTINCT snapshot stays pinned for the session's
    life (CacheManager dedups identical plans only) — the designed
    nightly loop runs one snapshot per session/job, where that is
    exactly right; a long-lived session looping many snapshots
    in-process should pass ``reuse=False``, or better, WRITE
    ``new_index`` each night (the documented deployment: the write
    materializes it, and the next night reads the parquet — nothing
    stays pinned).
    """
    from mimic_iv_data_pipeline_spark.operators.incremental import (
        build_minhash_index,
        dedup_banded_against_index,
        within_batch_pairs,
    )

    banded = build_minhash_index(
        new_docs, id_col, text_col, n=n, num_hashes=num_hashes, bands=bands
    )
    if reuse:
        banded = banded.persist()

    if index is not None:
        cross = dedup_banded_against_index(
            banded, index=index, threshold=threshold, num_hashes=num_hashes
        )
        dropped = cross.select(F.col("new_id").alias(id_col)).distinct()
        remaining = new_docs.join(dropped, id_col, "left_anti")
        banded_remaining = banded.join(
            dropped.withColumnRenamed(id_col, "doc"), "doc", "left_anti"
        )
    else:
        remaining = new_docs
        banded_remaining = banded

    pairs = within_batch_pairs(
        banded_remaining, threshold=threshold, num_hashes=num_hashes
    )
    survivors = dedup_keep_canonical(remaining, pairs, id_col=id_col)
    surv_banded = banded_remaining.join(
        survivors.select(F.col(id_col).alias("doc")), "doc", "left_semi"
    )
    new_index = surv_banded if index is None else index.unionByName(surv_banded)
    return survivors, new_index
