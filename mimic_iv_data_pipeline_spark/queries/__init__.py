"""Driver-facing query registry.

Each submodule registers named queries: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` at the repo root
re-exports the merged registry for the correctness driver.

Conventions (driver compare = row count + schema + order-insensitive
value hash with columns sorted by name):
  * every computed column is aliased IDENTICALLY in Spark and SQL;
  * floating-point aggregates are rounded to a fixed scale on BOTH
    sides so engine-order summation noise can't flip the hash;
  * timestamps in outputs are formatted to strings (tz-proof);
  * integer-ish outputs are cast to long/BIGINT on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}

_MODULES = [
    "relational",
    "analytic",
    "temporal",
    "text",
    "similarity",
    "coverage",
    "llmops",
    "corpus",
]

# Driver-window rotation schedule (standing, from round 4). The correctness
# driver records rows for only the FIRST 50 registry entries per round. With
# 123 registered queries the window is allocated as:
#   (a) REDS + never-driver-checked queries first (must-have rows),
#   (b) new queries added this round,
#   (c) a STABLE 15-query regression core (one per operator family; also the
#       baseline-comparable bench subset) that stays in every round:
#       q03 q04 q08 q14 q15 q17 q18 q19 q20 q26 q32 q34 q39 q42 q45,
#   (d) a ROTATING block filling the window to 50, drawn round-robin from the
#       remaining queries ordered by driver-row age (oldest first), so every
#       query re-earns a driver row at least every ~3 rounds.
#
# r4 manifest: (a) q78 (r3 red, array→CSV fix) + q84-q96 (13, never checked);
#   (b) q97-q116 (new this round — 20 first driver rows); (c) the core;
#   (d) 1 query whose last driver row is r1: q01. q117-q123 (added after
#   the window filled) are NOT prioritized this round — they are covered
#   by the local oracle battery and lead r5's (a) block.
# r5 plan: (a) any r4 reds + never-driver-checked q117-q123; (d) the
#   remaining r1-aged block q02 q05 q06 q07 q09 q10 q11 q12 q13 q16 q21
#   q22 q23 q25 q27 q28 q29 q30 q31 q33 q35 q36 q37 q38 q46 q47, then
#   the oldest of the r3 block (q48-q77, q79-q83) and rows-only entries
#   (q40 q41 q44 q53 q60) to fill 50.
_PRIORITY = [
    # (a) r3 red (driver-canonicalizer array crash; output now CSV string)
    "q78_quantize_int8",
    # (a) never driver-checked — wave-5 block
    "q84_nfc_normalize",
    "q85_duplicate_spans",
    "q86_gopher_rules",
    "q87_semantic_dedup",
    "q88_dedup_clean",
    "q89_quota_sample",
    "q90_covariance_matrix",
    "q91_pca_project",
    "q92_edit_distance_join",
    "q93_bpe_tokenize",
    "q94_source_quantiles",
    "q95_chunk_overlap",
    "q96_weighted_sample",
    # (b) new in round 4
    "q97_kfold",
    "q98_oversample",
    "q99_edit_distance_sparse",
    "q100_stratified_kfold",
    "q101_k_anonymity",
    "q102_pq_encode",
    "q103_pq_topk",
    "q104_pq_rerank",
    "q105_wordpiece",
    "q106_unigram_lm",
    "q107_incremental_dedup",
    "q108_kneser_ney",
    "q109_sentence_stats",
    "q110_zipf_slope",
    "q111_token_entropy",
    "q112_tfidf_cosine_pairs",
    "q113_bm25",
    "q114_ivfpq",
    "q115_kmeans",
    "q116_theta_sets",
    # (c) stable regression core — keep identical across rounds
    "q03_revenue_by_nation",
    "q04_semi_join",
    "q08_outer_join_fill",
    "q14_code_mapping",
    "q15_mode_per_group",
    "q17_topk_per_group",
    "q18_readmission_label",
    "q19_asof_join",
    "q20_ffill_bfill",
    "q26_vocab_build",
    "q32_pivot_wide",
    "q34_dedup_exact",
    "q39_ngram_jaccard",
    "q42_cosine_topk",
    "q45_set_ops",
    # (d) rotating block — last driver row was r1
    "q01_pricing_summary",
    # q02/q05-q07/q09-q13/q16/q21/q22/q23/q25/q27/q28/q29/q30 rotated to r5
    # (their operator families keep representatives: q16's clamp family
    # via q20 fills, q14 string/mapping fns, q45 set ops for unions,
    # q51/q57 calibration+AUC had r3 rows, q96 TakeOrdered, q54 rollup)
    # so this round's new queries (q97-q116) get first driver rows
    # within the 50-row window.
]


def _ordered(d: dict) -> dict:
    named = {k: d[k] for k in _PRIORITY if k in d}
    rest_oracle = {k: v for k, v in d.items() if k not in named and k in _ORACLES}
    rest_noracle = {k: v for k, v in d.items() if k not in named and k not in _ORACLES}
    return {**named, **rest_oracle, **rest_noracle}


def register(name: str, oracle: str | None = None):
    """Decorator: register a spark query and its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)
