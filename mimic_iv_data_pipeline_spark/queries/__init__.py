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
    "stats",
]

# Driver-window rotation schedule (standing, from round 4). The correctness
# driver records rows for only the FIRST 50 registry entries per round. With
# 138 registered queries the window is allocated as:
#   (a) REDS + never-driver-checked queries first (must-have rows),
#   (b) new queries added this round,
#   (c) a STABLE 15-query regression core (one per operator family; also the
#       baseline-comparable bench subset) that stays in every round:
#       q03 q04 q08 q14 q15 q17 q18 q19 q20 q26 q32 q34 q39 q42 q45,
#   (d) a ROTATING block filling the window to 50, drawn round-robin from the
#       remaining queries ordered by driver-row age (oldest first), so every
#       query re-earns a driver row at least every ~3 rounds.
#
# r5 manifest: (a) q117-q123 (added after r4's window filled — 7 first
#   driver rows); (b) q124-q138 (new this round: the fixed-parameter
#   oracle family — ADC search/rerank, WordPiece + unigram encode,
#   MinHash-LSH md5, exact-probe RAG, incremental-dedup md5, SimHash
#   md5, hyperplane-LSH md5, IVF fixed-centroid, SemDeDup
#   fixed-centroid, BPE fixed-merge-list, IVF-PQ fixed, one-step
#   Lloyd fixed, PCA fixed-basis projection — 15 first driver rows),
#   PLUS the r5 second-wave operators q139-q147 (SCD-2 history,
#   table profile, expectations validation, PageRank, ANN recall@5,
#   point-in-time join, Bloom-prefiltered join, incremental rollup
#   merge, unpivot, retention cohorts, grouping sets, MMR re-rank — 12
#   more first driver rows);
#   (c) the
#   core; (d) 1 of the 26 r1-aged queries: q16
#   (q33 event-time normalize defers — q18/q19 core date arithmetic +
#   q49 interval family; q37 lang-id defers — bench-tracked every round and its
#   text-stat family is q109/q111/q86 r4-green; q21 sessionize defers — its event-window family is
#   covered by q148 fresh this round plus the streaming sessionize
#   tests). The rest held back to fit the window
#   keep family coverage elsewhere (q02 filter/project ~ q03/q08
#   core scans; q05 anti-join ~ q04 semi-join core + q141's FK
#   anti-join fresh this round; q06 dedup-first ~ q34 dedup + q15
#   window core;
#   q07 clamp ~ q16 same clamp family in-window; q11 string fns ~
#   q14 core substring/EPC family; q25 rank-AUC ~ q51/q52/q57 eval
#   family; q27 global topk ~
#   q17 per-group topk core; q29 hourly buckets ~ q31/q33 temporal
#   rows (q33 in-window) + bench-tracked; q31 dense grid ~ q33
#   in-window + q49 interval family; q09 unions ~ q45 set-ops core;
#   q10 distinct counts ~ q01/q45 agg core; q22 quantile bins ~ q94
#   source-quantiles r4-green; q23 calibration bins ~ q51/q52/q57
#   eval family r3-green; q12 date fns ~
#   q18/q19 core date arithmetic; q13 json ~ q11 scalar fns; q28
#   rollup ~ q54 cube r3-green; q30 tumbling twin of q29; q35/q36
#   token/quality stats ~ q109/q111/q86 fresh in r4; q38 fingerprint
#   ~ q34 dedup core; q46 one-hot ~ q45; q47 label-encode ~ q26
#   vocab core) and LEAD r6's (d) block with r3-aged/rows-only rows.
# r6 plan: (a) any r5 reds, then the third/fourth/fifth/sixth-wave
#   queries added after the r5 window filled — 35 never-driver-checked
#   rows, all oracled and green in the local battery this round:
#   q151 triangle count, q152 nDCG@5, q153 funnel, q154 target
#   encoding, q155 token budget, q156 MAD outliers, q157 mutual
#   information, q158 CUPED A/B, q159 label propagation, q160 Pareto
#   front, q161 temporal split, q162 Kaplan-Meier, q163 log-rank,
#   q164 funnel lag, q165 chi-square, q166 PSI drift, q167 KS, q168
#   association rules, q169 transition matrix, q170 CDC apply, q171
#   event-time rolling aggregates, q172 interval merge, q173 EWMA,
#   q174 CUSUM, q175 ROC/PR curve, q176 lift/gains, q177 grouped OLS,
#   q178 seasonal z-score, q179 ACF, q180 bootstrap CI, q181
#   Mann-Whitney, q182 ANOVA, q183 BH-FDR, q184 PMI collocations,
#   q185 item CF neighbors, q186 BFS levels, q187 Holt trend, q188
#   session stats, q189 TextRank, q190 Naive Bayes, q191 RFM, q192
#   seasonal decomposition, q193 attribution, q194 split gain, q195
#   WoE/IV, q196 isotonic, q197 SMD balance, q198 epi 2x2, q199
#   forecast backtest, q200 weighted shortest paths, q201 Benford,
#   q202 time-decay features, q203 geo radius join, q204 golden
#   records, q205 concentration, q206 Weibull fit (that is 56 —
#   the 50-row window minus (c)'s 15-core fits 35, so cut in
#   this order, each covered by a fresh green sibling family:
#   q172/q174 (q171 RANGE frame + q173 fold in-window), q178/q179
#   (q177 exact-sum stats), q188 (q21 sessionize + q148 cohorts),
#   q191 (q22-family ntile), q175 (q176 shares the prefix-sum
#   engine), q164 (q153 funnel recurrence), q165/q166 (q167 KS +
#   q157 MI cover the diagnostics family), q197 (q158 CUPED shares
#   the two-group moment shape), q185 (q168 shares the basket pair
#   join), q183 (its windows are q194's cum shape; p-values
#   synthetic), q187/q192 (q173's fold + q171's frame twins),
#   q186 (q200 relaxes the same frontier shape with weights),
#   q199 (q187's fold + micro-quantized sums shared with q175)); (c)
#   the core; (d)
#   q02 q05 q06 q07 q09 q10 q11 q12 q13 q21 q22 q23 q25 q27 q28 q29
#   q30 q31 q33 q35 q36 q37 q38 q46 q47, then oldest r3-block entries
#   (q48-q83 not re-checked since r3) and rows-only entries (q40 q41
#   q44 q53 q60 q87 q91 q93 q102-q107 q114 q115 q122) to 50.
_PRIORITY = [
    # (a) never driver-checked — added after the r4 window filled
    "q117_hashed_linear_score",
    "q118_mask_layout",
    "q119_scd_upsert",
    "q120_clean_web_text",
    "q121_doc_embeddings",
    "q122_rag_retrieve",
    "q123_pq_encode_fixed",
    # (b) new in round 5 — fixed-parameter oracles for formerly
    # rows-only kernels
    "q124_pq_adc_fixed",
    "q125_pq_rerank_fixed",
    "q126_wordpiece_encode_fixed",
    "q127_unigram_encode_fixed",
    "q128_minhash_lsh_fixed",
    "q129_rag_retrieve_exact",
    "q130_incremental_dedup_fixed",
    "q131_simhash_fixed",
    "q132_ann_lsh_fixed",
    "q133_ivf_fixed",
    "q134_semantic_dedup_fixed",
    "q135_bpe_encode_fixed",
    "q136_ivfpq_fixed",
    "q137_kmeans_step_fixed",
    "q138_pca_project_fixed",
    # (b cont.) r5 second wave — warehouse/eval operators
    "q139_scd2_history",
    "q140_profile_table",
    "q141_expectations",
    "q142_pagerank",
    "q143_ann_recall",
    "q144_pit_join",
    "q145_bloom_join",
    "q146_incremental_rollup",
    "q147_unpivot",
    "q148_retention_cohorts",
    "q149_grouping_sets",
    "q150_mmr_rerank",
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
    # (d) rotating block — last driver row was r1 (oldest first)
    "q16_outlier_clamp",
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
