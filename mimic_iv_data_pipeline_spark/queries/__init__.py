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

# ROUND-4 TODO: rotate q84-q96 (13 oracled queries with no driver row yet)
# to the front of this list, plus any r3 reds; backfill with the green core.
#
# Driver-window rotation (round 3). The correctness driver checks the FIRST
# 50 registry entries per round; the registry had grown to 70, so 20 oracled
# queries (q48-q52, q54-q58, q61-q70) never received a driver row in r1/r2.
# This explicit order puts (a) the never-driver-checked queries first —
# including all of this round's q71-q75, (b) the freshly-fixed q24 next,
# (c) a stable previously-green core for regression signal — entries whose
# operator family has another window representative (q06/q09/q12/q22/q25/
# q31/q38) were rotated out to make room, and (d) the no-oracle (rows-only)
# similarity
# entries last. Queries registered but not named here are appended in
# registration order after the named ones.
_PRIORITY = [
    # (a) never driver-checked (oracled) — the r2 verdict's item 2
    "q48_group_max",
    "q49_interval_signal",
    "q50_winnowing",
    "q51_eval_metrics",
    "q52_temperature_scaling",
    "q54_cube",
    "q55_trend_slope",
    "q56_approx_distinct",
    "q57_ece_mce",
    "q58_survival_export",
    "q61_behrt_sequences",
    "q62_horizontal_concat",
    "q63_pii_redaction",
    "q64_hash_split",
    "q65_contamination",
    "q66_heavy_hitters",
    "q67_cms_freq",
    "q68_stratified_sample",
    "q69_sequence_packing",
    "q70_repetition",
    # new this round — never driver-checked
    "q71_pack_chunked",
    "q72_passage_dedup",
    "q73_bloom_membership",
    "q74_url_dedup",
    "q75_source_mixture",
    "q76_dedup_clusters",
    "q77_bigram_lm",
    "q78_quantize_int8",
    "q79_tfidf_keywords",
    "q80_dsir_weights",
    "q81_bpe_pairs",
    "q82_length_batches",
    "q83_ngram_novelty",
    # (b) the only red row in r2, oracle type bug fixed this round
    "q24_fairness_confusion",
    # (c) stable green core, one per operator family where possible.
    # Rotated out mid-round-3 for the wave-4 block above: q01 (flagship
    # entry() is smoke-checked every round anyway; agg family covered by
    # q48/q54), q23 (calibration covered by q51/q52/q57), q28 (q54 cube
    # covers rollup), q29 (temporal bucketing covered by q49), q46
    # (encode family covered by q61/q62).
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
    "q59_embedding_neardup",
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
