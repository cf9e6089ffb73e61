from mimic_iv_data_pipeline_spark.operators.joins import (
    asof_join,
    map_codes,
    semi_filter,
)
from mimic_iv_data_pipeline_spark.operators.windows import (
    bfill,
    ffill,
    first_row_per_group,
    impute_cascade,
    label_readmission,
    sessionize,
    topk_per_group,
)
from mimic_iv_data_pipeline_spark.operators.aggregates import (
    clamp_outliers,
    confusion_by_group,
    ece_mce,
    filter_majority_unit,
    fit_temperature,
    histogram_bins,
    mode_per_group,
    quantile_bins,
    rank_auc,
)
from mimic_iv_data_pipeline_spark.operators.temporal import (
    bucketize_events,
    densify_time_grid,
    hours_between,
    interval_signal,
    normalize_event_time,
    truncate_observation_window,
)
from mimic_iv_data_pipeline_spark.operators.pivot import (
    assemble_map_tensor,
    pivot_features,
)
from mimic_iv_data_pipeline_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from mimic_iv_data_pipeline_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    cosine_topk_pandas,
    ivf_topk,
)
from mimic_iv_data_pipeline_spark.operators.text import (
    fingerprint,
    predict_language,
    token_count,
    winnowing_fingerprints,
    with_quality_metrics,
)
from mimic_iv_data_pipeline_spark.operators.nlp import entity_summary, extract_entities
from mimic_iv_data_pipeline_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    frame_sample,
)
from mimic_iv_data_pipeline_spark.operators.skew import salted_agg, salted_join

__all__ = [
    "asof_join",
    "map_codes",
    "semi_filter",
    "bfill",
    "ffill",
    "first_row_per_group",
    "impute_cascade",
    "label_readmission",
    "sessionize",
    "topk_per_group",
    "clamp_outliers",
    "confusion_by_group",
    "ece_mce",
    "filter_majority_unit",
    "fit_temperature",
    "histogram_bins",
    "mode_per_group",
    "quantile_bins",
    "rank_auc",
    "bucketize_events",
    "densify_time_grid",
    "hours_between",
    "interval_signal",
    "normalize_event_time",
    "truncate_observation_window",
    "assemble_map_tensor",
    "pivot_features",
    "exact_dedup_groups",
    "embedding_near_dup_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "ann_lsh_topk",
    "cosine_topk",
    "cosine_topk_pandas",
    "ivf_topk",
    "fingerprint",
    "predict_language",
    "token_count",
    "winnowing_fingerprints",
    "with_quality_metrics",
    "entity_summary",
    "extract_entities",
    "decode_media",
    "documents_as_media",
    "frame_sample",
    "salted_agg",
    "salted_join",
]
