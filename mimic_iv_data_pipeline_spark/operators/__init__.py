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
    truncate_observation_window,
)
from mimic_iv_data_pipeline_spark.operators.pivot import pivot_features

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
    "histogram_bins",
    "mode_per_group",
    "quantile_bins",
    "rank_auc",
    "bucketize_events",
    "densify_time_grid",
    "hours_between",
    "interval_signal",
    "truncate_observation_window",
    "pivot_features",
]
