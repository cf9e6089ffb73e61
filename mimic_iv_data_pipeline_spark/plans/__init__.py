from mimic_iv_data_pipeline_spark.plans.cohort import (
    cohort_summary,
    extract_cohort,
    filter_by_diagnosis,
)
from mimic_iv_data_pipeline_spark.plans.features import (
    clean_events,
    features_selection,
    generate_summary,
    impute_hadm_ids,
    prepare_icd_map,
    preproc_diagnoses,
    preproc_events,
    preproc_meds,
)
from mimic_iv_data_pipeline_spark.plans.ml_assembly import (
    dl_tensor_frame,
    ml_feature_matrix,
    train_test_split_ids,
)
from mimic_iv_data_pipeline_spark.plans.pipeline import PipelineConfig, run_pipeline
from mimic_iv_data_pipeline_spark.plans.survival import (
    extend_code_vocab,
    survival_sequences,
)
from mimic_iv_data_pipeline_spark.plans.timeseries import (
    generate_timeseries,
    medication_signal,
)
from mimic_iv_data_pipeline_spark.plans.tokenization import (
    build_sequences,
    build_vocab,
    encode_sequences,
    lab_tokens,
)

__all__ = [
    "cohort_summary",
    "extract_cohort",
    "filter_by_diagnosis",
    "clean_events",
    "features_selection",
    "generate_summary",
    "impute_hadm_ids",
    "prepare_icd_map",
    "preproc_diagnoses",
    "preproc_events",
    "preproc_meds",
    "dl_tensor_frame",
    "ml_feature_matrix",
    "train_test_split_ids",
    "PipelineConfig",
    "extend_code_vocab",
    "survival_sequences",
    "run_pipeline",
    "generate_timeseries",
    "medication_signal",
    "build_sequences",
    "build_vocab",
    "encode_sequences",
    "lab_tokens",
]
