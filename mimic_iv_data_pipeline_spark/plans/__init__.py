from mimic_iv_data_pipeline_spark.plans.cohort import extract_cohort
from mimic_iv_data_pipeline_spark.plans.features import (
    clean_events,
    features_selection,
    generate_summary,
    impute_hadm_ids,
    preproc_diagnoses,
    preproc_events,
    preproc_meds,
)
from mimic_iv_data_pipeline_spark.plans.timeseries import generate_timeseries

__all__ = [
    "extract_cohort",
    "clean_events",
    "features_selection",
    "generate_summary",
    "impute_hadm_ids",
    "preproc_diagnoses",
    "preproc_events",
    "preproc_meds",
    "generate_timeseries",
]
