from mimic_iv_data_pipeline_spark.functions.scalars import (
    age_years,
    epc_classes,
    icd_root,
    ndc_normalize,
    normalize_drug_name,
    try_double,
)

__all__ = [
    "age_years",
    "epc_classes",
    "icd_root",
    "ndc_normalize",
    "normalize_drug_name",
    "try_double",
]
