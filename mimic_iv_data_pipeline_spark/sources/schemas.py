"""Explicit schemas for the MIMIC-shaped tables (FIXTURES.md).

The reference infers dtypes at read and papers over schema drift between
MIMIC versions with three near-identical modules
(``day_intervals_cohort.py`` / ``_v2.py`` / ``_v3.py`` — diff = paths +
the ``ethnicity``→``race`` rename at ``day_intervals_cohort_v2.py:352``).
Here: one explicit StructType per table + a per-version column-alias map,
applied at read time — never ``inferSchema`` in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PATIENTS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("gender", T.StringType()),
        T.StructField("anchor_age", T.IntegerType()),
        T.StructField("anchor_year", T.IntegerType()),
        T.StructField("anchor_year_group", T.StringType()),
        T.StructField("dod", T.TimestampType()),
    ]
)

ADMISSIONS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("hadm_id", T.LongType()),
        T.StructField("admittime", T.TimestampType()),
        T.StructField("dischtime", T.TimestampType()),
        T.StructField("deathtime", T.TimestampType()),
        T.StructField("hospital_expire_flag", T.IntegerType()),
        T.StructField("insurance", T.StringType()),
        T.StructField("ethnicity", T.StringType()),
    ]
)

ICUSTAYS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("hadm_id", T.LongType()),
        T.StructField("stay_id", T.LongType()),
        T.StructField("intime", T.TimestampType()),
        T.StructField("outtime", T.TimestampType()),
        T.StructField("los", T.DoubleType()),  # days
    ]
)

DIAGNOSES_ICD = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("hadm_id", T.LongType()),
        T.StructField("icd_code", T.StringType()),
        T.StructField("icd_version", T.IntegerType()),
    ]
)

LABEVENTS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("hadm_id", T.LongType()),  # nullable — as-of imputed
        T.StructField("itemid", T.LongType()),
        T.StructField("charttime", T.TimestampType()),
        T.StructField("valuenum", T.DoubleType()),
        T.StructField("valueuom", T.StringType()),
    ]
)

CHARTEVENTS = T.StructType(
    [
        T.StructField("stay_id", T.LongType()),
        T.StructField("charttime", T.TimestampType()),
        T.StructField("itemid", T.LongType()),
        T.StructField("valuenum", T.DoubleType()),
        T.StructField("valueuom", T.StringType()),
    ]
)

PRESCRIPTIONS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("hadm_id", T.LongType()),
        T.StructField("drug", T.StringType()),
        T.StructField("starttime", T.TimestampType()),
        T.StructField("stoptime", T.TimestampType()),
        T.StructField("ndc", T.StringType()),
        T.StructField("dose_val_rx", T.StringType()),
    ]
)

INPUTEVENTS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("stay_id", T.LongType()),
        T.StructField("itemid", T.LongType()),
        T.StructField("starttime", T.TimestampType()),
        T.StructField("endtime", T.TimestampType()),
        T.StructField("rate", T.DoubleType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("orderid", T.LongType()),
    ]
)

OUTPUTEVENTS = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("hadm_id", T.LongType()),
        T.StructField("stay_id", T.LongType()),
        T.StructField("itemid", T.LongType()),
        T.StructField("charttime", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ICD9_TO_ICD10_MAP = T.StructType(
    [
        T.StructField("diagnosis_type", T.StringType()),
        T.StructField("diagnosis_code", T.StringType()),
        T.StructField("diagnosis_description", T.StringType()),
        T.StructField("icd9cm", T.StringType()),
        T.StructField("icd10cm", T.StringType()),
        T.StructField("flags", T.StringType()),
    ]
)

NDC_PRODUCT_MAP = T.StructType(
    [
        T.StructField("productndc", T.StringType()),
        T.StructField("nonproprietaryname", T.StringType()),
        T.StructField("pharm_classes", T.StringType()),
    ]
)

# MIMIC-version column drift: canonical name → per-version source name.
# v1 keeps `ethnicity`; v2+ renamed it to `race`
# (day_intervals_cohort_v2.py:352). Applied by `align_columns`.
VERSION_ALIASES: dict[str, dict[str, str]] = {
    "v1": {},
    "v2": {"ethnicity": "race"},
    "v3": {"ethnicity": "race"},
}


def align_columns(df: DataFrame, version: str = "v1") -> DataFrame:
    """Rename drifted columns back to the canonical schema."""
    for canonical, source in VERSION_ALIASES.get(version, {}).items():
        if source in df.columns:
            df = df.withColumnRenamed(source, canonical)
    return df
