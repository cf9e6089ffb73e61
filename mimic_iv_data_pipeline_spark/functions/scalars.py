"""Scalar column functions (SURVEY.md §2.8).

Every reference "UDF" here is a plain Column expression — string/date
math the reference does row-wise in python (``hosp_preprocess_util.py``
``icd_9to10``/``brand_to_generic``/``get_EPC``) stays JVM-side in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def icd_root(code: Column, length: int = 3) -> Column:
    """F1: ICD code root (``icd[:3]``, ``hosp_preprocess_util.py:407-408``)."""
    return F.substring(code, 1, length)


def normalize_drug_name(drug: Column) -> Column:
    """F4: drug-name normalization ``lower().strip().replace(' ','_')``
    (``hosp_preprocess_util.py:202-204``)."""
    return F.regexp_replace(F.trim(F.lower(drug)), " ", "_")


def ndc_normalize(ndc: Column) -> Column:
    """F6/D2: NDC → 11-digit zero-padded string.

    The reference pads each dash section of the product NDC and
    truncates to 11 (``hosp_preprocess_util.py:228-240``): labeler to 5,
    product to 4, package to 2. Null-safe; non-dashed numeric NDCs are
    left-padded to 11 wholesale.
    """
    parts = F.split(ndc, "-")
    padded = F.when(
        F.size(parts) == 3,
        F.concat(
            F.lpad(parts.getItem(0), 5, "0"),
            F.lpad(parts.getItem(1), 4, "0"),
            F.lpad(parts.getItem(2), 2, "0"),
        ),
    ).when(
        F.size(parts) == 2,
        F.concat(F.lpad(parts.getItem(0), 5, "0"), F.lpad(parts.getItem(1), 4, "0")),
    ).otherwise(F.lpad(ndc, 11, "0"))
    return F.substring(padded, 1, 11)


def epc_classes(pharm_classes: Column) -> Column:
    """F5/D5: extract '[EPC]'-tagged entries from a comma-separated
    pharm-class list (``hosp_preprocess_util.py:263-271``) — a
    higher-order array filter, no python loop."""
    return F.filter(
        F.transform(F.split(pharm_classes, ","), lambda x: F.trim(x)),
        lambda x: x.contains("[EPC]"),
    )


def anchor_group_end_year(anchor_year_group: Column) -> Column:
    """F2: last-4-chars slice of MIMIC's ``anchor_year_group``
    ('2008 - 2010' → 2010; ``day_intervals_cohort.py:67`` derives
    ``min_valid_year`` from it)."""
    return F.substring(anchor_year_group, -4, 4).cast("int")


def age_years(anchor_age: Column, anchor_year: Column, at_year: Column) -> Column:
    """F10: age at a visit year from MIMIC anchor columns
    (``day_intervals_cohort.py:66,84``)."""
    return anchor_age + (at_year - anchor_year)


def try_double(col: Column) -> Column:
    """F9: lenient numeric coercion (``pd.to_numeric(errors='coerce')``,
    ``data_generation_icu.py:167-168``) — nulls on unparseable input."""
    return col.try_cast("double")
