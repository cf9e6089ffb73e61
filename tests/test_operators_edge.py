"""Empty-input and edge-case robustness for the operator library."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_operators_on_empty_input(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        clamp_outliers,
        mode_per_group,
    )
    from mimic_iv_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from mimic_iv_data_pipeline_spark.operators.joins import asof_join
    from mimic_iv_data_pipeline_spark.operators.windows import (
        impute_cascade,
        label_readmission,
    )

    empty_li = spark.createDataFrame([], "k long, v double")
    assert mode_per_group(empty_li, "k", "v").count() == 0
    assert clamp_outliers(empty_li, "k", "v").count() == 0
    assert impute_cascade(empty_li, "v", "k", "k").count() == 0

    empty_visits = spark.createDataFrame(
        [], "subject_id long, admittime timestamp, dischtime timestamp"
    )
    assert label_readmission(empty_visits).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert ngram_jaccard_pairs(empty_docs, "doc_id", threshold=0.5).count() == 0

    left = spark.createDataFrame([(1, 5)], "k long, t long")
    empty_right = spark.createDataFrame([], "k long, s long, e long")
    out = asof_join(left, empty_right, on="k", left_time="t", right_start="s", right_end="e")
    assert out.count() == 1  # left-preserving even with empty right


def test_single_row_and_all_null_groups(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import quantile_bins
    from mimic_iv_data_pipeline_spark.operators.windows import ffill

    one = spark.createDataFrame([(1, 1, 2.0)], "k long, t long, v double")
    assert quantile_bins(one, "k", "v", "t").first()["bin"] == 1

    nulls = spark.createDataFrame(
        [(1, 1, None), (1, 2, None)], "k long, t long, v double"
    )
    out = ffill(nulls, "v", "k", "t")
    assert all(r["v"] is None for r in out.collect())
