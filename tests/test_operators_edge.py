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


def test_oversample_keeps_null_label_rows(spark):
    """NULL is a class like any other: the balanced output must not
    silently drop null-label rows (review finding, round 4)."""
    from mimic_iv_data_pipeline_spark.operators.sampling import (
        oversample_minority,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, None)],
        "k long, label string",
    )
    out = oversample_minority(df, "k", "label", balance="minority").collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["k"])
    assert len(by_label[None]) == 3, "null minority must lift to majority count"
    assert sorted(set(by_label[None])) == [4]
    assert len(by_label["a"]) == 3


def test_unigram_unk_penalized_not_free(spark):
    """Unsegmentable garbage must score WORSE than vocabulary text —
    [UNK] carries a penalty, not log-prob 0 (review finding)."""
    from mimic_iv_data_pipeline_spark.operators.wordpiece import (
        train_unigram_py,
        unigram_encode,
    )

    probs = train_unigram_py([("hello", 5), ("world", 5)], vocab_size=20)
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "zzzz qqqq xxxx")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_encode(df, "doc_id", "text", probs).collect()}
    assert got[2]["logprob"] < got[1]["logprob"]
    assert got[2]["logprob"] < 0


def test_edit_distance_join_widens_small_int_ids(spark):
    """smallint/tinyint ids must widen to long in the pair output
    (review finding: simpleString() returns 'smallint', never 'short')."""
    from pyspark.sql import functions as F

    from mimic_iv_data_pipeline_spark.operators.fuzzy import edit_distance_join

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "zzz")], "id long, s string"
    ).select(F.col("id").cast("smallint").alias("id"), "s")
    out = edit_distance_join(df, "id", "s", max_dist=1)
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["id_a"] == "bigint" and schema["id_b"] == "bigint"
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs and not any(3 in p for p in pairs)
