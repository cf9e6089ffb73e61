"""Tests for z-order clustering (operators/layout.py): the written
layout must actually tighten per-file min-max spans on BOTH keyed
columns — that is the whole point of the operator."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.layout import write_zordered, zorder_key


@pytest.fixture(scope="module")
def xy_df(spark):
    # deterministic pseudo-random 2-d uniform via hashing
    base = spark.range(8192).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit("x")), F.lit(10_000)) / 10_000.0).alias("x"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit("y")), F.lit(10_000)) / 10_000.0).alias("y"),
    )
    return base


def _mean_spans(spark, path):
    spans = {"x": [], "y": []}
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).collect()[0]
        spans["x"].append(pdf.sx)
        spans["y"].append(pdf.sy)
    n = len(spans["x"])
    return n, sum(spans["x"]) / n, sum(spans["y"]) / n


def test_zorder_write_tightens_both_columns(spark, xy_df, tmp_path):
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zorder")
    # baseline: round-robin repartition — every file spans ~the full range
    xy_df.repartition(16).write.mode("overwrite").parquet(plain)
    write_zordered(xy_df, zpath, ["x", "y"], n_files=16)

    n_p, px, py = _mean_spans(spark, plain)
    n_z, zx, zy = _mean_spans(spark, zpath)
    assert n_z >= 8  # range partitioner actually split the data
    assert px > 0.9 and py > 0.9  # unsorted baseline: full-range files
    # 16 z-files over 2 dims → each file covers ~1/4 of each axis;
    # allow generous slack over the ideal 0.25
    assert zx < 0.55, f"x span {zx}"
    assert zy < 0.55, f"y span {zy}"
    # layout changes bytes, not rows
    assert (
        spark.read.parquet(zpath).count() == spark.read.parquet(plain).count() == 8192
    )


def test_zorder_key_skew_proof(spark):
    # heavily skewed column: quantile bucketing must still spread keys
    df = spark.range(4096).select(
        F.col("id"),
        (F.col("id") % 100 == 0).cast("int").alias("flag"),  # 99% zeros
        F.pow(F.col("id") / 4096.0, 8.0).alias("skewed"),  # mass near 0
    )
    base, z = zorder_key(df, ["skewed"], bits=8)
    zs = base.withColumn("__z", z).select("__z")
    n_distinct = zs.distinct().count()
    assert n_distinct > 100  # not collapsed into a handful of buckets
    # equal-frequency: no single z value holds more than ~3% of rows
    top = zs.groupBy("__z").count().agg(F.max("count")).collect()[0][0]
    assert top < 4096 * 0.03


def test_zorder_key_bits_overflow_raises(spark):
    df = spark.range(16).select(*[(F.col("id") * (i + 1)).alias(f"c{i}") for i in range(9)])
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(df, [f"c{i}" for i in range(9)], bits=8)


def test_zorder_key_all_null_column_degrades(spark):
    # an all-NULL column has no clustering signal: it must collapse to a
    # single zero bucket, not raise inside percentile handling
    df = spark.range(256).select(
        F.col("id"), F.lit(None).cast("double").alias("nul")
    )
    base, z = zorder_key(df, ["id", "nul"], bits=4)
    zs = base.withColumn("__z", z).select("__z")
    assert zs.where(F.col("__z").isNull()).count() == 0
    assert zs.distinct().count() > 8  # id still clusters
