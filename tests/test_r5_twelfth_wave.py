"""Round-5 twelfth wave: concentration metrics (Gini/HHI/top-decile)
and the Weibull-from-KM composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import (
    concentration_metrics,
    grouped_linreg,
    kaplan_meier,
)


def test_concentration_equal_and_degenerate(spark):
    eq = spark.createDataFrame([(k, 100) for k in range(4)], "k long, v long")
    r = concentration_metrics(eq, "k", "v").collect()[0]
    assert abs(r["gini"]) < 1e-12
    assert abs(r["hhi"] - 0.25) < 1e-9
    assert abs(r["top_decile_share"] - 0.25) < 1e-12  # ceil(4/10) = 1 key

    one = spark.createDataFrame(
        [(1, 1000), (2, 0), (3, 0), (4, 0)], "k long, v long"
    )
    r2 = concentration_metrics(one, "k", "v").collect()[0]
    assert abs(r2["gini"] - 0.75) < 1e-12  # (n-1)/n
    assert abs(r2["hhi"] - 1.0) < 1e-9
    assert abs(r2["top_decile_share"] - 1.0) < 1e-12


def test_concentration_matches_reference(spark):
    vals = [(i, (i * 37) % 997) for i in range(57)]
    df = spark.createDataFrame(vals, "k long, v long")
    r = concentration_metrics(df, "k", "v").collect()[0]
    v = sorted(x for _, x in vals)
    n, tot = len(v), sum(v)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(v)) / (n * tot) - (n + 1) / n
    hhi = sum(math.floor((x / tot) ** 2 * 1e12 + 0.5) for x in v) / 1e12
    top = sum(sorted(v, reverse=True)[: math.ceil(n / 10)]) / tot
    assert abs(r["gini"] - gini) < 1e-12
    assert abs(r["hhi"] - hhi) < 1e-12
    assert abs(r["top_decile_share"] - top) < 1e-12


def test_concentration_zero_total_null(spark):
    df = spark.createDataFrame([(1, 0), (2, 0)], "k long, v long")
    r = concentration_metrics(df, "k", "v").collect()[0]
    assert r["gini"] is None and r["hhi"] is None


def test_weibull_fit_recovers_parameters(spark):
    """Exact Weibull quantile samples (no censoring): the KM curve is
    the empirical survival and the probability-plot fit must recover
    shape/scale closely."""
    k_true, lam = 2.0, 50.0
    n = 400
    rows = []
    for i in range(n):
        u = (i + 0.5) / n
        t = int(round(lam * (-math.log(u)) ** (1 / k_true)))
        rows.append(("g", max(t, 1), 1))
    df = spark.createDataFrame(rows, "grp string, dur long, event int")
    km = kaplan_meier(df, "dur", "event", "grp")
    pts = km.filter(
        (F.col("t") > 0) & (F.col("survival") > 0) & (F.col("survival") < 1)
    ).select(
        "grp",
        F.floor(F.log(F.col("t").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(-F.log("survival")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    fit = grouped_linreg(pts, "grp", "x", "y").collect()[0]
    shape = fit["slope"]
    scale = math.exp(-fit["intercept"] / (1e6 * shape))
    # integer-day quantization + KM step discreteness allow ~10%
    assert abs(shape - k_true) / k_true < 0.1, shape
    assert abs(scale - lam) / lam < 0.1, scale


def test_concentration_partition_invariance(spark):
    rows = [(i % 37, (i * 13) % 500) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = concentration_metrics(df.repartition(1), "k", "v").collect()
    b = concentration_metrics(df.repartition(32), "k", "v").collect()
    assert a == b
