"""Round-5 ninth wave: isotonic calibration (minimax PAV), SMD
covariate balance, 2x2 epidemiology measures."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import (
    epi_2x2,
    isotonic_calibration,
    smd_balance,
)


def _pav(rates, weights):
    """Textbook weighted pool-adjacent-violators, expanded per bin."""
    stack = []
    for y, w in zip(rates, weights):
        stack.append([float(y), float(w)])
        while len(stack) > 1 and stack[-2][0] >= stack[-1][0] - 1e-15:
            y2, w2 = stack.pop()
            y1, w1 = stack.pop()
            stack.append([(y1 * w1 + y2 * w2) / (w1 + w2), w1 + w2])
    fits, i = [], 0
    for y, w in stack:
        covered = 0.0
        while covered < w - 1e-9:
            covered += weights[i]
            fits.append(y)
            i += 1
    return fits


def _bins_df(spark, rates, ns):
    rows = []
    for s, (r, n) in enumerate(zip(rates, ns)):
        p = round(r * n)
        rows += [(s, 1)] * p + [(s, 0)] * (n - p)
    return spark.createDataFrame(rows, "s long, y int")


def test_isotonic_matches_pav(spark):
    rates = [0.1, 0.3, 0.2, 0.5, 0.4, 0.9, 0.85, 0.95]
    ns = [10, 20, 10, 10, 20, 10, 40, 20]
    df = _bins_df(spark, rates, ns)
    got = {r["s"]: r["iso"] for r in isotonic_calibration(df, "s", "y").collect()}
    fits = _pav([round(r * n) / n for r, n in zip(rates, ns)], ns)
    for s in range(len(rates)):
        assert abs(got[s] - fits[s]) < 1e-9, (s, got[s], fits[s])


def test_isotonic_monotone_and_preserves_increasing(spark):
    rates = [0.1, 0.2, 0.4, 0.8]
    ns = [10, 10, 10, 10]
    df = _bins_df(spark, rates, ns)
    out = sorted(isotonic_calibration(df, "s", "y").collect(), key=lambda r: r["s"])
    # already-isotonic input is a fixed point
    for r, want in zip(out, rates):
        assert abs(r["iso"] - want) < 1e-12
        assert abs(r["rate"] - want) < 1e-12
    isos = [r["iso"] for r in out]
    assert all(a <= b + 1e-12 for a, b in zip(isos, isos[1:]))


def test_isotonic_bin_wall(spark):
    df = spark.createDataFrame([(i, i % 2) for i in range(50)], "s long, y int")
    with pytest.raises(ValueError, match="max_bins"):
        isotonic_calibration(df, "s", "y", max_bins=10)


def test_isotonic_partition_invariance(spark):
    rates = [0.3, 0.1, 0.6, 0.2, 0.9]
    ns = [13, 7, 21, 11, 9]
    df = _bins_df(spark, rates, ns)
    a = sorted(map(tuple, isotonic_calibration(df.repartition(1), "s", "y").collect()))
    b = sorted(map(tuple, isotonic_calibration(df.repartition(32), "s", "y").collect()))
    assert a == b


# ------------------------------------------------------------------ SMD


def test_smd_matches_numpy(spark):
    a = [100, 110, 90, 105, 95]
    b = [200, 210, 190]
    rows = [("a", v, v // 10) for v in a] + [("b", v, v // 10) for v in b]
    df = spark.createDataFrame(rows, "g string, x long, z long")
    got = {r["covariate"]: r for r in smd_balance(df, "g", ["x", "z"]).collect()}
    for cov, (xa, xb) in {
        "x": (a, b),
        "z": ([v // 10 for v in a], [v // 10 for v in b]),
    }.items():
        na, nb = np.array(xa, float), np.array(xb, float)
        want = (na.mean() - nb.mean()) / math.sqrt(
            (na.var(ddof=1) + nb.var(ddof=1)) / 2
        )
        assert abs(got[cov]["smd"] - want) < 1e-9
        assert abs(got[cov]["mean_a"] - na.mean()) < 1e-12
        assert abs(got[cov]["var_b"] - nb.var(ddof=1)) < 1e-9


def test_smd_no_cancellation_at_magnitude(spark):
    rows = [("a", 5_000_000_000 + d) for d in (0, 1, 2)] + [
        ("b", 5_000_000_010 + d) for d in (0, 1, 2)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    r = smd_balance(df, "g", ["x"]).collect()[0]
    assert abs(r["var_a"] - 1.0) < 1e-9
    assert abs(r["smd"] - (-10.0)) < 1e-9


def test_smd_zero_variance_null(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, x long"
    )
    assert smd_balance(df, "g", ["x"]).collect()[0]["smd"] is None


def test_smd_two_group_contract(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "g string, x long")
    with pytest.raises(ValueError, match="exactly 2 groups"):
        smd_balance(df, "g", ["x"])


# ------------------------------------------------------------------ epi


def test_epi_reference(spark):
    rows = [(1, 1)] * 20 + [(1, 0)] * 80 + [(0, 1)] * 10 + [(0, 0)] * 90
    df = spark.createDataFrame(rows, "e int, o int")
    r = epi_2x2(df, "e", "o").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (20, 80, 10, 90)
    assert abs(r["rr"] - 2.0) < 1e-12
    assert abs(r["or_"] - (20 * 90) / (80 * 10)) < 1e-12
    assert abs(r["rd"] - 0.1) < 1e-12
    se = math.sqrt(1 / 20 - 1 / 100 + 1 / 10 - 1 / 100)
    z = 1.959963984540054
    assert abs(r["rr_lo"] - math.exp(math.log(2.0) - z * se)) < 1e-9
    assert abs(r["rr_hi"] - math.exp(math.log(2.0) + z * se)) < 1e-9
    assert r["rr_lo"] <= r["rr"] <= r["rr_hi"]


def test_epi_zero_cell_null_not_inf(spark):
    df = spark.createDataFrame([(1, 1), (0, 0), (0, 1)], "e int, o int")
    r = epi_2x2(df, "e", "o").collect()[0]
    assert r["or_"] is None and r["or_lo"] is None
    assert r["rr"] is not None  # a>0 and c>0 here


def test_epi_null_effect(spark):
    rows = [(1, 1)] * 10 + [(1, 0)] * 90 + [(0, 1)] * 10 + [(0, 0)] * 90
    df = spark.createDataFrame(rows, "e int, o int")
    r = epi_2x2(df, "e", "o").collect()[0]
    assert abs(r["rr"] - 1.0) < 1e-12 and abs(r["rd"]) < 1e-12
    assert r["rr_lo"] < 1.0 < r["rr_hi"]


# ------------------------------------------------- NULL-policy contracts


def test_null_policy_complete_case(spark):
    """The r5 NULL-policy pass: NULL values/labels are excluded
    (complete-case) rather than silently corrupting counts."""
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        anova_oneway,
        mann_whitney_u,
    )
    from mimic_iv_data_pipeline_spark.operators.mlprep import best_split

    clean = [("a", 1), ("a", 3), ("b", 2), ("b", 4)]
    dirty = clean + [("a", None), (None, 9)]
    mc = mann_whitney_u(
        spark.createDataFrame(clean, "g string, v long"), "g", "v"
    ).collect()
    md = mann_whitney_u(
        spark.createDataFrame(dirty, "g string, v long"), "g", "v"
    ).collect()
    assert mc == md

    ac = anova_oneway(
        spark.createDataFrame(clean, "g string, v long"), "g", "v"
    ).collect()
    ad = anova_oneway(
        spark.createDataFrame(dirty, "g string, v long"), "g", "v"
    ).collect()
    assert ac == ad

    rows = [(1, 1), (1, 0), (2, 1), (2, 1), (3, 0)]
    bc = best_split(spark.createDataFrame(rows, "x long, y int"), "x", "y").collect()
    bd = best_split(
        spark.createDataFrame(rows + [(None, 1), (2, None)], "x long, y int"),
        "x",
        "y",
    ).collect()
    assert sorted(map(tuple, bc)) == sorted(map(tuple, bd))


def test_bh_fdr_null_p_raises(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import bh_fdr

    df = spark.createDataFrame([(1, 0.01), (2, None)], "tid long, p double")
    with pytest.raises(Exception, match="NULL p-value"):
        bh_fdr(df, "tid", "p").collect()


def test_isotonic_null_label_excluded(spark):
    rows = [(0, 1), (0, 0), (1, 1), (1, 1), (0, None), (None, 1)]
    df = spark.createDataFrame(rows, "s long, y int")
    got = {r["s"]: r for r in isotonic_calibration(df, "s", "y").collect()}
    assert got[0]["n"] == 2 and got[0]["pos"] == 1
    assert None not in got


def test_anova_term_beyond_long_floor(spark):
    """Regression for the sf0.001 sweep find: the between-group term
    (cs²/n·1e6) can exceed 2^63, where Spark's long-returning FLOOR
    silently wrapped. Deviations ~2e8 over small groups put the term
    at ~4e19 — the wrap regime; F must still match numpy."""
    import numpy as np
    from mimic_iv_data_pipeline_spark.operators.aggregates import anova_oneway

    base = 5_000_000
    rows = (
        [("a", base + 200_000_000 + d) for d in range(0, 3000, 7)]
        + [("b", base - 150_000_000 + d) for d in range(0, 3000, 7)]
        + [("c", base + d) for d in range(0, 3000, 7)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    row = anova_oneway(df, "g", "v").collect()[0]
    gs = {}
    for g, v in rows:
        gs.setdefault(g, []).append(v)
    allv = np.array([v for _, v in rows], float)
    grand = allv.mean()
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in gs.values())
    ssw = sum(((np.array(v, float) - np.mean(v)) ** 2).sum() for v in gs.values())
    k, n = 3, len(rows)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["ss_between"] > 0 and row["ss_within"] > 0
    assert abs(row["f_stat"] - f) / f < 1e-6
