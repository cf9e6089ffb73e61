"""Round-5 eighth wave: multi-touch attribution, decision-stump
information gain, WoE/IV encoding, and the bootstrap hasher seam."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.mlprep import best_split, woe_iv
from mimic_iv_data_pipeline_spark.operators.sampling import poisson_bootstrap_ci
from mimic_iv_data_pipeline_spark.operators.windows import attribute_revenue


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "u long, tsec long, typ string, cents long, eid long"
    ).select("u", F.timestamp_seconds("tsec").alias("ts"), "typ", "cents", "eid")


def _attr(spark, rows, lookback=100):
    df = _ev(spark, rows)
    return {
        r["channel"]: r
        for r in attribute_revenue(
            df, "u", "ts", "typ", "cents", "purchase", ["click", "view"],
            lookback, "eid",
        ).collect()
    }


def test_attribution_models(spark):
    rows = [
        (1, 1, "click", 0, 101), (1, 2, "view", 0, 102),
        (1, 3, "purchase", 100, 103),
    ]
    got = _attr(spark, rows)
    assert got["click"]["first_micro"] == 100_000_000
    assert got["click"]["last_micro"] == 0
    assert got["view"]["last_micro"] == 100_000_000
    assert got["click"]["linear_micro"] == 50_000_000
    assert got["view"]["linear_micro"] == 50_000_000


def test_attribution_conserves_revenue(spark):
    """Every model column must sum to total converted revenue — the
    invariant that caught the left-join/post-filter bug (a conversion
    whose only touches are OUT of window must surface unattributed,
    not vanish)."""
    rows = [
        (1, 1, "click", 0, 101), (1, 2, "view", 0, 102),
        (1, 3, "purchase", 100, 103), (1, 10, "purchase", 200, 104),
        (2, 5, "purchase", 50, 201),                     # no touches at all
        (3, 0, "click", 0, 301), (3, 1000, "purchase", 70, 302),  # out of window
        (4, 990, "view", 0, 401), (4, 995, "click", 0, 402),
        (4, 1000, "purchase", 33, 403),                  # 33 does not split evenly
    ]
    got = _attr(spark, rows)
    total = (100 + 200 + 50 + 70 + 33) * 1_000_000
    for col in ("first_micro", "last_micro", "linear_micro"):
        assert sum(r[col] for r in got.values()) == total, col
    # out-of-window conversion lands unattributed
    assert got["(unattributed)"]["linear_micro"] == (50 + 70) * 1_000_000


def test_attribution_remainder_to_first_touch(spark):
    rows = [
        (1, 1, "click", 0, 11), (1, 2, "view", 0, 12), (1, 3, "view", 0, 13),
        (1, 4, "purchase", 100, 14),
    ]
    got = _attr(spark, rows)
    # 100_000_000 / 3 = 33_333_333 r 1 -> first touch (click) gets +1
    assert got["click"]["linear_micro"] == 33_333_334
    assert got["view"]["linear_micro"] == 2 * 33_333_333


def test_attribution_lookback_boundary(spark):
    # touch exactly lookback seconds before: excluded (strict >)
    rows = [(1, 0, "click", 0, 1), (1, 100, "purchase", 10, 2),
            (2, 1, "click", 0, 3), (2, 100, "purchase", 10, 4)]
    got = _attr(spark, rows, lookback=100)
    assert got["(unattributed)"]["n_first"] == 1
    assert got["click"]["first_micro"] == 10_000_000


# ------------------------------------------------------------ best_split


def test_best_split_matches_reference(spark):
    rows = [(1, 1)] * 8 + [(1, 0)] * 2 + [(2, 1)] * 7 + [(2, 0)] * 3 \
        + [(3, 1)] * 1 + [(3, 0)] * 9
    df = spark.createDataFrame(rows, "x long, y int")
    out = best_split(df, "x", "y").collect()

    def h(p, n):
        s = 0.0
        for c in (p, n - p):
            if c > 0:
                s -= (c / n) * math.log(c / n)
        return s

    nt, pt = 30, 16
    for r in out:
        nl, pl = r["n_left"], r["pos_left"]
        ig = h(pt, nt) - nl / nt * h(pl, nl) - (nt - nl) / nt * h(pt - pl, nt - nl)
        assert abs(r["ig"] - ig) < 1e-12
        assert r["n_right"] == nt - nl and r["pos_right"] == pt - pl
    # the max value is not a candidate (empty right side)
    assert all(r["v"] < 3 for r in out)
    assert max(out, key=lambda r: r["ig"])["v"] == 2


def test_best_split_pure_feature_zero_gain(spark):
    df = spark.createDataFrame([(1, 1), (2, 1), (3, 1), (1, 1)], "x long, y int")
    out = best_split(df, "x", "y").collect()
    assert all(abs(r["ig"]) < 1e-15 for r in out)


# ------------------------------------------------------------------ WoE


def test_woe_iv_reference(spark):
    rows = [("A", 1)] * 30 + [("A", 0)] * 10 + [("B", 1)] * 5 + [("B", 0)] * 25 \
        + [("C", 0)] * 10
    df = spark.createDataFrame(rows, "c string, y int")
    got = {r["cat"]: r for r in woe_iv(df, "c", "y").collect()}
    pt, nt = 35, 45
    for cat, (p, n) in {"A": (30, 10), "B": (5, 25), "C": (0, 10)}.items():
        ps = (p + 0.5) / (pt + 1)
        ns = (n + 0.5) / (nt + 1)
        assert abs(got[cat]["woe"] - math.log(ps / ns)) < 1e-12
        assert abs(got[cat]["iv_term"] - (ps - ns) * math.log(ps / ns)) < 1e-12
    # single-class category stays finite thanks to smoothing
    assert math.isfinite(got["C"]["woe"])


def test_woe_balanced_category_near_zero(spark):
    rows = [("A", 1)] * 20 + [("A", 0)] * 20 + [("B", 1)] * 20 + [("B", 0)] * 20
    df = spark.createDataFrame(rows, "c string, y int")
    for r in woe_iv(df, "c", "y").collect():
        assert abs(r["woe"]) < 1e-12 and abs(r["iv_term"]) < 1e-12


# --------------------------------------------------- bootstrap hasher seam


def test_bootstrap_hasher_seam(spark):
    df = spark.createDataFrame(
        [("g", i, 100 + (i * 37) % 50) for i in range(400)], "g string, id long, y long"
    )
    md5 = poisson_bootstrap_ci(df, "g", "y", "id", n_replicates=20).collect()[0]
    xx = poisson_bootstrap_ci(
        df, "g", "y", "id", n_replicates=20, hasher="xxhash64"
    ).collect()[0]
    # same point estimate (weight-independent), different digests but
    # both CIs bracket the mean
    assert md5["mean"] == xx["mean"]
    for r in (md5, xx):
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    with pytest.raises(ValueError, match="unknown hasher"):
        poisson_bootstrap_ci(df, "g", "y", "id", hasher="sha1")
