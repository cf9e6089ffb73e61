"""Round-5 eleventh wave: Benford digit screen, time-decay features,
grid-bucketed geo radius join."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.geo import radius_join
from mimic_iv_data_pipeline_spark.operators.mlprep import time_decay_features
from mimic_iv_data_pipeline_spark.operators.profiling import benford_digit_test


def _hv(a, b):
    (la1, lo1), (la2, lo2) = a, b
    rl1, rl2 = math.radians(la1), math.radians(la2)
    dlat = math.radians(la2 - la1) / 2
    dlon = math.radians(lo2 - lo1) / 2
    x = math.sin(dlat) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
    return 2 * 6_371_000 * math.asin(math.sqrt(x))


# ---------------------------------------------------------------- Benford


def test_benford_counts_and_chi2(spark):
    vals = [1.5**i for i in range(1, 120)]  # multi-scale: near-Benford
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = sorted(benford_digit_test(df, "v").collect(), key=lambda r: r["digit"])
    from collections import Counter

    def first_digit(v):
        return int(f"{v:.10e}"[0])

    digs = Counter(first_digit(v) for v in vals)
    for r in out:
        assert r["n_digit"] == digs[r["digit"]]
        assert abs(r["expected"] - math.log10(1 + 1 / r["digit"])) < 1e-12
    n = len(vals)
    t = sum(
        math.floor((digs.get(d, 0) / n - math.log10(1 + 1 / d)) ** 2
                   / math.log10(1 + 1 / d) * 1e9 + 0.5)
        for d in range(1, 10)
    )
    assert abs(out[0]["chi2"] - n * (t / 1e9)) < 1e-9


def test_benford_flags_uniform_digits(spark):
    """Uniform first digits score a much larger chi² than geometric
    (Benford-conforming) data — the screen's purpose."""
    geometric = [(1.5**i,) for i in range(1, 200)]
    uniform = [(float(d) * 10 ** (i % 3),) for d in range(1, 10) for i in range(22)]
    cg = benford_digit_test(
        spark.createDataFrame(geometric, "v double"), "v"
    ).collect()[0]["chi2"]
    cu = benford_digit_test(
        spark.createDataFrame(uniform, "v double"), "v"
    ).collect()[0]["chi2"]
    assert cu > 5 * cg


def test_benford_excludes_nonpositive_and_null(spark):
    df = spark.createDataFrame([(1.0,), (0.0,), (-5.0,), (None,)], "v double")
    out = benford_digit_test(df, "v").collect()
    assert len(out) == 1 and out[0]["n"] == 1 and out[0]["digit"] == 1


# ------------------------------------------------------------- time decay


def test_time_decay_reference(spark):
    rows = [(1, 0, 100), (1, 86400, 100), (2, 86400, 50)]
    df = spark.createDataFrame(rows, "k long, tsec long, v long").select(
        "k", F.timestamp_seconds("tsec").alias("ts"), "v"
    )
    got = {r["k"]: r for r in time_decay_features(df, "k", "ts", "v", [1.0, 7.0]).collect()}
    # snapshot = t 86400: user1 has one 1-day-old and one fresh event
    exp1 = math.floor(100 * 0.5 * 1e6 + 0.5) + math.floor(100 * 1e6 + 0.5)
    assert got[1]["decayed_1_0"] == exp1
    exp7 = math.floor(100 * 0.5 ** (1 / 7) * 1e6 + 0.5) + math.floor(100 * 1e6 + 0.5)
    assert got[1]["decayed_7_0"] == exp7
    assert got[2]["n"] == 1 and got[2]["decayed_1_0"] == 50_000_000


def test_time_decay_halflife_semantics(spark):
    """An event exactly one half-life old contributes half its value."""
    rows = [(1, 0, 1000), (1, 7 * 86400, 0)]
    df = spark.createDataFrame(rows, "k long, tsec long, v long").select(
        "k", F.timestamp_seconds("tsec").alias("ts"), "v"
    )
    r = time_decay_features(df, "k", "ts", "v", [7.0]).collect()[0]
    assert r["decayed_7_0"] == 500_000_000  # 1000 * 0.5 in micro-units


def test_time_decay_requires_halflife(spark):
    df = spark.createDataFrame([(1, 0, 1)], "k long, tsec long, v long").select(
        "k", F.timestamp_seconds("tsec").alias("ts"), "v"
    )
    with pytest.raises(ValueError, match="half-life"):
        time_decay_features(df, "k", "ts", "v", [])


# ------------------------------------------------------------------- geo


def test_radius_join_bruteforce_parity(spark):
    random.seed(11)
    cloud = [
        (i, 52.5 + random.uniform(-0.01, 0.01), 13.4 + random.uniform(-0.01, 0.01))
        for i in range(80)
    ]
    df = spark.createDataFrame(cloud, "id long, lat double, lon double")
    got = {(r["id_a"], r["id_b"]) for r in radius_join(df, "id", "lat", "lon", 300.0).collect()}
    want = {
        (a[0], b[0])
        for i, a in enumerate(cloud)
        for b in cloud[i + 1:]
        if _hv((a[1], a[2]), (b[1], b[2])) <= 300.0
    }
    assert got == want


def test_radius_join_cell_boundary_pairs_found(spark):
    """Two points just inside the radius but in DIFFERENT grid cells
    must still pair — the 3×3 neighbor explode is what makes the
    bucketing lossless."""
    lat_deg = 200.0 / 111_320.0
    pts = [(1, 52.0 + 0.999 * lat_deg, 13.4), (2, 52.0 + 1.001 * lat_deg, 13.4)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = radius_join(df, "id", "lat", "lon", 200.0).collect()
    assert len(out) == 1 and out[0]["id_a"] == 1


def test_radius_join_polar_guard(spark):
    df = spark.createDataFrame([(1, 85.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(Exception, match="polar"):
        radius_join(df, "id", "lat", "lon", 100.0).collect()


def test_radius_join_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, 52.0 + i * 1e-4, 13.0) for i in range(50)],
        "id long, lat double, lon double",
    )
    plan = (
        radius_join(df, "id", "lat", "lon", 150.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- golden records


def _gold(spark, rows, max_dist=1):
    from mimic_iv_data_pipeline_spark.plans.mdm import golden_records

    df = spark.createDataFrame(rows, "id long, name string, blk long, val long")
    return {
        r["cluster_id"]: r
        for r in golden_records(df, "id", "name", "blk", "val", max_dist).collect()
    }


def test_golden_records_merges_and_survives(spark):
    rows = [
        (1, "acme corp", 10, 100),
        (2, "acme c0rp", 10, 250),   # 1 edit from id 1, same block -> merge
        (3, "acme corp", 20, 999),   # identical name, DIFFERENT block -> no merge
        (4, "zenith", 10, 50),       # singleton
    ]
    got = _gold(spark, rows)
    assert set(got) == {1, 3, 4}
    c = got[1]
    assert c["n_members"] == 2
    assert c["survivor_name"] == "acme corp"  # min-id member's name
    assert c["max_value"] == 250              # survivorship: max balance
    assert c["n_distinct_names"] == 2
    assert got[3]["n_members"] == 1 and got[4]["n_members"] == 1


def test_golden_records_transitive_chain(spark):
    # a-b and b-c within distance 1, a-c at distance 2: one cluster of 3
    rows = [(1, "aaaa", 1, 1), (2, "aaab", 1, 2), (3, "aabb", 1, 3)]
    got = _gold(spark, rows)
    assert set(got) == {1}
    assert got[1]["n_members"] == 3


def test_golden_records_conserves_membership(spark):
    rows = [(i, f"name{i % 7}x{i}", i % 3, i * 10) for i in range(60)]
    got = _gold(spark, rows)
    assert sum(r["n_members"] for r in got.values()) == 60


def test_radius_join_sphere_edge_band_pair_found(spark):
    """Regression (r6 advice): the cell edge must come from the SAME
    sphere as the haversine filter. With the old 111320 m/deg edge,
    cells were ~0.11% smaller than the radius, so a true pair whose
    distance lies in (~0.99888r, r] and straddles a cell boundary
    could land 2 cells apart and be silently dropped. Construct
    exactly that geometry: lat separation 199.9 m positioned across a
    multiple of the OLD edge so the old indices differ by 2."""
    old_edge = 200.0 / 111_320.0  # the buggy derivation
    sep = 199.9 / (math.pi * 6_371_000.0 / 180.0)  # 199.9 m on the filter sphere
    lat_a = 2 * old_edge - 1e-9
    lat_b = lat_a + sep
    # the constructed band geometry: old cells 2 apart, distance < r
    assert math.floor(lat_b / old_edge) - math.floor(lat_a / old_edge) == 2
    df = spark.createDataFrame(
        [(1, lat_a, 13.4), (2, lat_b, 13.4)], "id long, lat double, lon double"
    )
    out = radius_join(df, "id", "lat", "lon", 200.0).collect()
    assert len(out) == 1 and out[0]["dist_m"] <= 200.0
    assert _hv((lat_a, 13.4), (lat_b, 13.4)) <= 200.0  # truly in-radius


def test_radius_join_antimeridian_pair_found(spark):
    """Pairs straddling ±180° longitude are ordinary adjacent-cell
    pairs under the modulo-n_lon uniform cells — previously silently
    missed (unwrapped floor(lon/edge) indices can never neighbor)."""
    pts = [(1, 10.0, 179.9999), (2, 10.0, -179.9999), (3, 10.0, 0.0)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    out = radius_join(df, "id", "lat", "lon", 300.0).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"]) == (1, 2)
    assert out[0]["dist_m"] == pytest.approx(
        _hv((10.0, 179.9999), (10.0, -179.9999)), rel=1e-9
    )


def test_radius_join_brute_parity_near_antimeridian(spark):
    """Brute-force parity for a cloud crossing the date line — no
    duplicate pairs (array_distinct on wrapped neighbors) and no
    missed pairs."""
    random.seed(23)
    cloud = [
        (
            i,
            -33.0 + random.uniform(-0.005, 0.005),
            ((180.0 + random.uniform(-0.006, 0.006) + 180.0) % 360.0) - 180.0,
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(cloud, "id long, lat double, lon double")
    rows = radius_join(df, "id", "lat", "lon", 400.0).collect()
    got = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate candidate pairs emitted"

    def lon_diff(x, y):
        d = abs(x - y) % 360.0
        return min(d, 360.0 - d)

    def hv_wrap(a, b):
        # haversine is wrap-correct already (sin of half-angle)
        return _hv(a, b)

    want = {
        (a[0], b[0])
        for i, a in enumerate(cloud)
        for b in cloud[i + 1:]
        if hv_wrap((a[1], a[2]), (b[1], b[2])) <= 400.0
    }
    assert set(got) == want
