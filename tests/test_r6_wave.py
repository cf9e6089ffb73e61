"""Round-6 additions: geo_knn, Welch t pairs, mixture temperature."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import welch_t_pairs
from mimic_iv_data_pipeline_spark.operators.geo import geo_knn
from mimic_iv_data_pipeline_spark.operators.sampling import (
    mixture_temperature_weights,
)


def _hv(a, b):
    (la1, lo1), (la2, lo2) = a, b
    rl1, rl2 = math.radians(la1), math.radians(la2)
    dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
    x = math.sin(dla) ** 2 + math.cos(rl1) * math.cos(rl2) * math.sin(dlo) ** 2
    return 2 * 6_371_000.0 * math.asin(math.sqrt(x))


# ------------------------------------------------------------------ geo_knn
def test_geo_knn_matches_bruteforce(spark):
    random.seed(31)
    cloud = [
        (i, 48.1 + random.uniform(-0.004, 0.004), 11.5 + random.uniform(-0.006, 0.006))
        for i in range(70)
    ]
    df = spark.createDataFrame(cloud, "id long, lat double, lon double")
    got = {
        (r["id"], r["rank"]): (r["neighbor_id"], r["dist_m"])
        for r in geo_knn(df, "id", "lat", "lon", k=4, max_radius_m=500.0).collect()
    }
    for i, (pid, la, lo) in enumerate(cloud):
        nbrs = sorted(
            (
                (_hv((la, lo), (b[1], b[2])), b[0])
                for b in cloud
                if b[0] != pid and _hv((la, lo), (b[1], b[2])) <= 500.0
            ),
        )[:4]
        for rank, (d, nid) in enumerate(nbrs, 1):
            assert got[(pid, rank)][0] == nid
            assert got[(pid, rank)][1] == pytest.approx(d, rel=1e-9)
        assert (pid, len(nbrs) + 1) not in got  # no padding past the k available


def test_geo_knn_fewer_than_k_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 10.0001, 10.0), (3, 40.0, 40.0)],
        "id long, lat double, lon double",
    )
    rows = geo_knn(df, "id", "lat", "lon", k=5, max_radius_m=1000.0).collect()
    # 1 and 2 pair up; 3 is isolated and emits nothing
    assert sorted((r["id"], r["neighbor_id"]) for r in rows) == [(1, 2), (2, 1)]
    assert all(r["rank"] == 1 for r in rows)
    with pytest.raises(ValueError, match="k must be positive"):
        geo_knn(df, "id", "lat", "lon", k=0, max_radius_m=100.0)


# ------------------------------------------------------------- welch t pairs
def test_welch_matches_hand_computation(spark):
    random.seed(13)
    rows = [("a", random.randrange(-50, 200)) for _ in range(40)]
    rows += [("b", random.randrange(0, 400)) for _ in range(25)]
    rows += [("c", random.randrange(100, 120)) for _ in range(30)]
    df = spark.createDataFrame(rows, "g string, y long")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in welch_t_pairs(df, "g", "y").collect()
    }

    def stats(name):
        ys = [y for g, y in rows if g == name]
        n = len(ys)
        s = sum(ys)
        ss = sum(y * y for y in ys)
        m = s / n
        v = (n * ss - s * s) / (n * (n - 1.0))
        return n, m, v

    for ga, gb in (("a", "b"), ("a", "c"), ("b", "c")):
        na, ma, va = stats(ga)
        nb, mb, vb = stats(gb)
        vea, veb = va / na, vb / nb
        t = (ma - mb) / math.sqrt(vea + veb)
        dof = (vea + veb) ** 2 / (vea**2 / (na - 1) + veb**2 / (nb - 1))
        r = got[(ga, gb)]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["t"] == pytest.approx(t, rel=1e-12)
        assert r["dof"] == pytest.approx(dof, rel=1e-12)


def test_welch_degenerate_groups_null_not_crash(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 7), ("b", 7), ("c", 1), ("c", 2), ("c", 9)],
        "g string, y long",
    )
    rows = {(r["group_a"], r["group_b"]): r for r in welch_t_pairs(df, "g", "y").collect()}
    assert rows[("a", "b")]["t"] is None  # n_a = 1 -> no variance
    assert rows[("a", "c")]["t"] is None
    assert rows[("b", "c")]["t"] is not None  # b has zero variance but n>1


# -------------------------------------------------------- mixture temperature
def test_mixture_temperature_upweights_low_resource(spark):
    df = spark.createDataFrame(
        [("big", 1_000_000), ("small", 10_000)], "source string, toks long"
    )
    out = {
        r["domain"]: r
        for r in mixture_temperature_weights(
            df, "source", "toks", budget=500_000, alpha=0.5
        ).collect()
    }
    # sqrt flattening: big/small token ratio 100x -> weight ratio 10x
    assert out["big"]["weight_micro"] == pytest.approx(
        10 * out["small"]["weight_micro"], rel=1e-6
    )
    # low-resource domain repeats more often under the mixture
    assert out["small"]["epochs"] > out["big"]["epochs"]
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-9
    assert sum(r["alloc_tokens"] for r in out.values()) <= 500_000 + len(out)


def test_mixture_temperature_alpha_one_is_proportional(spark):
    df = spark.createDataFrame(
        [("x", 300_000), ("y", 100_000)], "source string, toks long"
    )
    out = {
        r["domain"]: r
        for r in mixture_temperature_weights(
            df, "source", "toks", budget=100_000, alpha=1.0
        ).collect()
    }
    assert out["x"]["share"] == pytest.approx(0.75, abs=1e-6)
    assert out["x"]["alloc_tokens"] == 75_000
    with pytest.raises(ValueError, match="budget"):
        mixture_temperature_weights(df, "source", "toks", budget=-1)


# ------------------------------------------------------------- geo clusters
def test_geo_clusters_matches_bruteforce_closure(spark):
    from mimic_iv_data_pipeline_spark.operators.geo import geo_clusters

    random.seed(41)
    # three separated blobs + one isolated point
    blobs = []
    pid = 0
    for cx, cy in ((48.0, 11.0), (48.02, 11.0), (48.0, 11.03)):
        for _ in range(15):
            blobs.append(
                (pid, cx + random.uniform(-3e-4, 3e-4), cy + random.uniform(-4e-4, 4e-4))
            )
            pid += 1
    blobs.append((pid, 49.0, 12.0))
    df = spark.createDataFrame(blobs, "id long, lat double, lon double")
    got = {r["id"]: r["cluster_id"] for r in geo_clusters(df, "id", "lat", "lon", 150.0).collect()}
    # brute-force closure
    import itertools

    parent = {b[0]: b[0] for b in blobs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(blobs, 2):
        if _hv((a[1], a[2]), (b[1], b[2])) <= 150.0:
            parent[find(a[0])] = find(b[0])
    want_groups = {}
    for b in blobs:
        want_groups.setdefault(find(b[0]), set()).add(b[0])
    got_groups = {}
    for i, c in got.items():
        got_groups.setdefault(c, set()).add(i)
    assert sorted(map(sorted, want_groups.values())) == sorted(
        map(sorted, got_groups.values())
    )
    assert all(c == min(m) for c, m in got_groups.items())  # min-id labels
    assert got[pid] == pid  # the isolated point is its own singleton


# ------------------------------------------------------------- trimmed mean
def test_trimmed_mean_matches_hand(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import trimmed_mean

    random.seed(3)
    rows = [("g", i, random.randrange(-100, 1000)) for i in range(57)]
    rows += [("h", i, random.randrange(0, 10)) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, rid long, y long")
    got = {r["g"]: r for r in trimmed_mean(df, "g", "y", 0.2, "rid").collect()}
    for name in ("g", "h"):
        ys = sorted((y, i) for g, i, y in rows if g == name)
        n = len(ys)
        cut = int(n * 0.2)
        kept = [y for y, _ in ys[cut : n - cut]]
        assert got[name]["n_total"] == n
        assert got[name]["n_kept"] == len(kept)
        assert got[name]["trimmed_mean"] == pytest.approx(
            sum(kept) / len(kept), rel=1e-12
        )


def test_trimmed_mean_validation_and_zero_trim(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import trimmed_mean

    df = spark.createDataFrame([("g", 1, 10), ("g", 2, 20)], "g string, rid long, y long")
    out = trimmed_mean(df, "g", "y", 0.0, "rid").collect()[0]
    assert (out["n_kept"], out["trimmed_mean"]) == (2, 15.0)
    with pytest.raises(ValueError, match="trim_frac"):
        trimmed_mean(df, "g", "y", 0.5, "rid")


# ------------------------------------------------------- markov power steps
def test_markov_power_iteration_matches_hand(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import markov_power_iteration

    trans = spark.createDataFrame(
        [("a", "b", 3), ("a", "a", 1), ("b", "a", 2), ("b", "c", 2), ("c", "a", 5)],
        "from_state string, to_state string, n long",
    )
    got = {r["state"]: r["v_micro"] for r in markov_power_iteration(trans, steps=3).collect()}
    # hand recurrence in exact integers
    p = {("a", "b"): 750000, ("a", "a"): 250000,
         ("b", "a"): 500000, ("b", "c"): 500000, ("c", "a"): 1000000}
    v = {s: 1000000 // 3 for s in ("a", "b", "c")}
    for _ in range(3):
        nxt = {}
        for (f, t), pp in p.items():
            nxt[t] = nxt.get(t, 0) + v.get(f, 0) * pp
        v = {t: (s + 500000) // 1000000 for t, s in nxt.items()}
    assert got == v


def test_markov_power_iteration_mass_drops_at_terminal_states(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import markov_power_iteration

    # b is terminal: mass flowing into b vanishes next step
    trans = spark.createDataFrame(
        [("a", "b", 1)], "from_state string, to_state string, n long"
    )
    one = {r["state"]: r["v_micro"] for r in markov_power_iteration(trans, steps=1).collect()}
    assert one == {"b": 500000}  # a's uniform half moved to b; b had no row out
    two = {r["state"]: r["v_micro"] for r in markov_power_iteration(trans, steps=2).collect()}
    assert two == {}  # all mass was in the terminal state
