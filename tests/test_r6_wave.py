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


# ---------------------------------------------------------------- CMH / epi
def test_cmh_simpsons_paradox_fixture(spark):
    """The textbook check: strata with opposite-size margins where the
    crude OR is confounded — CMH must equal the (common) per-stratum
    OR, not the crude one."""
    from mimic_iv_data_pipeline_spark.operators.aggregates import cmh_pooled_or

    rows = []
    rid = 0
    # stratum 0: OR = (40*20)/(10*30) = 8/3; heavy exposure
    for e, y, n in ((1, 1, 40), (1, 0, 10), (0, 1, 30), (0, 0, 20)):
        rows += [(0, e, y)] * n
    # stratum 1: same OR = (8*30)/(6*20) = 2 -> strata differ; just
    # verify the pooled value against the hand formula
    for e, y, n in ((1, 1, 8), (1, 0, 6), (0, 1, 20), (0, 0, 30)):
        rows += [(1, e, y)] * n
    df = spark.createDataFrame(rows, "s int, e int, y int")
    out = cmh_pooled_or(df, "s", "e", "y").collect()[0]
    n0, n1 = 100, 64
    num = (40 * 20 * 1_000_000) // n0 + (8 * 30 * 1_000_000) // n1
    den = (10 * 30 * 1_000_000) // n0 + (6 * 20 * 1_000_000) // n1
    assert out["n_strata"] == 2
    assert out["or_mh"] == pytest.approx(num / den, rel=1e-12)
    crude = ((48) * (50)) / ((16) * (50))
    assert out["or_crude"] == pytest.approx(crude, rel=1e-12)


# ------------------------------------------------------------------ spearman
def test_spearman_perfect_and_ties(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import spearman_by_group

    inc = [("inc", i, i * 3 + 1) for i in range(20)]
    dec = [("dec", i, 100 - i) for i in range(20)]
    df = spark.createDataFrame(inc + dec, "g string, x long, y long")
    got = {r["g"]: r["rho"] for r in spearman_by_group(df, "g", "x", "y").collect()}
    assert got["inc"] == pytest.approx(1.0, abs=1e-12)
    assert got["dec"] == pytest.approx(-1.0, abs=1e-12)


def test_spearman_matches_scipy_style_reference_with_ties(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import spearman_by_group

    random.seed(17)
    xs = [random.randrange(0, 8) for _ in range(60)]   # heavy ties
    ys = [x * 2 + random.randrange(0, 5) for x in xs]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    want = cov / math.sqrt(vx * vy)
    got = spearman_by_group(df, "g", "x", "y").collect()[0]["rho"]
    assert got == pytest.approx(want, rel=1e-9)


def test_spearman_constant_column_null(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import spearman_by_group

    df = spark.createDataFrame([("g", 1, 5), ("g", 2, 5)], "g string, x long, y long")
    assert spearman_by_group(df, "g", "x", "y").collect()[0]["rho"] is None


# ----------------------------------------------------------- exact percentiles
def test_exact_percentiles_are_order_statistics(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import exact_percentiles

    random.seed(29)
    vals = [random.randrange(-500, 5000) for _ in range(137)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, rid long, y long"
    )
    out = exact_percentiles(df, "g", "y", [0.1, 0.5, 0.9], "rid").collect()[0]
    sv = sorted(vals)
    for p, col in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
        assert out[col] == sv[max(1, math.ceil(len(vals) * p)) - 1]
    assert out["n"] == 137
    with pytest.raises(ValueError, match="probs"):
        exact_percentiles(df, "g", "y", [0.0], "rid")


def test_exact_percentiles_tiny_group(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import exact_percentiles

    df = spark.createDataFrame([("g", 1, 42)], "g string, rid long, y long")
    out = exact_percentiles(df, "g", "y", [0.1, 0.9], "rid").collect()[0]
    assert (out["p10"], out["p90"]) == (42, 42)


# ------------------------------------------------------------------- privacy
def test_anonymity_report_flags(spark):
    from mimic_iv_data_pipeline_spark.operators.privacy import anonymity_risk_report

    rows = [("a", 1, 100)] * 12 + [("a", 2, 200)] * 3 + [("b", 1, v) for v in (1, 2, 3, 4)] * 3
    df = spark.createDataFrame(rows, "q1 string, q2 int, s long")
    got = {(r["q1"], r["q2"]): r for r in
           anonymity_risk_report(df, ["q1", "q2"], "s", k=10, l=3).collect()}
    big = got[("a", 1)]   # 12 rows, one sensitive value
    assert (big["n"], big["l_distinct"], big["k_risky"], big["l_risky"]) == (12, 1, 0, 1)
    small = got[("a", 2)]  # 3 rows, one value: both risky
    assert (small["k_risky"], small["l_risky"]) == (1, 1)
    div = got[("b", 1)]    # 12 rows, 4 values: safe on both
    assert (div["k_risky"], div["l_risky"]) == (0, 0)
    with pytest.raises(ValueError, match="quasi_cols"):
        anonymity_risk_report(df, [], "s", 10, 3)


def test_date_shift_preserves_intervals_and_is_deterministic(spark):
    from datetime import datetime

    from mimic_iv_data_pipeline_spark.operators.privacy import date_shift

    rows = [
        (1, 10, datetime(2150, 3, 1, 8, 30, 15)),
        (2, 10, datetime(2150, 3, 5, 23, 0, 0)),
        (3, 77, datetime(2150, 3, 1, 8, 30, 15)),
    ]
    df = spark.createDataFrame(rows, "eid long, subj long, ts timestamp")
    out = {r["eid"]: r for r in
           date_shift(df, "subj", ["ts"], 182, offset_col="off").collect()}
    # same subject, same offset; interval between events exact
    assert out[1]["off"] == out[2]["off"]
    assert -182 <= out[1]["off"] <= 182
    assert (out[2]["ts"] - out[1]["ts"]) == (rows[1][2] - rows[0][2])
    # time of day survives whole-day shifts
    assert out[1]["ts"].time() == rows[0][2].time()
    # different subject, (almost surely) different offset — and
    # deterministic across invocations
    again = {r["eid"]: r["off"] for r in
             date_shift(df, "subj", ["ts"], 182, offset_col="off").collect()}
    assert again == {e: r["off"] for e, r in out.items()}
    with pytest.raises(ValueError, match="ts_cols"):
        date_shift(df, "subj", [], 182)


# ---------------------------------------------------------------------- URL
def test_canonical_url_edge_cases(spark):
    from mimic_iv_data_pipeline_spark.functions.url import (
        canonical_url,
        url_host,
        url_registered_domain,
    )

    cases = [
        # (input, expected canonical)
        ("HTTP://User:pw@WWW.Ex.COM:80/A/b/?utm_source=x#f", "http://www.ex.com/A/b"),
        ("https://ex.com:443/p", "https://ex.com/p"),
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # non-default port kept
        ("http://ex.com/p?a=1&utm_medium=m&b=2", "http://ex.com/p?a=1&b=2"),
        ("http://ex.com/p?utm_source=x", "http://ex.com/p"),  # empty query dropped
        ("http://ex.com/search&utm_x=1", "http://ex.com/search&utm_x=1"),  # '&' in path untouched
        ("http://ex.com/", "http://ex.com/"),  # root slash kept
        ("http://ex.com", "http://ex.com/"),  # RFC 3986 §6.2.3 empty path → '/'
        ("HTTPS://Ex.COM:443?q=1#f", "https://ex.com/?q=1"),  # bare host + query
        ("http://ex.com/a/", "http://ex.com/a"),
        ("not a url", "not a url"),  # passthrough
        ("http://ex.com/p?gclid=z&id=9#frag", "http://ex.com/p?id=9"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [w for _, w in cases]
    hd = spark.createDataFrame(
        [("https://a.B.example.co.uk:9/x",), ("http://localhost/x",)], "url string"
    ).select(
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()
    assert (hd[0]["h"], hd[0]["d"]) == ("a.b.example.co.uk", "co.uk")  # documented PSL heuristic
    assert (hd[1]["h"], hd[1]["d"]) == ("localhost", "localhost")
