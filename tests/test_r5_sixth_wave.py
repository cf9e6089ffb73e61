"""Round-5 sixth wave: statistical inference (Mann-Whitney, ANOVA,
BH-FDR), PMI collocations, item-item CF, multi-source BFS, Holt
smoothing — python-reference parity, edge cases, and partition
invariance (the oracle battery in test_oracle.py covers the
differential side)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import (
    anova_oneway,
    bh_fdr,
    mann_whitney_u,
    rank_auc,
)
from mimic_iv_data_pipeline_spark.operators.graph import bfs_levels
from mimic_iv_data_pipeline_spark.operators.retrieval import item_cooccurrence_topk
from mimic_iv_data_pipeline_spark.operators.text import pmi_collocations
from mimic_iv_data_pipeline_spark.operators.windows import holt_linear


# ---------------------------------------------------------------- MWU


def _mwu_reference(a: list[float], b: list[float]):
    """Textbook midrank Mann-Whitney (ties via average ranks)."""
    pooled = sorted(a + b)

    def midrank(v):
        lo = sum(1 for x in pooled if x < v)
        t = sum(1 for x in pooled if x == v)
        return lo + (t + 1) / 2

    ra = sum(midrank(v) for v in a)
    n1, n2 = len(a), len(b)
    u = ra - n1 * (n1 + 1) / 2
    n = n1 + n2
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(pooled).values())
    var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - n1 * n2 / 2) / math.sqrt(var) if var > 0 else None
    return u, z, u / (n1 * n2)


def test_mwu_matches_reference(spark):
    a = [1, 2, 2, 3, 5, 7, 7, 7, 11, 4]
    b = [2, 4, 4, 6, 7, 9, 14]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    row = mann_whitney_u(df, "g", "v").collect()[0]
    u, z, auc = _mwu_reference(a, b)
    assert row["group_a"] == "a" and row["group_b"] == "b"
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert abs(row["u_a"] - u) < 1e-9
    assert abs(row["z"] - z) < 1e-9
    assert abs(row["auc_a"] - auc) < 1e-9


def test_mwu_auc_equals_rank_auc(spark):
    """U/(n1·n2) is EXACTLY the Mann-Whitney AUC rank_auc computes —
    the cross-operator identity pinning both implementations."""
    rows = [(i, (i * 37) % 19, 1 if (i * 13) % 3 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score long, label int")
    auc = rank_auc(df, "score", "label").collect()[0]["auc"]
    mwu = mann_whitney_u(
        df.select(F.when(F.col("label") == 1, "pos").otherwise("neg").alias("g"), "score"),
        "g",
        "score",
    ).collect()[0]
    # group_a = 'neg' (sorts first): AUC(pos) = 1 - auc_a
    assert abs((1.0 - mwu["auc_a"]) - auc) < 1e-6


def test_mwu_all_tied_z_null(spark):
    df = spark.createDataFrame(
        [("a", 5)] * 4 + [("b", 5)] * 3, "g string, v long"
    )
    row = mann_whitney_u(df, "g", "v").collect()[0]
    assert row["z"] is None
    assert abs(row["auc_a"] - 0.5) < 1e-12  # pure-tie AUC is exactly 1/2


def test_mwu_requires_two_groups(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    with pytest.raises(ValueError, match="exactly 2 groups"):
        mann_whitney_u(df, "g", "v")


def test_mwu_partition_invariance(spark):
    rows = [("a" if i % 3 else "b", (i * 7) % 23) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v long")
    r1 = mann_whitney_u(df.repartition(1), "g", "v").collect()[0]
    r32 = mann_whitney_u(df.repartition(32), "g", "v").collect()[0]
    assert r1 == r32


# -------------------------------------------------------------- ANOVA


def test_anova_matches_numpy(spark):
    rng = {"a": [10, 12, 11, 9], "b": [20, 22, 19], "c": [15, 15, 16, 14, 15]}
    rows = [(g, v) for g, vs in rng.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    row = anova_oneway(df, "g", "v").collect()[0]
    allv = np.array([v for _, v in rows], float)
    grand = allv.mean()
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in rng.values())
    ssw = sum(((np.array(v, float) - np.mean(v)) ** 2).sum() for v in rng.values())
    f = (ssb / 2) / (ssw / (len(rows) - 3))
    assert row["k"] == 3 and row["n"] == len(rows)
    assert abs(row["ss_between"] - ssb) < 1e-3
    assert abs(row["ss_within"] - ssw) < 1e-3
    assert abs(row["f_stat"] - f) < 1e-3
    assert abs(row["eta_sq"] - ssb / (ssb + ssw)) < 1e-6


def test_anova_large_magnitude_no_cancellation(spark):
    """The bug the shift fix exists for: big offsets with small spread
    must NOT produce negative sums of squares."""
    base = 5_000_000_000
    rows = [("a", base + d) for d in (0, 1, 2)] + [("b", base + d) for d in (10, 11, 12)]
    df = spark.createDataFrame(rows, "g string, v long")
    row = anova_oneway(df, "g", "v").collect()[0]
    assert row["ss_within"] >= 0 and row["ss_between"] >= 0
    # exact: group means differ by 10, n=3 each -> SSB = 2*3*5^2 = 150
    assert abs(row["ss_between"] - 150.0) < 1e-3
    assert abs(row["ss_within"] - 4.0) < 1e-3


def test_anova_single_group_null_f(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    row = anova_oneway(df, "g", "v").collect()[0]
    assert row["f_stat"] is None


def test_anova_zero_variance_within(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 9), ("b", 9)], "g string, v long"
    )
    row = anova_oneway(df, "g", "v").collect()[0]
    assert row["f_stat"] is None  # SSW = 0 -> F undefined
    assert abs(row["eta_sq"] - 1.0) < 1e-9


# -------------------------------------------------------------- BH-FDR


def test_bh_fdr_matches_reference(spark):
    ps = [(1, 0.001), (2, 0.008), (3, 0.039), (4, 0.041), (5, 0.042),
          (6, 0.06), (7, 0.074), (8, 0.205), (9, 0.212), (10, 0.216),
          (11, 0.222), (12, 0.251), (13, 0.269), (14, 0.275), (15, 0.34)]
    df = spark.createDataFrame(ps, "tid long, p double")
    got = {r["tid"]: r for r in bh_fdr(df, "tid", "p", alpha=0.05).collect()}
    m = len(ps)
    srt = sorted(ps, key=lambda x: (x[1], x[0]))
    qs = [p * m / (i + 1) for i, (_, p) in enumerate(srt)]
    for i in range(m - 2, -1, -1):
        qs[i] = min(qs[i], qs[i + 1])
    for (tid, p), q in zip(srt, qs):
        assert abs(got[tid]["q_value"] - min(1.0, q)) < 1e-12
        assert got[tid]["reject"] == (min(1.0, q) <= 0.05)
    # classic BH on this vector rejects exactly the first four at 0.05?
    rejects = sorted(t for t, r in got.items() if r["reject"])
    # step-up: largest i with p_(i) <= i*alpha/m
    thresh = [i + 1 for i, (_, p) in enumerate(srt) if p <= (i + 1) * 0.05 / m]
    k = max(thresh) if thresh else 0
    assert rejects == sorted(t for (t, _), i in zip(srt, range(1, m + 1)) if i <= k)


def test_bh_q_monotone_in_rank(spark):
    ps = [(i, ((i * 29) % 97) / 97 + 0.001) for i in range(40)]
    df = spark.createDataFrame(ps, "tid long, p double")
    rows = sorted(bh_fdr(df, "tid", "p").collect(), key=lambda r: r["rank"])
    for a, b in zip(rows, rows[1:]):
        assert a["q_value"] <= b["q_value"] + 1e-15
        assert a["q_value"] <= 1.0 + 1e-15


# ------------------------------------------------------ PMI collocations


def test_pmi_reference_counts(spark):
    docs = spark.createDataFrame(
        [(1, "new york is big and new york is old"),
         (2, "san francisco and new york")],
        "doc_id long, text string",
    )
    out = {(r["w1"], r["w2"]): r for r in
           pmi_collocations(docs, "text", min_count=2, top_k=10).collect()}
    # corpus: 9 + 5 = 14 tokens, 8 + 4 = 12 bigrams; 'new york' 3x
    ny = out[("new", "york")]
    assert ny["n_pair"] == 3 and ny["n_w1"] == 3 and ny["n_w2"] == 3
    n_uni, n_bi = 14, 12
    expect = math.log((3 * n_uni * n_uni) / (n_bi * 3 * 3))
    assert abs(ny["pmi"] - expect) < 1e-9
    # hapax-pair pruning: 'is big' occurred once -> absent
    assert ("is", "big") not in out


def test_pmi_orders_by_association_not_frequency(spark):
    # 'of the' is frequent but independent; 'san francisco' is rarer
    # but perfectly associated -> higher PMI
    txt_common = " ".join(["of the"] * 20 + ["of", "the"] * 30)
    txt_assoc = " ".join(["san francisco"] * 5)
    docs = spark.createDataFrame(
        [(1, txt_common), (2, txt_assoc)], "doc_id long, text string"
    )
    rows = pmi_collocations(docs, "text", min_count=2, top_k=5).collect()
    by_pair = {(r["w1"], r["w2"]): r["pmi"] for r in rows}
    assert by_pair[("san", "francisco")] > by_pair[("of", "the")]


# ------------------------------------------------------ item co-occurrence


def test_item_cooc_reference(spark):
    bk = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y"), (3, "x"),
         (3, "y"), (4, "z"), (4, "x"), (1, "x")],  # dup (1,x) ignored
        "b long, i string",
    )
    out = item_cooccurrence_topk(bk, "b", "i", k=2, min_count=2).collect()
    got = {(r["item"], r["neighbor"]): r for r in out}
    # c_x=4, c_y=3, c_z=2; xy=3, xz=2, yz=1 (pruned: < min_count)
    assert got[("x", "y")]["n_pair"] == 3
    assert abs(got[("x", "y")]["cosine"] - 3 / math.sqrt(12)) < 1e-12
    assert abs(got[("z", "x")]["cosine"] - 2 / math.sqrt(8)) < 1e-12
    assert ("y", "z") not in got and ("z", "y") not in got
    # ranks: x's best neighbor is y (0.866) then z (0.707)
    assert got[("x", "y")]["rank"] == 1 and got[("x", "z")]["rank"] == 2


def test_item_cooc_k_caps_neighbors(spark):
    rows = [(b, i) for b in range(20) for i in ("a", "b", "c", "d")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = item_cooccurrence_topk(df, "b", "i", k=2, min_count=2)
    counts = out.groupBy("item").count().collect()
    assert all(r["count"] == 2 for r in counts)


# ----------------------------------------------------------------- BFS


def _bfs_reference(edges, seeds, hops, directed=True):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    level = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in level:
                    nxt.add(v)
        for v in nxt:
            level[v] = h
        frontier = nxt
    return level


@pytest.mark.parametrize("directed", [True, False])
def test_bfs_matches_reference(spark, directed):
    edges = [(i, (i * 7 + 3) % 50) for i in range(50)] + [(i, i + 1) for i in range(0, 40, 2)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (25,)], "node long")
    got = {r["node"]: r["level"] for r in
           bfs_levels(df, seeds, max_hops=4, directed=directed).collect()}
    assert got == _bfs_reference(edges, [0, 25], 4, directed)


def test_bfs_phantom_seed_reports_level_zero(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {r["node"]: r["level"] for r in bfs_levels(df, seeds, max_hops=2).collect()}
    assert got == {1: 0, 99: 0, 2: 1}


def test_bfs_early_exhaustion_stops(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["level"] for r in bfs_levels(df, seeds, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


# ---------------------------------------------------------------- Holt


def test_holt_matches_recurrence(spark):
    xs = [10.0, 12.0, 14.0, 13.0, 17.0, 20.0, 18.0]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k long, t long, x double"
    )
    rows = holt_linear(df, "k", "t", "x", alpha=0.5, beta=0.25).orderBy("t").collect()
    l, b = xs[0], 0.0
    assert rows[0]["level"] == l and rows[0]["trend"] == b
    for r, x in zip(rows[1:], xs[1:]):
        nl = 0.5 * x + 0.5 * (l + b)
        nb = 0.25 * (nl - l) + 0.75 * b
        l, b = nl, nb
        assert abs(r["level"] - l) < 1e-12
        assert abs(r["trend"] - b) < 1e-12
        assert abs(r["forecast"] - (l + b)) < 1e-12


def test_holt_beats_ewma_on_trend(spark):
    """On a pure linear ramp the Holt forecast converges toward the
    next value while flat EWMA lags — the reason the operator exists."""
    xs = [float(10 + 5 * i) for i in range(30)]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "k long, t long, x double"
    )
    last = (
        holt_linear(df, "k", "t", "x", alpha=0.5, beta=0.25)
        .orderBy("t")
        .collect()[-1]
    )
    nxt = xs[-1] + 5
    from mimic_iv_data_pipeline_spark.operators.windows import ewma

    elast = ewma(df, "k", "t", "x", alpha=0.5).orderBy("t").collect()[-1]["ewma"]
    assert abs(last["forecast"] - nxt) < abs(elast - nxt)


def test_holt_partition_invariance(spark):
    rows = [(k, i, float((i * k * 13) % 97)) for k in (1, 2, 3) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, t long, x double")
    a = sorted(map(tuple, holt_linear(df.repartition(1), "k", "t", "x", 0.5, 0.25).collect()))
    b = sorted(map(tuple, holt_linear(df.repartition(32), "k", "t", "x", 0.5, 0.25).collect()))
    assert a == b
