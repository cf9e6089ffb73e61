"""Round-5 tenth wave: forecast backtesting (Holt vs seasonal naive)
and bounded-length weighted shortest paths."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.graph import shortest_paths
from mimic_iv_data_pipeline_spark.operators.windows import forecast_backtest


def _series_df(spark, xs, key=1):
    return spark.createDataFrame(
        [(key, i, x) for i, x in enumerate(xs)], "k long, t long, y long"
    )


def test_backtest_matches_reference(spark):
    xs = [100, 120, 110, 130, 150, 140, 160, 170, 165, 180, 190, 200]
    df = _series_df(spark, xs)
    row = forecast_backtest(df, "k", "t", "y", alpha=0.5, beta=0.25, season=3).collect()[0]
    # python reference
    l, b = float(xs[0]), 0.0
    fc = [None]  # forecast made AT t predicts t+1; row t reads lag(forecast)
    for x in xs[1:]:
        fc.append(l + b)
        nl = 0.5 * x + 0.5 * (l + b)
        nb = 0.25 * (nl - l) + 0.75 * b
        l, b = nl, nb
    em = en = st = n = 0
    for t in range(len(xs)):
        if fc[t] is None or t < 3:
            continue
        f, a, nv = fc[t], float(xs[t]), float(xs[t - 3])
        em += math.floor(abs(f - a) * 1e6 + 0.5)
        en += math.floor(abs(nv - a) * 1e6 + 0.5)
        st += math.floor(2 * abs(f - a) / (abs(f) + abs(a)) * 1e6 + 0.5)
        n += 1
    assert row["n_evals"] == n
    assert row["model_abs_err_micro"] == em
    assert row["naive_abs_err_micro"] == en
    assert abs(row["smape"] - st / n / 1e6) < 1e-9
    assert abs(row["mase"] - em / en) < 1e-12


def test_backtest_beats_naive_on_trend(spark):
    """On a clean linear ramp Holt converges to the slope, so its
    one-step error must undercut the seasonal naive (which lags by a
    full season) — MASE < 1 is the whole point of the metric."""
    xs = [100 + 10 * i for i in range(40)]
    df = _series_df(spark, xs)
    row = forecast_backtest(df, "k", "t", "y", alpha=0.5, beta=0.25, season=7).collect()[0]
    assert row["mase"] is not None and row["mase"] < 1.0


def test_backtest_constant_series_null_mase(spark):
    xs = [50] * 20
    df = _series_df(spark, xs)
    row = forecast_backtest(df, "k", "t", "y", alpha=0.5, beta=0.25, season=7).collect()[0]
    assert row["mase"] is None  # naive error is exactly 0
    assert row["model_abs_err_micro"] == 0  # holt is exact on constants


# --------------------------------------------------------- shortest paths


def _sp_reference(edges, seeds, k):
    """Bounded Bellman-Ford."""
    dist = {s: 0 for s in seeds}
    for _ in range(k):
        new = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < new.get(d, float("inf")):
                new[d] = dist[s] + w
        dist = new
    return dist


def test_shortest_paths_matches_reference(spark):
    edges = [(0, 1, 10), (0, 2, 3), (2, 1, 4), (1, 3, 2), (2, 3, 8), (3, 4, 1),
             (0, 4, 100), (4, 0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in shortest_paths(df, seeds, iterations=3).collect()}
    assert got == _sp_reference(edges, [0], 3)
    # the 2-edge path 0->2->1 (7) beats the direct edge (10)
    assert got[1] == 7


def test_shortest_paths_iteration_bound(spark):
    """k rounds certify paths of <= k edges: the cheap 4-edge chain is
    invisible at k=2 but found at k=4."""
    chain = [(i, i + 1, 1) for i in range(4)] + [(0, 4, 100)]
    df = spark.createDataFrame(chain, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    k2 = {r["node"]: r["dist"] for r in shortest_paths(df, seeds, iterations=2).collect()}
    k4 = {r["node"]: r["dist"] for r in shortest_paths(df, seeds, iterations=4).collect()}
    assert k2[4] == 100 and k4[4] == 4


def test_shortest_paths_multi_source_and_dup_edges(spark):
    edges = [(0, 5, 7), (0, 5, 3), (1, 5, 1)]  # parallel edges keep the min
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    got = {r["node"]: r["dist"] for r in shortest_paths(df, seeds, iterations=1).collect()}
    assert got == {0: 0, 1: 0, 5: 1}


def test_nb_scoring_matrix_join_broadcast(spark, sf_smoke):
    """The V·C log-likelihood matrix must broadcast onto the token
    stream — the planner shuffling the 120M-row token side instead was
    measured 2.4× slower (PERF ninth-wave addenda)."""
    from mimic_iv_data_pipeline_spark.queries import all_queries

    plan = (
        all_queries()["q190_naive_bayes"](spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shortest_paths_no_cartesian_and_checkpointed(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import shortest_paths

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 40, 1 + i % 5) for i in range(200)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = shortest_paths(edges, seeds, iterations=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
