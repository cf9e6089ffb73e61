"""Property tests for operators/linalg.py and operators/fuzzy.py."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.fuzzy import edit_distance_join
from mimic_iv_data_pipeline_spark.operators.linalg import (
    covariance_matrix,
    pca_components,
    pca_project,
)

DIMS = 16
N = 300


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    # correlated data so PCA has a meaningful spectrum
    base = rng.normal(size=(N, 4))
    mix = rng.normal(size=(4, DIMS))
    X = base @ mix + 0.05 * rng.normal(size=(N, DIMS)) + rng.normal(size=DIMS)
    rows = [(i, [float(v) for v in X[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, X


def test_covariance_matches_numpy(vec_df):
    df, X = vec_df
    got = {
        (r.i, r.j): r.cov for r in covariance_matrix(df, "embedding", DIMS).collect()
    }
    want = np.cov(X, rowvar=False, bias=True)
    assert len(got) == DIMS * DIMS
    for i in range(DIMS):
        for j in range(DIMS):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=2e-6)
            assert got[(i, j)] == got[(j, i)]  # emitted symmetric


def test_covariance_partition_invariant(vec_df):
    df, _ = vec_df
    a = sorted(map(tuple, covariance_matrix(df, "embedding", DIMS).collect()))
    b = sorted(
        map(tuple, covariance_matrix(df.repartition(13), "embedding", DIMS).collect())
    )
    assert a == b


def test_pca_components_match_numpy(vec_df):
    df, X = vec_df
    k = 5
    mean, comps, evar = pca_components(df, "embedding", DIMS, k)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    # eigenvalues descending and matching
    assert np.all(np.diff(evar) <= 1e-12)
    assert np.allclose(evar, evals[order], rtol=1e-9, atol=1e-12)
    # components span the same axes (sign-insensitive compare)
    for got, want in zip(comps, evecs[:, order].T):
        assert abs(abs(got @ want) - 1.0) < 1e-8
    # orthonormal
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    # deterministic sign rule: max-|loading| coordinate is positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0


def test_pca_project_matches_numpy(vec_df):
    df, X = vec_df
    k = 3
    mean, comps, _ = pca_components(df, "embedding", DIMS, k)
    out = pca_project(df, "vec_id", "embedding", DIMS, k).collect()
    assert len(out) == N
    want = (X - mean) @ comps.T
    by_id = {r.vec_id: [r.pc0, r.pc1, r.pc2] for r in out}
    for i in range(N):
        assert np.allclose(by_id[i], want[i], atol=2e-6)


def _brute_pairs(strings, k):
    import difflib  # noqa: F401  (not used — reference below is exact DP)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(enumerate(strings), 2):
        d = lev(sa, sb)
        if d <= k:
            out.add((ia, ib, d))
    return out


STRINGS = [
    "kitten", "sitten", "sittin", "sitting", "kitchen",  # sub/ins chains
    "abc", "abcd", "ab", "abc", "xbc", "axc", "abx",  # dup + all 1-subs
    "", "a", "b",  # empty-string edges
    "zzzzzz", "zzzzz", "yzzzzz",
]


@pytest.mark.parametrize("k", [1, 2])
def test_edit_distance_join_matches_bruteforce(spark, k):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(STRINGS)], "id long, s string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s", max_dist=k).collect()
    }
    assert got == _brute_pairs(STRINGS, k)


def test_edit_distance_join_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(STRINGS)], "id long, s string"
    )
    plan = edit_distance_join(df, "id", "s", 1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_edit_distance_join_preserves_string_ids(spark):
    # non-numeric ids must survive (an unconditional long cast would
    # silently NULL them and corrupt the pair list)
    df = spark.createDataFrame(
        [("doc-a", "kitten"), ("doc-b", "sitten"), ("doc-c", "zzz")],
        "id string, s string",
    )
    out = edit_distance_join(df, "id", "s", max_dist=1)
    assert dict(out.dtypes)["id_a"] == "string"
    got = {(r.id_a, r.id_b, r.dist) for r in out.collect()}
    assert got == {("doc-a", "doc-b", 1)}


def test_edit_distance_join_max_bucket_guard(spark):
    # planted hot name: 60 identical copies saturate their variant
    # buckets; the cap drops those buckets while every other pair is
    # still found with exact distances
    hot = [(1000 + i, "hotname") for i in range(60)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(STRINGS)] + hot, "id long, s string"
    )
    uncapped = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s", max_dist=1).collect()
    }
    capped_df = edit_distance_join(df, "id", "s", max_dist=1, max_bucket=10)
    capped = {(r.id_a, r.id_b, r.dist) for r in capped_df.collect()}
    # documented recall wall: pairs hiding entirely in hot buckets drop
    hot_ids = {i for i, _ in hot}
    assert capped == {p for p in uncapped if not (p[0] in hot_ids and p[1] in hot_ids)}
    assert len(uncapped) - len(capped) == 60 * 59 // 2
    # still no all-pairs stage anywhere in the capped plan
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
