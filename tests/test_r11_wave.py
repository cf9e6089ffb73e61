"""Round-11 wave: prefix-skew fallback in build_corpus_index (ADVICE
r10 medium) and ANN id-type preservation (ADVICE r10 low).

1. ``build_corpus_index`` detects a dominant 2-char prefix bucket and
   falls back to a sampled RANGE-bucketed rank. Bucket boundaries never
   affect the global rank of a contiguous bucketing, so all three
   string paths (window, prefix-bucketed, range-bucketed) must emit
   IDENTICAL (__i, __doc) relations — pinned on a skewed URL corpus
   (the motivating case: every id shares the "ht" prefix) and on a
   NULL-bearing unicode corpus (the r10 NULL-drop regression class).
2. ``ivf_topk`` / ``ann_lsh_topk`` with score="pandas" must return id
   columns of the INPUT id type — the Arrow path works in long
   internally but casts back, so int ids no longer widen relative to
   the expression path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _index_rows(df):
    return [(r["__i"], r["__doc"]) for r in df.orderBy("__i").collect()]


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # every id shares the 'ht' prefix — one 2-char bucket holds ALL docs
    return spark.range(0, 200).select(
        F.concat(
            F.lit("https://corpus.example/doc/"),
            F.lpad(F.col("id").cast("string"), 6, "0"),
        ).alias("doc_key")
    )


def test_range_rank_matches_window_rank_on_skewed_corpus(spark, skewed_docs):
    from mimic_iv_data_pipeline_spark.operators.sampling import build_corpus_index

    win = _index_rows(build_corpus_index(skewed_docs, "doc_key"))
    # skew_cap=1 forces the range fallback (every doc is in one bucket)
    rng = _index_rows(
        build_corpus_index(
            skewed_docs, "doc_key", window_threshold=0, skew_cap=1, range_buckets=7
        )
    )
    # skew_cap=10**9 forces the prefix path even on the skewed corpus
    # (single bucket -> single window partition; correct, just slow)
    pre = _index_rows(
        build_corpus_index(
            skewed_docs, "doc_key", window_threshold=0, skew_cap=10**9
        )
    )
    assert win == rng == pre
    assert [i for i, _ in win] == list(range(200))


def test_skew_detector_dispatch(spark, skewed_docs):
    """Auto dispatch: a dominant bucket routes to the range path (no
    prefix-substring bucketing in the plan — the rank runs over the
    materialized range partitioning), a uniform corpus stays on the
    prefix path (substring bucket key in the plan)."""
    from mimic_iv_data_pipeline_spark.operators.sampling import build_corpus_index

    skewed = build_corpus_index(skewed_docs, "doc_key", window_threshold=0)
    assert "substring(__doc" not in skewed._jdf.queryExecution().toString()

    # reversed zero-padded ids: the leading 2 chars are the (uniform)
    # low-order digits — 100 prefix buckets of 2 docs each
    uniform = spark.range(0, 200).select(
        F.reverse(F.lpad(F.col("id").cast("string"), 6, "0")).alias("doc_key")
    )
    # cap = max(0, 200//8) = 25 >> max bucket 2 -> prefix path
    pre = build_corpus_index(uniform, "doc_key", window_threshold=0)
    assert "substring(__doc" in pre._jdf.queryExecution().toString()
    assert _index_rows(pre) == _index_rows(build_corpus_index(uniform, "doc_key"))


def test_range_rank_null_and_unicode_parity(spark):
    from mimic_iv_data_pipeline_spark.operators.sampling import build_corpus_index

    docs = spark.createDataFrame(
        [(None,), ("",), ("ht",), ("https://a/0",), ("https://a/1",),
         ("https://a/é",), ("zz",)],
        "doc_key string",
    )
    win = _index_rows(build_corpus_index(docs, "doc_key"))
    rng = _index_rows(
        build_corpus_index(
            docs, "doc_key", window_threshold=0, skew_cap=1, range_buckets=3
        )
    )
    assert win == rng
    assert win[0][1] is None  # null ranks first on every path


def test_negative_sample_identical_across_index_paths(spark, skewed_docs):
    from mimic_iv_data_pipeline_spark.operators.sampling import (
        build_corpus_index,
        negative_sample,
    )

    pos = spark.createDataFrame(
        [(1, "https://corpus.example/doc/000003"),
         (2, "https://corpus.example/doc/000007"),
         (3, "https://corpus.example/doc/000011")],
        "query_id long, doc_key string",
    )
    out = {}
    for name, idx in (
        ("window", build_corpus_index(skewed_docs, "doc_key")),
        ("range", build_corpus_index(
            skewed_docs, "doc_key", window_threshold=0, skew_cap=1, range_buckets=5
        )),
    ):
        rows = (
            negative_sample(pos, doc_col="doc_key", k=3, corpus_index=idx)
            .orderBy("query_id", "neg_rank")
            .collect()
        )
        out[name] = [tuple(r) for r in rows]
    assert out["window"] == out["range"]
    assert len(out["window"]) == 9


def test_ann_pandas_path_preserves_id_type(spark):
    import numpy as np

    from mimic_iv_data_pipeline_spark.operators.similarity import (
        ann_lsh_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(7)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    centroids = rng.normal(size=(4, 8))

    for fn, kw in (
        (ivf_topk, {"n_cells": 4, "n_probe": 4, "centroids": centroids}),
        (ann_lsh_topk, {"dims": 8, "bits": 2}),
    ):
        pand = fn(emb, corpus=emb, k=3, score="pandas", **kw)
        expr = fn(emb, corpus=emb, k=3, score="expr", **kw)
        assert pand.schema["query_id"].dataType.simpleString() == "int"
        assert pand.schema["neighbor_id"].dataType.simpleString() == "int"
        # and the values still match the expression path exactly
        key = lambda r: (r["query_id"], r["neighbor_id"])  # noqa: E731
        assert sorted(map(tuple, pand.collect()), key=lambda t: (t[0], t[1])) == \
            sorted(map(tuple, expr.collect()), key=lambda t: (t[0], t[1]))


def test_smd_balance_null_covariate_complete_case(spark):
    """A NULL-bearing covariate must use its own non-null count, not a
    shared count(*): the old shared-n formula counted NULL rows in the
    denominator while the sums skipped them (deflated mean/var — the
    anova_oneway complete-case failure mode, fixed r11)."""
    from mimic_iv_data_pipeline_spark.operators.aggregates import smd_balance

    rows = [
        # g, x (no nulls), y (half null in group a)
        ("a", 10, 100), ("a", 20, None), ("a", 30, 200), ("a", 40, None),
        ("b", 10, 100), ("b", 20, 150), ("b", 30, 200), ("b", 40, 250),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["covariate"]: r for r in smd_balance(df, "g", ["x", "y"]).collect()}
    # x: complete on both sides
    assert out["x"]["n_a"] == 4 and out["x"]["n_b"] == 4
    assert out["x"]["mean_a"] == 25.0
    # y in group a: mean over the TWO non-null rows = 150, var = 5000
    assert out["y"]["n_a"] == 2
    assert out["y"]["mean_a"] == 150.0
    assert out["y"]["var_a"] == 5000.0
    # group b complete: mean 175, var 4166.66..
    assert out["y"]["n_b"] == 4
    assert out["y"]["mean_b"] == 175.0
    # NULL group rows are excluded entirely
    with_null_g = spark.createDataFrame(
        rows + [(None, 99, 99)], "g string, x long, y long"
    )
    out2 = {r["covariate"]: r for r in smd_balance(with_null_g, "g", ["x"]).collect()}
    assert out2["x"]["n_a"] == 4 and out2["x"]["n_b"] == 4


# ---------------------------------------------------------------------------
# semantic_dedup pairs="pandas": the per-cell Gram kernel must be
# BIT-identical to the expression-path self-join (r10 verdict item 4 —
# the c675103 why-not is solved by per-dimension sequential
# accumulation, which reproduces the expression fold's addition order
# exactly, not approximately)
# ---------------------------------------------------------------------------


def _sem_rows():
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    rows = []
    for i in range(120):
        v = centers[i % 4] + rng.normal(scale=0.05, size=16)
        rows.append((i, [float(x) for x in v]))
        if i % 3 == 0:  # planted near-dup
            rows.append(
                (1000 + i, [float(x) for x in v + rng.normal(scale=0.001, size=16)])
            )
    # edge rows: zero vector (try_divide NULL), NULL element (never
    # prunes), true-NaN element (always prunes — Spark orders NaN above
    # any threshold), duplicate id (flags OR per id)
    rows.append((5000, [0.0] * 16))
    rows.append((5001, [None] + [1.0] * 15))
    nanv = [float("nan")] + [float(x) for x in centers[0]][1:]
    rows.append((5002, nanv))
    rows.append((5003, [float(x) for x in centers[1]]))
    rows.append((5003, [float(x) for x in centers[2]]))
    # inf-norm overflow: squares of 1e200 overflow to inf -> cosine
    # inf/inf = NaN, the one REACHABLE NaN (literal NaN data elements
    # are laundered to NULL by the assignment pass's Arrow round-trip);
    # two of them so a smaller-id partner exists in whatever cell the
    # all-NaN distance row lands in
    rows.append((5004, [1e200 * float(x) for x in centers[0]]))
    rows.append((5005, [1e200 * float(x) for x in centers[3]]))
    cent = [[float(x) + 0.01 for x in centers[i]] for i in range(4)]
    return rows, cent


@pytest.mark.parametrize("thr", [0.95, 0.999999])
def test_semantic_dedup_pandas_matches_join(spark, thr):
    from mimic_iv_data_pipeline_spark.operators.dedup import semantic_dedup

    rows, cent = _sem_rows()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=thr, centroids=cent)
    a = semantic_dedup(emb, "vec_id", "embedding", pairs="join", **kw)
    b = semantic_dedup(emb, "vec_id", "embedding", pairs="pandas", **kw)
    ra = a.orderBy("id", "cell").collect()
    rb = b.orderBy("id", "cell").collect()
    assert ra == rb
    assert sum(r["pruned"] for r in ra) > 0  # the fixture actually prunes
    pr = {r["id"]: r["pruned"] for r in rb}
    assert pr[5000] is False and pr[5001] is False  # zero-norm / NULL element
    # the NaN-element row is ALSO never pruned — on BOTH paths: the
    # assignment pass's Arrow round-trip coerces NaN array elements to
    # NULL before either pair strategy runs, so it degrades to the
    # NULL-element case (the kernel's isnan branch still guards the
    # reachable NaN cosines: inf-norm overflow products)
    assert pr[5002] is False
    # the inf-overflow rows: NaN cosine vs their smaller-id cellmates
    # prunes them (NaN >= thr is true under Spark's NaN ordering; the
    # kernel's isnan branch must agree — it does, on both paths)
    assert pr[5004] is True and pr[5005] is True


def test_semantic_dedup_pandas_exact_boundary_threshold(spark):
    """Ulp pin: threshold set to a REALIZED pair cosine — >= must keep
    the pair pruned on both paths; any summation-order deviation in the
    kernel would flip this bit."""
    from pyspark.sql import functions as F

    from mimic_iv_data_pipeline_spark.operators.dedup import semantic_dedup
    from mimic_iv_data_pipeline_spark.operators.similarity import (
        as_double_vec,
        cosine,
    )

    rows, cent = _sem_rows()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = (
        emb.alias("a")
        .crossJoin(emb.alias("b"))
        .where((F.col("a.vec_id") == 0) & (F.col("b.vec_id") == 1000))
        .select(
            cosine(
                as_double_vec(F.col("a.embedding")),
                as_double_vec(F.col("b.embedding")),
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    a = semantic_dedup(
        emb, "vec_id", "embedding", threshold=thr, centroids=cent, pairs="join"
    ).orderBy("id", "cell").collect()
    b = semantic_dedup(
        emb, "vec_id", "embedding", threshold=thr, centroids=cent, pairs="pandas"
    ).orderBy("id", "cell").collect()
    assert a == b
    assert {r["id"]: r["pruned"] for r in b}[1000] is True  # inclusive >=


def test_semantic_dedup_auto_routes_pandas(spark):
    from mimic_iv_data_pipeline_spark.operators.dedup import semantic_dedup

    rows, cent = _sem_rows()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, "vec_id", "embedding", centroids=cent)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # auto -> the per-cell kernel
    with pytest.raises(ValueError, match="pairs"):
        semantic_dedup(emb, "vec_id", "embedding", centroids=cent, pairs="nope")
