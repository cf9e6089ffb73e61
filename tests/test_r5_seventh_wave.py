"""Round-5 seventh wave: Naive Bayes routing, RFM segmentation,
classical seasonal decomposition — python parity + edge cases (the
oracle battery covers the differential side)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import rfm_scores
from mimic_iv_data_pipeline_spark.operators.temporal import seasonal_decompose
from mimic_iv_data_pipeline_spark.operators.text import naive_bayes_scores


# ------------------------------------------------------------ Naive Bayes


def _nb_reference(docs, alpha=1.0):
    """Textbook add-alpha multinomial NB with micro-nat quantization."""
    from collections import Counter, defaultdict

    tok = [(d, y, t) for d, y, txt in docs for t in txt.lower().split()]
    wc = Counter((t, y) for _, y, t in tok)
    nc = Counter(y for _, y, _ in tok)
    dc = Counter(y for _, y, _ in docs)
    vocab = {t for _, _, t in tok}
    v, nd = len(vocab), len(docs)
    preds = {}
    for d, _, txt in docs:
        scores = {}
        for c in sorted(nc):
            s = math.floor(math.log(dc[c] / nd) * 1e6 + 0.5)
            for t in txt.lower().split():
                p = (wc.get((t, c), 0) + alpha) / (nc[c] + alpha * v)
                s += math.floor(math.log(p) * 1e6 + 0.5)
            scores[c] = s
        best = max(sorted(scores), key=lambda c: (scores[c], ))
        # argmax with ties to ascending label: max score, first label
        top = max(scores.values())
        best = min(c for c, s in scores.items() if s == top)
        preds[d] = (best, scores[best])
    return preds


def test_nb_matches_reference(spark):
    docs = [
        (1, "en", "the cat is on the mat"),
        (2, "en", "a dog is in the house"),
        (3, "es", "el gato es grande"),
        (4, "es", "la casa es blanca"),
        (5, "en", "the house is big"),
        (6, "es", "el perro es blanco"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["pred_label"], r["score_micro"])
           for r in naive_bayes_scores(df, "doc_id", "text", "lang").collect()}
    assert got == _nb_reference(docs)
    # self-training on separable classes recovers the labels
    assert all(got[d][0] == y for d, y, _ in docs)


def test_nb_unseen_token_smoothing(spark):
    """A doc whose tokens never co-occur with one class must still get
    a finite score for that class (add-1 smoothing, no -inf/NULL)."""
    docs = [(1, "a", "x x y"), (2, "b", "z z w"), (3, "a", "x q")]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = naive_bayes_scores(df, "doc_id", "text", "lang").collect()
    assert len(out) == 3 and all(r["score_micro"] is not None for r in out)


def test_nb_partition_invariance(spark):
    docs = [(i, "ab"[i % 2], f"tok{i % 7} tok{i % 3} tok{(i * 5) % 11}")
            for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    a = sorted(map(tuple, naive_bayes_scores(df.repartition(1), "doc_id", "text", "lang").collect()))
    b = sorted(map(tuple, naive_bayes_scores(df.repartition(32), "doc_id", "text", "lang").collect()))
    assert a == b


def test_nb_zero_overlap_class_can_win(spark):
    """Regression pin for the r6 class-pruned scorer: a class with
    ZERO token overlap with a doc must still win when its background
    line (prior + n·lp0) dominates — the candidate-union path. Class
    'a' is huge with a tiny vocabulary (so its per-token likelihood
    for the doc's unique tokens is terrible), class 'z' is small (big
    lp0); the test doc's tokens never co-occur with 'z'."""
    docs = []
    for i in range(400):
        docs.append((i, "a", " ".join(f"c{(i * 7 + j) % 20}" for j in range(10))))
    for i in range(40):
        docs.append((1000 + i, "z", "zz"))
    star = (5000, "a", " ".join(f"u{j}" for j in range(40)))
    docs.append(star)
    ref = _nb_reference(docs)
    assert ref[5000][0] == "z"  # the fixture targets the zero-overlap path
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["pred_label"], r["score_micro"])
           for r in naive_bayes_scores(df, "doc_id", "text", "lang").collect()}
    assert got == ref


def test_nb_many_classes_matches_reference(spark):
    """Dense brute-force parity at 8 classes with skewed priors and
    partially-disjoint vocabularies — every path of the pruned plan
    (seen candidates, shared tokens, background union, ties)."""
    import random as _r

    _r.seed(5)
    docs = []
    did = 0
    for c in range(8):
        for _ in range(5 + 4 * c):
            own = [f"v{c}_{_r.randrange(12)}" for _ in range(6)]
            shared = [f"s{_r.randrange(9)}" for _ in range(2)]
            docs.append((did, f"L{c}", " ".join(own + shared)))
            did += 1
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["pred_label"], r["score_micro"])
           for r in naive_bayes_scores(df, "doc_id", "text", "lang").collect()}
    assert got == _nb_reference(docs)


# ------------------------------------------------------------------ RFM


def test_rfm_reference(spark):
    # 10 users, one event each: user u at t = 1e6 + 10u with spend
    # 10(u+1) -> clean monotone recency/monetary quintiles
    rows = [(u, 1_000_000 + 10 * u, (u + 1) * 10) for u in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, tsec long, v long"
    ).select("user_id", F.timestamp_seconds("tsec").alias("ts"), F.col("v"))
    out = {r["user"]: r for r in rfm_scores(df, "user_id", "ts", "v").collect()}
    # user 9 is the most recent, most monetary -> r=5, m=5
    assert out[9]["r"] == 5 and out[9]["m"] == 5
    assert out[0]["r"] == 1 and out[0]["m"] == 1
    # recency_s exact integer seconds from the corpus max
    assert out[0]["recency_s"] == 90 and out[9]["recency_s"] == 0
    # single event per user -> frequency all 1 -> f split only by ntile
    # remainder rule; cells composed correctly
    for u, r in out.items():
        assert r["rfm_cell"] == r["r"] * 100 + r["f"] * 10 + r["m"]


def test_rfm_frequency_ranks(spark):
    rows = [(u, 1000 + i, 5) for u in range(5) for i in range((u + 1) * 2)]
    df = spark.createDataFrame(rows, "user_id long, tsec long, v long").select(
        "user_id", F.timestamp_seconds("tsec").alias("ts"), "v"
    )
    out = {r["user"]: r for r in rfm_scores(df, "user_id", "ts", "v").collect()}
    assert out[4]["frequency"] == 10 and out[4]["f"] == 5
    assert out[0]["frequency"] == 2 and out[0]["f"] == 1


# ------------------------------------------------- seasonal decomposition


def test_seasonal_reference(spark):
    """y = 100 + 10·(day mod 7) + noiseless trend plateau: the centered
    MA recovers the level, weekday means recover the seasonal shape."""
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = [("a", base + dt.timedelta(days=i), 100 + 10 * ((base + dt.timedelta(days=i)).toordinal() % 7))
            for i in range(28)]
    df = spark.createDataFrame(rows, "k string, day date, y long")
    out = sorted(
        seasonal_decompose(df, "k", "day", "y", period=7, trend_window=7).collect(),
        key=lambda r: r["day"],
    )
    # first/last 3 rows: incomplete window -> NULL trend/seasonal/residual
    for r in out[:3] + out[-3:]:
        assert r["trend"] is None and r["residual"] is None
    # interior: trend == mean of one full period == 100 + 10*3 = 130
    interior = out[3:-3]
    for r in interior:
        assert abs(r["trend"] - 130.0) < 1e-9
        # pure weekly signal: residual == 0 (seasonal absorbs everything)
        assert abs(r["residual"]) < 1e-5
        assert abs((r["trend"] + r["seasonal"]) - r["y"]) < 1e-5


def test_seasonal_position_is_epoch_day_mod(spark):
    import datetime as dt

    d = dt.date(1970, 1, 8)  # epoch day 7 -> position 0
    df = spark.createDataFrame([("a", d, 5)], "k string, day date, y long")
    row = seasonal_decompose(df, "k", "day", "y").collect()[0]
    assert row["position"] == 0 and row["trend"] is None


def test_seasonal_even_window_raises(spark):
    df = spark.createDataFrame([("a", "2024-01-01", 1)], "k string, day string, y long")
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(df, "k", "day", "y", trend_window=4)
