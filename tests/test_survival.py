"""Survival-format sequence export: golden tests against the
hand-computed reference shape (preprocess_outcomes.py:48-140)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.plans.survival import (
    extend_code_vocab,
    survival_sequences,
)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, "A", date(2020, 1, 1)),
        (1, "B", date(2020, 1, 1)),
        (1, "B", date(2020, 1, 5)),
        (1, "C", date(2020, 1, 12)),
        (2, "A", date(2020, 2, 1)),
        (3, "C", date(2020, 3, 1)),  # no label → dropped
    ]
    return spark.createDataFrame(rows, "pt_id long, code string, visit_date date")


@pytest.fixture(scope="module")
def lab(spark):
    return spark.createDataFrame(
        [(1, 1, 30), (2, 0, 10)],
        "pt_id long, event_label int, time_to_event int",
    )


def test_survival_sequences_golden_reverse(spark, ev, lab):
    seqs, vocab = survival_sequences(ev, lab)
    v = {r["code"]: r["id"] for r in vocab.collect()}
    # zero_pad seed + deterministic code order
    assert v == {"zero_pad": 0, "A": 1, "B": 2, "C": 3}
    got = {r["pt"]: r for r in seqs.collect()}
    assert set(got) == {1, 2}  # pt 3 unlabeled → dropped (reference inner merge)
    # reverse=True (reference default): latest visit first, Δt = gap to
    # the NEXT-newer visit, first entry 0
    one = [(vis["dt"], list(vis["codes"])) for vis in got[1]["visits"]]
    assert one == [(0, [3]), (7, [2]), (4, [1, 2])]
    assert got[1]["label"] == [1.0, 30.0]
    assert [(x["dt"], list(x["codes"])) for x in got[2]["visits"]] == [(0, [1])]
    assert got[2]["label"] == [0.0, 10.0]


def test_survival_sequences_normal_order(spark, ev, lab):
    seqs, _ = survival_sequences(ev, lab, reverse=False)
    got = {r["pt"]: r for r in seqs.collect()}
    one = [(vis["dt"], list(vis["codes"])) for vis in got[1]["visits"]]
    assert one == [(0, [1, 2]), (4, [2]), (7, [3])]


def test_extend_code_vocab_builds_on_existing(spark, ev):
    existing = spark.createDataFrame(
        [("zero_pad", 0), ("A", 5)], "code string, id long"
    )
    v = {
        r["code"]: r["id"]
        for r in extend_code_vocab(ev, "code", existing).collect()
    }
    # existing ids never renumbered; new codes continue after max
    assert v == {"zero_pad": 0, "A": 5, "B": 6, "C": 7}


def test_predefined_split(spark):
    from mimic_iv_data_pipeline_spark.plans.ml_assembly import (
        train_test_split_ids,
    )

    cohort = spark.createDataFrame([(i,) for i in range(10)], "stay_id long")
    pre_train = spark.createDataFrame([(i,) for i in [0, 1, 2, 99]], "stay_id long")
    pre_valid = spark.createDataFrame([(3,), (4,)], "stay_id long")
    pre_test = spark.createDataFrame([(5,), (6,)], "stay_id long")
    tr, va, te = train_test_split_ids(
        cohort, predefined=[pre_train, pre_valid, pre_test]
    )
    assert sorted(r["stay_id"] for r in tr.collect()) == [0, 1, 2]  # 99 ∉ cohort
    assert sorted(r["stay_id"] for r in va.collect()) == [3, 4]
    assert sorted(r["stay_id"] for r in te.collect()) == [5, 6]
    # random path still returns a tuple sized by weights
    a, b, c = train_test_split_ids(cohort, weights=(0.7, 0.1, 0.2))
    assert a.count() + b.count() + c.count() == 10
