"""Planted-defect tests for the nightly warehouse refresh plan
(plans/warehouse.py) — each stage must catch the defect aimed at it,
matching the per-stage test discipline of plans/llm_corpus.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.profiling import Expectation
from mimic_iv_data_pipeline_spark.plans.warehouse import nightly_refresh


def _changes(spark, extra_rows=()):
    rows = [
        (1, "basic", 10),
        (1, "pro", 20),
        (2, "basic", 10),
        (2, "basic", 20),  # no-op → compacted
        *extra_rows,
    ]
    return spark.createDataFrame(rows, "uid long, tier string, v long")


def _facts(spark):
    rows = [(1, 15, 5.0), (1, 25, 7.0), (2, 15, 1.0), (3, 15, 2.0)]
    return spark.createDataFrame(rows, "uid long, t long, amount double")


def _run(spark, changes, **kw):
    defaults = dict(
        key_cols=["uid"],
        version_col="v",
        fact_time="t",
        attr_cols=["tier"],
        measure_cols=["amount"],
        rollup_keys=["tier"],
    )
    defaults.update(kw)
    return nightly_refresh(changes, facts=_facts(spark), **defaults)


def test_clean_batch_end_to_end(spark):
    out = _run(spark, _changes(spark))
    # history: compaction dropped the uid=2 no-op
    assert out.history.count() == 3
    # enrichment is PIT-correct: uid=1 fact at t=15 sees 'basic',
    # at t=25 sees 'pro'; uid=3 has no dimension → NULL tier
    e = {(r.uid, r.t): r.tier for r in out.enriched.collect()}
    assert e[(1, 15)] == "basic" and e[(1, 25)] == "pro"
    assert e[(3, 15)] is None
    # rollup groups by the ENRICHED attribute
    r = {row.tier: row for row in out.rollup.collect()}
    assert r["basic"].n == 2 and r["basic"].sum_amount == 6.0
    assert r["pro"].n == 1
    assert out.quarantined.count() == 0
    assert out.gate_report.filter(~F.col("passed")).count() == 0
    assert out.profile.count() == 2  # tier + amount columns profiled


def test_null_key_rows_are_quarantined_not_woven_in(spark):
    bad = _changes(spark, extra_rows=[(None, "ghost", 10)])
    out = _run(spark, bad)
    assert out.quarantined.count() == 1
    assert out.quarantined.collect()[0].tier == "ghost"
    assert out.history.filter(F.col("tier") == "ghost").count() == 0
    report = {r.rule: r for r in out.gate_report.collect()}
    assert report["not_null(uid)"].n_violations == 1


def test_refuse_policy_raises_with_rule_name(spark):
    bad = _changes(spark, extra_rows=[(None, "ghost", 10)])
    with pytest.raises(ValueError, match="not_null"):
        _run(spark, bad, refuse=True)


def test_incremental_rollup_across_two_nights(spark):
    night1 = _run(spark, _changes(spark))
    night2 = _run(spark, _changes(spark), prev_rollup=night1.rollup)
    r1 = {r.tier: r for r in night1.rollup.collect()}
    r2 = {r.tier: r for r in night2.rollup.collect()}
    # same facts twice → doubled counts/sums, identical min/max
    for tier in r1:
        assert r2[tier].n == 2 * r1[tier].n
        assert r2[tier].sum_amount == pytest.approx(2 * r1[tier].sum_amount)
        assert r2[tier].min_amount == r1[tier].min_amount


def test_extra_domain_rules_surface_in_report(spark):
    out = _run(
        spark,
        _changes(spark, extra_rows=[(9, "unknown-tier", 10)]),
        extra_rules=[
            Expectation("accepted_values", ("tier",), values=("basic", "pro"))
        ],
    )
    report = {r.rule: r for r in out.gate_report.collect()}
    assert report["accepted_values(tier)"].n_violations == 1
