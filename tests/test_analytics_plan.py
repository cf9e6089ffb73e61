"""plans/analytics.py — the daily product-analytics fan-out: each
stage's contract pinned with a planted defect, plus the cross-stage
consistency the shared snapshot guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.plans.analytics import daily_analytics


def _build(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, tsec long, event_type string, cents long, event_id long"
    ).select(
        "user_id",
        F.timestamp_seconds("tsec").alias("ts"),
        "event_type",
        "cents",
        "event_id",
    )
    return daily_analytics(
        df,
        value_col="cents",
        id_col="event_id",
        funnel_stages=["view", "click", "purchase"],
        conversion_type="purchase",
        channel_types=["view", "click"],
        lookback_seconds=3600,
        session_gap_seconds=1800,
    )


DAY = 86400
MONTH = 31 * DAY


@pytest.fixture(scope="module")
def plan(spark):
    rows = [
        # user 1: full ordered funnel inside one session, one month
        (1, 100, "view", 0, 1),
        (1, 200, "click", 0, 2),
        (1, 300, "purchase", 500, 3),
        # user 2: purchase BEFORE any view (planted: must NOT convert
        # the ordered funnel past stage 1; purchase unattributed)
        (2, 100, "purchase", 700, 4),
        (2, 200, "view", 0, 5),
        # user 3: touch outside lookback (planted: unattributed), and
        # two sessions (gap > 1800), the second a single-event bounce
        (3, 0, "click", 0, 6),
        (3, 2 * DAY, "purchase", 900, 7),
        # user 3 active again two months later -> retention row
        (3, 2 * MONTH + 2 * DAY, "view", 0, 8),
    ]
    return _build(spark, rows)


def test_funnel_respects_order(plan):
    f = {r["stage"]: r["users"] for r in plan.funnel.collect()}
    # user1 and user2 and user3 viewed at some point => stage 'view'
    # counts users with a view; only user 1 purchases AFTER view+click
    assert f["view"] == 3
    assert f["click"] == 1
    assert f["purchase"] == 1


def test_attribution_conserves_revenue(plan):
    rows = plan.attribution.collect()
    total = sum(r["linear_micro"] for r in rows)
    assert total == (500 + 700 + 900) * 1_000_000
    un = {r["channel"]: r for r in rows}["(unattributed)"]
    # user 2 (no prior touch) and user 3 (touch out of lookback)
    assert un["linear_micro"] == (700 + 900) * 1_000_000


def test_session_stats_bounce(plan):
    s = {r["u"]: r for r in plan.session_stats.collect()}
    assert s[1]["n_sessions"] == 1 and s[1]["bounce_sessions"] == 0
    # user 3: three events in three separate sessions, all bounces
    assert s[3]["n_sessions"] == 3 and s[3]["bounce_sessions"] == 3


def test_retention_matrix(plan):
    r = {(x["cohort_month"], x["months_since"]): x["active_users"]
         for x in plan.retention.collect()}
    # everyone is active in their cohort month
    assert r[("1970-01", 0)] == 3
    # user 3 returns two months later
    assert r[("1970-01", 2)] == 1


def test_rfm_covers_all_users(plan):
    rows = plan.rfm.collect()
    assert {r["user"] for r in rows} == {1, 2, 3}
    for r in rows:
        assert 1 <= r["r"] <= 5 and r["rfm_cell"] == r["r"] * 100 + r["f"] * 10 + r["m"]


def test_cross_stage_consistency(plan):
    """Every report derives from the same snapshot: total events seen
    by session stats equals the snapshot count; every RFM user appears
    in session stats."""
    n_events = plan.events.count()
    assert sum(r["n_events"] for r in plan.session_stats.collect()) == n_events
    assert {r["user"] for r in plan.rfm.collect()} == {
        r["u"] for r in plan.session_stats.collect()
    }
