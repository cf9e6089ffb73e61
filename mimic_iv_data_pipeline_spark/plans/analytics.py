"""Product-analytics daily readout as ONE composable plan.

The event-log counterpart of ``plans/warehouse.py``: the report set a
product team regenerates from the raw event stream every morning,
chaining the round-5 analytics operators in their canonical order:

    1. sessions     — ``sessionize`` + per-user session stats (the
                      engagement base everything else reads)
    2. funnel       — ``funnel_conversion`` over the ordered stage
                      list (earliest-qualifying recurrence)
    3. attribution  — ``attribute_revenue`` of conversion revenue to
                      channel touches (first/last/linear, conserved)
    4. retention    — cohort-month × months-since active-user matrix
    5. segments     — ``rfm_scores`` quintiles over the same log

Stage independence is the point here (contrast the warehouse plan,
where order is load-bearing): every readout derives from the SAME
event relation, so the plan amortizes cost by materializing the
cleaned event projection ONCE (localCheckpoint — five consumers would
otherwise re-scan and re-parse the log five times, the q185 lesson)
and fans out. What IS load-bearing is consistency: one snapshot
boundary for all five reports — no report may see events another
didn't (the mid-flight ingest race a naive five-query script has), which
the shared materialization guarantees by construction.

Every output is a plain DataFrame; planted-defect tests pin each
stage's contract (a pre-signup purchase never counts as converted, an
out-of-window touch lands unattributed, a one-event session is a
bounce).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.engine import materialize

from mimic_iv_data_pipeline_spark.operators.aggregates import rfm_scores
from mimic_iv_data_pipeline_spark.operators.windows import (
    attribute_revenue,
    funnel_conversion,
    sessionize,
)


@dataclass
class DailyAnalytics:
    """Outputs of one daily analytics build. All members are
    lazy-consumable EXCEPT ``funnel``, which is computed eagerly at
    build time: funnel_conversion is an iterative frontier recurrence
    whose per-stage relations are materialized (localCheckpoint — the
    same discipline as pagerank/connected_components), so its cost is
    paid in daily_analytics() whether or not the member is read. Call
    sites that never consume the funnel should run funnel_conversion
    separately instead of paying for it here.
    """

    events: DataFrame  # the shared materialized snapshot
    session_stats: DataFrame
    funnel: DataFrame
    attribution: DataFrame
    retention: DataFrame
    rfm: DataFrame


def daily_analytics(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str,
    id_col: str,
    funnel_stages: list[str],
    conversion_type: str,
    channel_types: list[str],
    lookback_seconds: int = 604800,
    session_gap_seconds: int = 1800,
) -> DailyAnalytics:
    """Build all five readouts from one materialized event snapshot.

    ``value_col`` must be integer-quantized (cents). The retention
    matrix is month-granular: cohort = first-active month, activity
    counted as distinct users per (cohort, months-since).
    """
    ev = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("typ"),
            F.col(value_col).alias("cents"),
            F.col(id_col).alias("eid"),
        )
        .transform(materialize)
    )

    sess = sessionize(ev, "u", "ts", session_gap_seconds, tie_break="eid")
    per_session = sess.groupBy("u", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    session_stats = per_session.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("bounce_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("dur_us").cast("long").alias("total_session_micros"),
    )

    funnel = funnel_conversion(ev, funnel_stages, "u", "ts", "typ")

    attribution = attribute_revenue(
        ev,
        "u",
        "ts",
        "typ",
        "cents",
        conversion_type=conversion_type,
        channel_types=channel_types,
        lookback_seconds=lookback_seconds,
        tie_break="eid",
    )

    first_touch = ev.groupBy("u").agg(
        F.min(F.date_trunc("month", F.col("ts"))).alias("__cohort_ts")
    )
    retention = (
        ev.join(first_touch, "u")
        .select(
            F.date_format("__cohort_ts", "yyyy-MM").alias("cohort_month"),
            (
                (F.year("ts") - F.year("__cohort_ts")) * 12
                + (F.month("ts") - F.month("__cohort_ts"))
            ).cast("long").alias("months_since"),
            "u",
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("u").cast("long").alias("active_users"))
    )

    rfm = rfm_scores(ev, "u", "ts", "cents")

    return DailyAnalytics(
        events=ev,
        session_stats=session_stats,
        funnel=funnel,
        attribution=attribution,
        retention=retention,
        rfm=rfm,
    )
