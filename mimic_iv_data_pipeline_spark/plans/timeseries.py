"""Entry point 3: time-series representation (SURVEY.md §3.3).

The reference's ``data_generation_icu.Generator`` ends in a python loop
*per stay_id* doing pandas pivots (``create_Dict``,
``data_generation_icu.py:441-729``) — its biggest scalability cliff.
Here the whole pipeline is set-level, keyed by (stay_id, itemid,
bucket): normalize → truncate → bucket-aggregate → densify → impute,
staying in LONG format end to end; the wide/tensor forms are final
presentation steps (pivot_features / assemble_map_tensor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.temporal import (
    bucketize_events,
    truncate_observation_window,
)
from mimic_iv_data_pipeline_spark.operators.windows import impute_cascade


def generate_timeseries(
    events: DataFrame,
    cohort: DataFrame,
    id_col: str = "stay_id",
    code_col: str = "itemid",
    time_col: str = "event_time_from_admit",
    value_col: str = "valuenum",
    los_hours_col: str = "los_hours",
    include_hours: int = 72,
    bucket_hours: int = 1,
    anchor: str = "first",
    impute: str | None = None,
) -> DataFrame:
    """T2+T3+T4+T6 composed: dense per-(id, code) hourly signal.

    1. truncate to the observation window — first ``include_hours``
       (mortality/LOS) or last (readmission), per
       ``data_generation_icu.py:172-283``;
    2. tumbling-bucket aggregate {mean value, count} per (id, code,
       bucket) — the ``smooth_meds`` loop (``:286-345``) as ONE hash agg;
    3. densify to the full 0..n_buckets-1 grid per (id, code) observed
       for that id — the per-visit ``reindex(range(los))`` (``:396-399``);
    4. imputation cascade ffill → bfill → mean/median → 0 (``:404-412``).

    Everything shuffles on (id) or (id, code) — co-partitioned chains,
    no driver loop, no pivot until presentation.
    """
    # cohort's LOS under a private name: events from preproc_events
    # already carry los_hours, and an unrenamed join made the
    # anchor='last' (readmission) path fail with AMBIGUOUS_REFERENCE
    visits = cohort.select(
        F.col(id_col), F.col(los_hours_col).alias("__ts_los")
    )
    evs = events.join(visits, on=id_col, how="inner")
    evs = truncate_observation_window(
        evs, time_col, "__ts_los", include_hours, anchor=anchor
    ).drop("__ts_los")
    binned = bucketize_events(
        evs,
        time_col=time_col,
        bucket_hours=bucket_hours,
        group_by=[id_col, code_col],
        agg_exprs=[
            F.avg(value_col).alias("value"),
            F.count(F.lit(1)).alias("n_events"),
        ],
    )
    n_buckets = -(-include_hours // bucket_hours)  # ceil
    # Clip to the grid BEFORE building the code universe: truncation
    # keeps t <= include_hours, so an event in the final floored hour
    # buckets to n_buckets — off the 0..n_buckets-1 grid. Unfiltered it
    # would (a) vanish in the left join and (b) still seed the (id,
    # code) universe, FABRICATING an all-zero series for a code never
    # observed in-window (the reference's reindex(range(los)) likewise
    # drops out-of-range rows without adding columns for them).
    binned = binned.filter(F.col("bucket") < n_buckets)
    # Grid per (id, code-observed-for-id): mirrors the reference, which
    # reindexes only columns that appeared for the visit
    # (data_generation_icu.py:475-483). explode(sequence) is a narrow
    # generate — no extra shuffle before the left join.
    grid = (
        binned.select(id_col, code_col)
        .distinct()
        .select(
            id_col,
            code_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
        )
    )
    dense = grid.join(binned, on=[id_col, code_col, "bucket"], how="left")
    dense = dense.withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
    if impute is not None:
        dense = impute_cascade(
            dense,
            "value",
            partition_by=[id_col, code_col],
            order_by=["bucket"],
            # pass through verbatim: impute_cascade lowercases and
            # VALIDATES ('Mean'/'Median' accepted, junk raises) — the
            # old in-expression coercion silently rewrote typos to None
            strategy=impute,
            default=0.0,
        )
    return dense


def medication_signal(
    meds: DataFrame,
    id_col: str = "stay_id",
    code_col: str = "itemid",
    start_col: str = "start_hours",
    stop_col: str = "stop_hours",
    include_hours: int = 72,
    bucket_hours: int = 1,
) -> DataFrame:
    """T5: interval → per-bucket on/off signal for med administrations
    (``data_generation_icu.py:478-501``): signal=1 for every bucket the
    interval [start, stop) covers, clamped to the observation window
    (P8 ``stop>los → los`` clamp at ``:164``).

    Set form: explode each interval into its covered buckets via
    ``sequence`` (bounded by include_hours — no unbounded blowup), then
    max per (id, code, bucket) collapses overlapping orders.
    """
    clamped = (
        meds.withColumn(start_col, F.greatest(F.col(start_col), F.lit(0)))
        .withColumn(stop_col, F.least(F.col(stop_col), F.lit(include_hours)))
        .filter(F.col(start_col) < F.col(stop_col))
    )
    # bucket b covers [b·bh, (b+1)·bh); [start, stop) intersects it for
    # b in [floor(start/bh), ceil(stop/bh)-1]; stop > start ≥ 0 guarantees
    # hi ≥ lo. The ceil form is exact for fractional stops too (the prior
    # floor((stop-1)/bh) assumed integer hours: start=0.2, stop=0.5 made
    # the sequence descend and emit a spurious bucket -1).
    lo = F.floor(F.col(start_col) / bucket_hours).cast("long")
    hi = F.ceil(F.col(stop_col) / bucket_hours).cast("long") - 1
    buckets = clamped.select(
        id_col,
        code_col,
        F.explode(F.sequence(lo, hi)).alias("bucket"),
    )
    return buckets.groupBy(id_col, code_col, "bucket").agg(
        F.lit(1).alias("signal")
    )
