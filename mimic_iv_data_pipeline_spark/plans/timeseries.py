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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.temporal import (
    bucketize_events,
    truncate_observation_window,
)


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
    expand_parallelism: int | None = None,
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
    # Densify + impute per (id, code-observed-for-id) in ARRAY form —
    # one aggregate keyed by (id, code), then narrow array expressions
    # (optimization r11, guide §2.4). The previous shape built the grid
    # as distinct→explode→left join→window cascade: four exchanges
    # (bucket agg, grid distinct, grid-side join shuffle, window sort
    # on (id, code)) with the bucket agg subtree consumed twice. Here
    # the bucket agg keeps its exchange and ONE further exchange packs
    # each (id, code) series into a bucket→(value, n_events) map; the
    # dense 0..n_buckets-1 grid, the ffill→bfill→default cascade and
    # the explode back to long rows are all narrow (2 exchanges total,
    # and the |ids·codes·buckets| dense relation never shuffles at
    # all). Values are bit-identical to the join/window form: ffill /
    # bfill only MOVE existing doubles (no arithmetic), and
    # coalesce(ffill, bfill, default) ≡ the sequential cascade because
    # post-ffill nulls exist only before the first observation, where
    # bfill-of-original equals bfill-of-ffilled (parity pinned by
    # tests/test_timeseries.py + the pipeline mode-parity suite).
    if impute is not None and str(impute).lower() not in ("mean", "median"):
        # keep impute_cascade's validation contract on the array path
        raise ValueError(f"unknown impute strategy: {impute}")
    # Wide codegen path (optimization r11, guide §2.3/§4.1): for the
    # grids this pipeline actually runs (n_buckets = include_hours /
    # bucket_hours ≤ 96), pack the series as 2·n_buckets conditional
    # aggregates — max(when(bucket = b, ...)) per bucket — instead of
    # the map_from_entries(collect_list(...)) object aggregate. bucket
    # is unique per (id, code) after bucketize_events, so max() picks
    # the single observed value and the aggregate is a plain
    # whole-stage-codegen HashAggregate over primitive buffers (the
    # map form is an ObjectHashAggregate, outside codegen, and every
    # grid probe __m[b] is an O(|map|) interpreted scan). The
    # ffill→bfill→default cascade collapses to per-bucket coalesce
    # chains — coalesce(v_b, v_{b-1}..v_0, v_{b+1}.., 0) is exactly
    # "last observation before b, else first after b, else default" —
    # so the whole densify+impute runs inside codegen with zero
    # higher-order functions. Values are bit-identical: the fill only
    # MOVES existing doubles, and both forms read the same bucket agg
    # (interleaved A/B at sf0.1: 2.12 → 1.38 s noop, 1,823,160-row
    # multiset parity; tests/test_timeseries.py pins wide == map).
    # Beyond the width bound the map/HOF form below keeps unbounded
    # grids working (coalesce chains grow O(n²) in codegen size).
    # The wide expressions are built as parsed SQL strings, not Column
    # algebra (optimization r12, guide §5): the Column form issued
    # O(n_buckets²) py4j round-trips — ~1.5 s of single-threaded DRIVER
    # time per call at 24 buckets, measured larger than the job's own
    # executor wall — while one F.expr parse is milliseconds. The parsed
    # form is plan-identical (DataFrame.sameSemantics == True vs the
    # Column form; pinned by tests), so executors see the same codegen.
    if n_buckets <= 96:
        vcols = [
            F.expr(f"max(CASE WHEN bucket = {b} THEN value END)").alias(f"__v{b}")
            for b in range(n_buckets)
        ]
        ncols = [
            F.expr(f"max(CASE WHEN bucket = {b} THEN n_events END)").alias(f"__n{b}")
            for b in range(n_buckets)
        ]
        packed = binned.groupBy(id_col, code_col).agg(*vcols, *ncols)
        # Optional explicit width for the expansion tail (optimization
        # r12, guide §2.5): the packed relation is tiny in BYTES (48
        # numeric columns per (id, code)) but the stage that consumes
        # it does ~n_buckets× the work per byte — the coalesce-chain
        # fill, the n_buckets-struct inline explode (24× the rows out)
        # and the boundary write/serialize. AQE coalesces the packed
        # exchange by its byte size, blind to that expansion: at
        # pipeline scale factors the whole tail collapsed to 1-10
        # tasks (a 1-task 2.5 s serial region observed in the memory
        # twin). A caller that knows the regime passes the shuffle
        # width it sized for the cluster (run_pipeline passes
        # spark.sql.shuffle.partitions); the explicit user repartition
        # is exempt from AQE coalescing, the moved bytes are ~1/24 of
        # the stage's OUTPUT, and packed values are partitioning-
        # independent (per-group max/conditional aggregates), so the
        # result is unchanged (pinned by tests/test_r12_s3.py).
        if expand_parallelism:
            packed = packed.repartition(
                int(expand_parallelism), F.col(id_col), F.col(code_col)
            )

        def _filled_sql(b: int) -> str:
            if impute is None:
                return f"`__v{b}`"
            order = (
                [f"`__v{i}`" for i in range(b, -1, -1)]
                + [f"`__v{i}`" for i in range(b + 1, n_buckets)]
                + ["0.0D"]
            )
            return "coalesce(" + ", ".join(order) + ")"

        struct_sql = ", ".join(
            f"named_struct('bucket', {b}, 'value', {_filled_sql(b)}, "
            f"'n_events', CAST(coalesce(`__n{b}`, 0) AS BIGINT))"
            for b in range(n_buckets)
        )
        return packed.select(
            id_col, code_col, F.expr(f"inline(array({struct_sql}))")
        )
    entries = binned.groupBy(id_col, code_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.col("bucket"), F.struct(F.col("value"), F.col("n_events")))
            )
        ).alias("__m")
    )
    seq = F.sequence(F.lit(0), F.lit(n_buckets - 1))
    raw_vals = F.transform(seq, lambda b: F.col("__m")[b]["value"])
    n_events = F.transform(
        seq, lambda b: F.coalesce(F.col("__m")[b]["n_events"], F.lit(0))
    )

    def _arr_ffill(a: Column) -> Column:
        # running last-non-null: ANSI-safe (element_at guarded by size)
        return F.aggregate(
            a,
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.coalesce(
                        x, F.when(F.size(acc) > 0, F.element_at(acc, F.size(acc)))
                    )
                ),
            ),
        )

    series = entries.withColumn("__v", raw_vals).withColumn("__ne", n_events).drop("__m")
    if impute is not None:
        filled = F.zip_with(
            _arr_ffill(F.col("__v")),
            F.reverse(_arr_ffill(F.reverse(F.col("__v")))),
            lambda a, b: F.coalesce(a, b, F.lit(0.0)),
        )
        series = series.withColumn("__v", filled)
    return series.select(
        id_col,
        code_col,
        F.inline(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda b: F.struct(
                    b.alias("bucket"),
                    F.col("__v")[b].alias("value"),
                    F.col("__ne")[b].alias("n_events"),
                ),
            )
        ),
    )


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
