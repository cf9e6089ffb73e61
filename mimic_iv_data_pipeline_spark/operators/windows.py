"""Ordered analytics / window operators (SURVEY.md §2.5).

The reference implements every one of these as a python loop over a
pandas ``groupby`` (readmission labels ``day_intervals_cohort.py:136-177``)
or as pandas frame methods on small pivoted frames (``ffill()/bfill()``
``model/data_generation_icu.py:404-412``). Here each is a Spark window
chain: one hash shuffle on the partition key, then whole-stage-codegen'd
sort + frame evaluation — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cols(x: str | list[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def ffill(df: DataFrame, value_col: str, partition_by: str | list[str],
          order_by: str | list[str], out_col: str | None = None) -> DataFrame:
    """W3 forward fill: ``last(value, ignorenulls=True)`` over an
    unbounded-preceding frame (pandas ``ffill()``,
    ``data_generation_icu.py:404-412``)."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col or value_col, F.last(value_col, ignorenulls=True).over(w))


def bfill(df: DataFrame, value_col: str, partition_by: str | list[str],
          order_by: str | list[str], out_col: str | None = None) -> DataFrame:
    """W3 backward fill: ``first(value, ignorenulls=True)`` over the
    following frame (pandas ``bfill()``)."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return df.withColumn(out_col or value_col, F.first(value_col, ignorenulls=True).over(w))


def impute_cascade(
    df: DataFrame,
    value_col: str,
    partition_by: str | list[str],
    order_by: str | list[str],
    strategy: str | None = "mean",
    default: float = 0.0,
) -> DataFrame:
    """T6: the reference's imputation cascade ffill → bfill →
    mean/median-per-group → constant (``data_generation_icu.py:404-412,
    622-630``; ``impute`` ∈ {None, 'Mean', 'Median'}).

    All four stages share the same partitioning, so the whole cascade is
    one shuffle + one sort.
    """
    parts = _cols(partition_by)
    out = ffill(df, value_col, parts, order_by)
    out = bfill(out, value_col, parts, order_by)
    if strategy:
        gw = Window.partitionBy(*parts)
        fallback: Column
        if strategy.lower() == "mean":
            fallback = F.avg(value_col).over(gw)
        elif strategy.lower() == "median":
            fallback = F.expr(f"percentile_approx({value_col}, 0.5)").over(gw)
        else:
            raise ValueError(f"unknown impute strategy: {strategy}")
        out = out.withColumn(value_col, F.coalesce(F.col(value_col), fallback))
    return out.na.fill({value_col: default})


def first_row_per_group(
    df: DataFrame, partition_by: str | list[str], order_by: list[Column]
) -> DataFrame:
    """W7: deterministic ``.iloc[0]``-per-group
    (``data_generation_icu.py:453,459-460``) — ``row_number()==1`` with a
    total order (callers must include a tie-break column)."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame, partition_by: str | list[str], order_by: list[Column], k: int
) -> DataFrame:
    """W6: top-k per group (``value_counts().index[:max_features]``,
    ``icu_preprocess_util.py:306,312``) via ``row_number() <= k``."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def label_readmission(
    visits: DataFrame,
    subject_col: str = "subject_id",
    admit_col: str = "admittime",
    disch_col: str = "dischtime",
    gap_days: int = 30,
    label_col: str = "label",
    tie_break: str | None = None,
    assume_nonoverlapping: bool = False,
) -> DataFrame:
    """J8/W2: readmission lookahead labeling.

    Reference: ``partition_by_readmit`` (``day_intervals_cohort.py:136-177``)
    loops visits per subject and labels a visit 1 iff another admission
    starts after this discharge and within ``gap_days`` of it. Any such
    admission is automatically *later* in admit order (admit₂ > disch₁ ≥
    admit₁), so the loop is exactly an EXISTS over a per-subject range
    self-join — the default here (property-tested against a brute-force
    loop in tests/test_cohort_pipeline.py, including overlapping visits).

    ``assume_nonoverlapping=True`` takes the cheaper single-window path
    (MIN admit over ROWS 1 FOLLOWING..UNBOUNDED decides): one shuffle
    instead of two, valid when no admit falls inside another visit of
    the same subject — true for real hospital admissions.
    """
    if assume_nonoverlapping:
        order = [F.col(admit_col).asc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        w = (
            Window.partitionBy(subject_col)
            .orderBy(*order)
            .rowsBetween(1, Window.unboundedFollowing)
        )
        next_admit = F.min(admit_col).over(w)
        within_gap = (
            next_admit.isNotNull()
            & (next_admit > F.col(disch_col))
            & (
                (F.unix_timestamp(next_admit) - F.unix_timestamp(disch_col))
                <= gap_days * 86400
            )
        )
        return visits.withColumn(
            label_col, F.when(within_gap, 1).otherwise(0).cast("int")
        )

    later = visits.select(
        F.col(subject_col).alias("__rs"), F.col(admit_col).alias("__radmit")
    )
    cond = (
        (F.col(subject_col) == F.col("__rs"))
        & (F.col("__radmit") > F.col(disch_col))
        & (
            (F.unix_timestamp("__radmit") - F.unix_timestamp(disch_col))
            <= gap_days * 86400
        )
    )
    pos = visits.join(later, on=cond, how="left_semi").withColumn(
        label_col, F.lit(1).cast("int")
    )
    neg = visits.join(later, on=cond, how="left_anti").withColumn(
        label_col, F.lit(0).cast("int")
    )
    return pos.unionByName(neg)


def sessionize(
    df: DataFrame,
    partition_by: str | list[str],
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tie_break: str | None = None,
) -> DataFrame:
    """Gap-based sessionization (scale extension; not in the reference).

    ``lag`` + cumulative sum of gap-breaks per key — one shuffle. The
    streaming twin is ``session_window`` in streaming/events.py.
    """
    parts = _cols(partition_by)
    order = [F.col(ts_col).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*parts).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    is_break = (
        prev_ts.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev_ts)) > gap_seconds)
    ).cast("long")
    wsum = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(session_col, F.sum(is_break).over(wsum))
