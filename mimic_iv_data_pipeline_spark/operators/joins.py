"""Join operators (SURVEY.md §2.3).

Plain equi-joins (J1-J6) need no wrappers — callers use ``df.join``
directly and Catalyst broadcasts the small side. This module holds the
two join shapes the reference hand-rolls imperatively:

* J7 as-of/interval join — the reference's ``hadm_imputer``
  (``utils/labs_preprocess_util.py:13-60``) loops per lab row under a
  ``multiprocessing.Pool(8)`` writing uuid-named csv shards.
* J9 grouped code mapping — ``icd_9to10`` scans the whole mapping table
  per distinct code (``utils/hosp_preprocess_util.py:402-426``,
  O(codes × map)).

Both become single declarative joins here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def semi_filter(df: DataFrame, ids: DataFrame, on: str | list[str]) -> DataFrame:
    """P6/J6: membership filter expressed as a left-semi join.

    The reference uses ``isin`` against collected id lists
    (``day_intervals_cohort.py:39,347``); a semi join keeps the id set
    distributed (no driver collect) and lets AQE broadcast it when small.
    """
    return df.join(ids, on=on, how="left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_start: str,
    right_end: str | None = None,
    tolerance_expr: Column | None = None,
    direction: str = "nearest_after_start",
    suffix: str = "_r",
    tie_break: list[Column] | None = None,
) -> DataFrame:
    """J7: as-of / interval join with deterministic tie-break.

    Semantics of the reference's ``hadm_imputer``
    (``utils/labs_preprocess_util.py:13-60``): for each left row, find
    right rows of the same key whose interval ``[right_start, right_end]``
    contains ``left_time``; on ties keep the row minimizing
    ``left_time - right_start``. Left rows with no match survive with
    nulls (the reference keeps un-imputed labs).

    Physical shape: the equi key makes this a regular shuffled
    SortMergeJoin with a residual range predicate — NOT a broadcast
    nested loop — so it scales with executors. The ``row_number`` dedup
    shares the same hash partitioning as the join output, so AQE
    typically plans join + window with one shuffle of each side.

    ``direction='backward'`` (no ``right_end``) gives classic trading
    as-of semantics: latest right event at-or-before ``left_time``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # Disambiguate overlapping column names before the non-equi condition.
    # Keys are renamed too (dropped after the join) so that self-joins —
    # both sides derived from the same scan — never produce an ambiguous
    # or trivially-true predicate.
    overlapping = (set(left.columns) & set(right.columns)) - set(keys)
    renamed = right
    for c in overlapping:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    for k in keys:
        renamed = renamed.withColumnRenamed(k, "__asof_key_" + k)

    def rcol(name: str) -> Column:
        return F.col(name + suffix) if name in overlapping else F.col(name)

    # Unique left-row handle so the tie-break window is exactly
    # "one winner per left row" (the reference tracks this implicitly by
    # looping rows). monotonically_increasing_id is stable within the plan.
    tagged = left.withColumn("__asof_row", F.monotonically_increasing_id())

    cond = [F.col(k) == F.col("__asof_key_" + k) for k in keys]
    if direction == "backward":
        cond.append(F.col(left_time) >= rcol(right_start))
        order = rcol(right_start).desc()
    else:
        cond.append(F.col(left_time) >= rcol(right_start))
        if right_end is not None:
            cond.append(F.col(left_time) <= rcol(right_end))
        order = (F.col(left_time).cast("long") - rcol(right_start).cast("long")).asc()
    if tolerance_expr is not None:
        cond.append(tolerance_expr)

    cond_expr = cond[0]
    for c in cond[1:]:
        cond_expr = cond_expr & c
    joined = tagged.join(renamed, on=cond_expr, how="left")
    joined = joined.drop(*["__asof_key_" + k for k in keys])
    ordering = [order] + (tie_break or [])
    w = Window.partitionBy("__asof_row").orderBy(*ordering)
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_row", "__asof_rn")
    )


def map_codes(
    df: DataFrame,
    mapping: DataFrame,
    code_col: str,
    map_key: str,
    map_value: str,
    out_col: str | None = None,
    key_expr: Column | None = None,
    fallback_to_code: bool = True,
) -> DataFrame:
    """J9: dimension-table code mapping as a broadcast hash join.

    Replaces ``icd_9to10``'s per-code scan loop
    (``utils/hosp_preprocess_util.py:402-426``): dedupe the mapping to
    first-match per key (W5 semantics — the reference takes ``.iloc[0]``),
    broadcast it, left join, and fall back to the original code where
    unmapped (``coalesce``).

    ``key_expr`` lets callers join on a derived key such as the 3-char
    ICD root (``substring(icd_code, 1, 3)``, F1).
    """
    out_col = out_col or code_col
    first_match = (
        mapping.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(map_key).orderBy(map_value)),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col(map_key).alias("__map_key"), F.col(map_value).alias("__map_value"))
    )
    join_key = key_expr if key_expr is not None else F.col(code_col)
    joined = df.join(
        F.broadcast(first_match), join_key == F.col("__map_key"), "left"
    )
    mapped = (
        F.coalesce(F.col("__map_value"), F.col(code_col))
        if fallback_to_code
        else F.col("__map_value")
    )
    return joined.withColumn(out_col, mapped).drop("__map_key", "__map_value")
