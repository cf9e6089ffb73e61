"""Skew mitigation utilities.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) covers sort-merge joins. These helpers cover the
cases AQE cannot: skewed *aggregations* (one hot key melts a reducer)
and skewed broadcast-ineligible joins where the build side is mid-sized.

The reference never needed these (single machine), but chartevents at
MIMIC scale is exactly the shape that does: a handful of vital-sign
itemids carry >10% of all rows each (SURVEY.md §4 "Skew").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_by: list[str],
    agg_exprs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation through a salt column.

    ``agg_exprs`` maps output name → (partial_expr, final_expr) where
    ``partial_expr`` aggregates within (keys, salt) and ``final_expr``
    re-aggregates the partials per keys — i.e. the aggregate must be
    algebraic (sum/count/min/max; avg = sum+count composed by caller).

    Stage 1 spreads each hot key over ``salt_buckets`` reducers; stage 2
    combines ``salt_buckets`` rows per key — never a hot partition.
    (Catalyst's own partial aggregation usually makes this unnecessary;
    use it for aggregates where map-side combine is ineffective, e.g.
    collect_list/percentile over a hot key.)
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_by, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in agg_exprs.items()]
    )
    finals = []
    for name, (_, final_expr) in agg_exprs.items():
        # final_expr references the partial column by its __p_ name
        finals.append(final_expr.alias(name))
    return partial.groupBy(*group_by).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the (big, skewed) left side with a
    random bucket and EXPLODE the right side across all buckets.

    Right side grows ``salt_buckets``×, so use when right is mid-sized
    (too big to broadcast, small enough to replicate 8×) and left has
    hot keys. With AQE on, prefer letting the skew-join rule split
    partitions first; this is the explicit fallback for shuffle-hash
    paths and for engines/stages where AQE cannot rewrite.

    Measurement note (PERF r8b): the benefit is a STRAGGLER effect —
    one executor pinned on the hot partition while the rest idle — so
    a single-JVM local harness structurally cannot demonstrate it
    (all cores drain one queue; the probe shows only the replication
    overhead). Apply on real clusters when stage timelines show a
    pinned reducer, not prophylactically.
    """
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_right = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = salted_left.join(exploded_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")
