"""Slowly-changing-dimension type-2 history building.

The reference pipeline materializes point-in-time snapshots by
re-deriving cohorts per day window (``day_intervals_cohort_v3.py``'s
repeated partition-by-date passes); a warehouse-shaped engine instead
keeps ONE history table with validity intervals and answers any
as-of-date question with a range predicate. This module builds that
table from a change log with plain window functions — no table format
required, and the only shuffle is one keyed exchange on the business
key, which at 100 TB colocates with a change log bucketed on the same
key.

Public shape (Kimball SCD type 2): per key, order changes by version,
derive ``effective_from`` = this change's version and ``effective_to``
= the next change's version (open interval, NULL for the current row),
plus an ``is_current`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    *,
    drop_unchanged: list[str] | None = None,
) -> DataFrame:
    """Build an SCD-2 history table from a change log.

    Parameters
    ----------
    changes : one row per (key, version) observation; later versions
        supersede earlier ones. Duplicate (key, version) rows are a
        contract violation and are deterministically collapsed to one
        row (min by remaining columns is NOT attempted — we keep the
        first by an arbitrary-but-stable tiebreak on all columns so the
        output never depends on partitioning).
    key_cols : business key.
    version_col : monotonically comparable version (timestamp or long).
    drop_unchanged : optionally, attribute columns to compare against
        the previous version; rows where ALL listed attributes equal
        the previous version's values are dropped BEFORE interval
        derivation (change-log compaction), so back-to-back identical
        snapshots don't produce zero-width history slices.

    Returns the change rows plus ``effective_from`` (= version),
    ``effective_to`` (next version per key, NULL on the latest row) and
    ``is_current`` (boolean).

    Scale shape: exactly ONE shuffle (partitionBy key for the windows;
    the dedup, compaction lag, and lead all share the same window
    partitioning so Spark plans a single exchange). No driver
    materialization, no UDFs.
    """
    if not key_cols:
        raise ValueError("scd2_history requires at least one key column")
    if version_col not in changes.columns:
        raise ValueError(f"version column {version_col!r} not in input")

    # NULL versions are a malformed change log, and they would be
    # silently eaten by the duplicate-collapse (NULLs sort first and
    # NULL eqNullSafe NULL is true) — raise at execution instead. The
    # guard is embedded in the column itself (rag_corpus uid_ok
    # pattern) so Catalyst cannot prune it away.
    changes = changes.withColumn(
        version_col,
        F.when(F.col(version_col).isNotNull(), F.col(version_col)).otherwise(
            F.raise_error(
                F.lit(f"scd2_history: NULL in version column {version_col!r}")
            )
        ),
    )

    other_cols = [c for c in changes.columns if c != version_col and c not in key_cols]

    # Stable collapse of duplicate (key, version) rows — expressed over
    # the SAME key-only partitioning as the interval windows below
    # (sorted by version first, duplicates are adjacent; a row is a dup
    # iff its predecessor carries the same version), so the whole
    # operator needs exactly ONE hash exchange. A per-(key, version)
    # row_number would be semantically identical but force a second
    # shuffle on the wider key.
    w_sorted = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).asc(),
        *[F.col(c).asc_nulls_last() for c in other_cols],
    )
    prev_v = F.lag(F.col(version_col)).over(w_sorted)
    df = (
        changes.withColumn("__dup", prev_v.eqNullSafe(F.col(version_col)))
        .filter(~F.col("__dup"))
        .drop("__dup")
    )

    w_key = Window.partitionBy(*key_cols).orderBy(F.col(version_col).asc())

    if drop_unchanged:
        missing = [c for c in drop_unchanged if c not in df.columns]
        if missing:
            raise ValueError(f"drop_unchanged columns not in input: {missing}")
        same = F.lit(True)
        for c in drop_unchanged:
            prev = F.lag(F.col(c)).over(w_key)
            # eqNullSafe, NOT == with an isNull fallback: plain equality
            # yields NULL (not false) when exactly one side is NULL, and
            # a NULL __keep is silently dropped by filter() — any
            # attribute transition to/from NULL would be compacted away
            # as "unchanged".
            same = same & F.col(c).eqNullSafe(prev)
        first = F.lag(F.col(version_col)).over(w_key).isNull()
        df = df.withColumn("__keep", first | ~same).filter(F.col("__keep")).drop(
            "__keep"
        )
        # Re-derive intervals over the compacted log: same partitioning,
        # so the second window reuses the exchange.

    nxt = F.lead(F.col(version_col)).over(w_key)
    return (
        df.withColumn("effective_from", F.col(version_col))
        .withColumn("effective_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def as_of(history: DataFrame, version) -> DataFrame:
    """Point-in-time slice of an SCD-2 history table: rows whose
    validity interval covers ``version`` (from inclusive, to
    exclusive). A plain range predicate — pushes down to the scan, and
    on a history table z-ordered by (key, effective_from) it prunes to
    the files containing the as-of frontier."""
    v = F.lit(version)
    return history.filter(
        (F.col("effective_from") <= v)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > v))
    )


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    fact_time: str,
    *,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (PIT) join: attach to each fact row the dimension
    attributes that were valid at ``fact_time`` — the standard consumer
    of an SCD-2 history table (and the feature-store "PIT correctness"
    join that prevents label leakage in training-data assembly).

    Matching rule: same key and ``from_col <= fact_time < to_col``
    (NULL ``to_col`` = open/current interval).

    Unlike ``asof_join`` (operators/joins.py:34), no tie-break window
    is needed: SCD-2 intervals are non-overlapping per key by
    construction (``scd2_history`` derives ``to`` as the next row's
    ``from``), so each fact row matches AT MOST one history row and the
    join output is exactly |facts| rows for ``how='left'``. Physical
    shape: equi-join on the key with a residual range predicate — a
    plain shuffled hash/sort-merge join that scales with executors; on
    a history bucketed by key it colocates with a fact table bucketed
    the same way.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    for c in (from_col, to_col):
        if c not in history.columns:
            raise ValueError(f"history is missing interval column {c!r}")

    overlapping = (set(facts.columns) & set(history.columns)) - set(key_cols)
    h = history
    for c in overlapping:
        h = h.withColumnRenamed(c, c + "_dim")
    for k in key_cols:
        h = h.withColumnRenamed(k, "__pit_key_" + k)

    f = from_col + "_dim" if from_col in overlapping else from_col
    t = to_col + "_dim" if to_col in overlapping else to_col
    cond = [facts[k] == h["__pit_key_" + k] for k in key_cols]
    cond.append(F.col(f) <= facts[fact_time])
    cond.append(F.col(t).isNull() | (F.col(t) > facts[fact_time]))

    cond_all = cond[0]
    for c in cond[1:]:
        cond_all = cond_all & c
    joined = facts.join(h, cond_all, how)
    return joined.drop(*["__pit_key_" + k for k in key_cols])
