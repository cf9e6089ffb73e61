"""Nightly warehouse refresh as ONE composable plan.

The dimensional-modeling counterpart of ``plans/llm_corpus.py``: the
sequence a lakehouse runs every night, chaining the round-5 warehouse
operators in their canonical order:

    1. gate      — ``validate_expectations`` on the incoming change
                   batch; refuse the batch (raise) or quarantine the
                   violating rows, per policy
    2. history   — ``scd2_history`` over accepted changes (validity
                   intervals, change-log compaction)
    3. enrich    — ``pit_join`` of the fact batch against the history
                   (each fact sees the dimension as of its own time)
    4. rollup    — ``rollup_state`` of the enriched facts merged into
                   the running state via ``merge_rollup_state``
    5. profile   — ``profile_table`` of the enriched output (the
                   freshness/sanity report humans read next morning)

Stage order is load-bearing: gate BEFORE history (a violating change
row would otherwise be woven into intervals and poison every later
as-of read), history before enrich (obviously), rollup on the ENRICHED
facts (so dimension attributes can key the rollup), profile LAST (it
reports what was actually shipped).

Every stage is a DataFrame→DataFrame function and the composition is
lazy; ``refuse=False`` quarantines instead of raising so one bad row
doesn't hold the nightly hostage (both policies tested with planted
defects).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import (
    merge_rollup_state,
    rollup_state,
)
from mimic_iv_data_pipeline_spark.operators.history import pit_join, scd2_history
from mimic_iv_data_pipeline_spark.operators.profiling import (
    Expectation,
    profile_table,
    validate_expectations,
)


@dataclass
class WarehouseRefresh:
    """Outputs of one nightly refresh."""

    history: DataFrame
    enriched: DataFrame
    rollup: DataFrame
    profile: DataFrame
    quarantined: DataFrame | None
    gate_report: DataFrame


def _null_key_filter(key_cols: list[str]):
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(k).isNotNull()
    return cond


def nightly_refresh(
    changes: DataFrame,
    *,
    facts: DataFrame,
    key_cols: list[str],
    version_col: str,
    fact_time: str,
    attr_cols: list[str],
    measure_cols: list[str],
    rollup_keys: list[str],
    prev_rollup: DataFrame | None = None,
    extra_rules: list[Expectation] | None = None,
    refuse: bool = False,
) -> WarehouseRefresh:
    """Run one refresh over a change batch + fact batch.

    Gate rules: key/version not-null and (key, version) uniqueness are
    ALWAYS checked (they are scd2_history's input contract — the
    operator collapses duplicates and raises on NULL versions, but the
    gate makes the violation a reported decision instead of a silent
    repair); callers add domain rules via ``extra_rules``.

    ``refuse=True``: any violation raises. ``refuse=False``: rows with
    NULL keys/versions AND rows violating any ROW-LOCAL extra rule
    (not_null / accepted_values / in_range / matches_regex) are
    quarantined (returned, not woven into history) — reporting a
    domain violation while still weaving the row in would poison the
    as-of intervals the gate exists to protect. Set-level extras:
    duplicate (key, version) rows are left to scd2_history's
    deterministic collapse since dropping "the duplicate" requires a
    tiebreak anyway, and foreign_key rules are report-only in
    quarantine mode (anti-join the quarantine yourself if FK rows must
    be held back). The gate report is returned either way — at 100 TB
    the report is a handful of rows while the checks ride the same scan
    the history build needs.
    """
    rules = [Expectation("not_null", (c,)) for c in (*key_cols, version_col)]
    rules.append(Expectation("unique", (*key_cols, version_col)))
    rules.extend(extra_rules or [])
    gate_report = validate_expectations(changes, rules)

    if refuse:
        bad = gate_report.filter(~F.col("passed")).limit(1).collect()
        if bad:
            raise ValueError(
                f"nightly_refresh: expectation failed: {bad[0].rule} "
                f"({bad[0].n_violations} violations)"
            )
        accepted, quarantined = changes, None
    else:
        from mimic_iv_data_pipeline_spark.operators.profiling import (
            expectation_row_violation,
        )

        ok = _null_key_filter([*key_cols, version_col])
        for r in extra_rules or []:
            bad = expectation_row_violation(r)
            if bad is not None:
                ok = ok & ~bad
        accepted = changes.filter(ok)
        quarantined = changes.filter(~ok)

    # a dimension attribute that collides with a fact column is emitted
    # by pit_join as '<attr>_dim'; a rollup key naming that attribute
    # would silently rebind to the FACT side's (stale) column — force
    # the caller to say which side they mean
    renamed = [c for c in attr_cols if c in facts.columns]
    bad_keys = [k for k in rollup_keys if k in renamed]
    if bad_keys:
        raise ValueError(
            f"nightly_refresh: rollup key(s) {bad_keys} name dimension "
            f"attributes that collide with fact columns; pit_join emits "
            f"the dimension value as '<attr>_dim' — key the rollup on "
            f"that, or rename the fact column"
        )
    history = scd2_history(
        accepted, key_cols, version_col, drop_unchanged=attr_cols
    )
    enriched = pit_join(
        facts,
        history.select(*key_cols, *attr_cols, "effective_from", "effective_to"),
        key_cols,
        fact_time,
    )
    delta = rollup_state(enriched, rollup_keys, measure_cols)
    rollup = (
        merge_rollup_state(prev_rollup, delta=delta, key_cols=rollup_keys, measure_cols=measure_cols)
        if prev_rollup is not None
        else delta
    )
    profile = profile_table(
        enriched, [*rollup_keys, *measure_cols], exact_distinct=False
    )
    return WarehouseRefresh(
        history=history,
        enriched=enriched,
        rollup=rollup,
        profile=profile,
        quarantined=quarantined,
        gate_report=gate_report,
    )
