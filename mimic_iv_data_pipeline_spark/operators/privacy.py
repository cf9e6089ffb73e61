"""PII detection / redaction over text columns.

A training-data pipeline must scrub direct identifiers before a corpus
ships; the reference works on de-identified MIMIC exports and so never
needs this (its only privacy surface is the date-shifting already baked
into MIMIC), but any 100 TB web/clinical corpus does. Patterns are
deliberately conservative, anchored regexes over seven high-precision
identifier classes: emails, grouped 16-digit payment-card numbers
(shape-only — no Luhn check, so no digit arithmetic in the hot path and
no lookaround), US SSNs, international (+CC) phone numbers, US phone
numbers, full-form IPv6 addresses, and IPv4 addresses.

Everything is a narrow per-row column expression (regexp in whole-stage
codegen — no UDF, no shuffle), so redaction streams at scan speed on
any cluster size. Patterns use only RE2-safe syntax (no lookaround, no
backreferences) so the exact same strings run in DuckDB oracles
(`regexp_extract_all`, `regexp_replace(..., 'g')`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "suppress_small_groups",
    "with_pii_scrub",
]

# Ordered: earlier classes are redacted first, so overlapping matches
# (an email's local part containing digits, a card number containing a
# phone-shaped run) are consumed before later patterns can see them.
# Keep CC before SSN/PHONE (all are dashed digit runs; CC is the
# longest), SSN before PHONE (3-2-4 vs 3-3-4 group shapes), IPv6 before
# IPv4 (hex groups can embed decimal runs).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("cc", r"\b\d{4}(?:[- ]\d{4}){3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone_intl", r"\+\d{1,3}(?:[- ]?\d{3,4}){2,4}\b"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv6", r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts, each computed on the text with EARLIER
    classes already redacted — so ``n_<class>`` always equals the number
    of ``<CLASS>`` placeholders ``redact_pii`` emits, even when matches
    overlap across classes (e.g. a phone-shaped digit run inside an
    email local part is counted as email, not phone)."""
    counts: dict[str, Column] = {}
    cur = text
    for name, pat in PII_PATTERNS:
        counts[name] = F.size(
            # idx=0 (whole match) — Spark's default group index is 1,
            # DuckDB's regexp_extract_all defaults to 0; pin both.
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))
        ).cast("long")
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    return counts


def redact_pii(text: Column) -> Column:
    """Replace every match with a typed placeholder, class by class in
    ``PII_PATTERNS`` order."""
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-class counts + a ``redacted`` column in one projection."""
    text = F.col(text_col)
    cols = [df[c] for c in df.columns]
    cols += [expr.alias(f"n_{name}") for name, expr in pii_counts(text).items()]
    cols.append(redact_pii(text).alias("redacted"))
    return df.select(*cols)


def suppress_small_groups(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    size_col: str | None = "group_size",
) -> DataFrame:
    """k-anonymity by suppression (Sweeney 2002): drop every row whose
    quasi-identifier combination is shared by fewer than ``k`` rows, so
    each surviving row is indistinguishable from ≥ k−1 others on
    ``quasi_cols``.

    The structured-data counterpart of the text scrub above: PII regexes
    remove *direct* identifiers; small-group suppression removes
    *quasi*-identifier re-identification (the (age, zip, sex)-style
    linkage attack — the reason MIMIC itself coarsens ages and shifts
    dates). Suppression, not generalization: coarsening a column (age →
    bracket) is an ordinary projection callers apply BEFORE this
    operator, then re-check; iterating the two is the standard
    Datafly-style loop.

    Scale shape: one window count partitioned by the quasi columns —
    a single shuffle on the quasi key, no driver state, no join; AQE
    handles skewed quasi groups (huge groups are the ones that pass
    anyway). ``size_col`` (set None to omit) keeps the group size for
    downstream risk reporting.
    """
    if k < 1:
        raise ValueError(f"suppress_small_groups: k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("suppress_small_groups: quasi_cols must be non-empty")
    w = Window.partitionBy(*quasi_cols)
    out = df.withColumn("__gn", F.count(F.lit(1)).over(w))
    out = out.filter(F.col("__gn") >= k)
    if size_col is not None:
        return out.withColumn(size_col, F.col("__gn").cast("long")).drop("__gn")
    return out.drop("__gn")


def anonymity_risk_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int,
    l: int,
) -> DataFrame:
    """Per-quasi-identifier-group re-identification risk readout: the
    audit BEFORE :func:`suppress_small_groups` acts (public: Sweeney
    2002 k-anonymity + Machanavajjhala et al. 2007 distinct
    l-diversity — a group can be k-anonymous yet leak its sensitive
    value when everyone in it shares one diagnosis; l counts the
    distinct sensitive values).

    Returns one row per quasi group:
    ``(quasi…, n, l_distinct, k_risky, l_risky)`` — the flags a
    governance dashboard aggregates, kept per-group so the risky
    combinations are directly actionable.

    Scale shape: ONE hash aggregate on the quasi key (count +
    count-distinct in the same pass); output is |quasi-combination|
    rows — the cardinality a de-identification review works with, not
    fact-sized.
    """
    if k < 1 or l < 1:
        raise ValueError("anonymity_risk_report: k and l must be >= 1")
    if not quasi_cols:
        raise ValueError("anonymity_risk_report: quasi_cols must be non-empty")
    agg = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct(sensitive_col).cast("long").alias("l_distinct"),
    )
    return agg.select(
        *quasi_cols,
        "n",
        "l_distinct",
        (F.col("n") < k).cast("int").alias("k_risky"),
        (F.col("l_distinct") < l).cast("int").alias("l_risky"),
    )


def date_shift(
    df: DataFrame,
    subject_col: str,
    ts_cols: list[str],
    max_shift_days: int,
    salt: str = "dateshift",
    offset_col: str | None = None,
) -> DataFrame:
    """Deterministic per-subject date shifting: every timestamp of a
    subject moves by the SAME hash-derived whole-day offset in
    [−max_shift_days, +max_shift_days] (public: the MIMIC
    de-identification scheme itself — Johnson et al. 2016 shift each
    patient's dates by a random offset so within-patient intervals
    are exactly preserved while absolute dates are uninformative).

    The offset is content-addressed (md5 — the
    ``sampling.hash_unit`` portability recipe, expressible verbatim
    in any ANSI engine), NOT random: re-running the pipeline, on any
    cluster layout, shifts a subject identically, and a DuckDB twin
    reproduces every shifted timestamp bitwise. Whole-day shifts keep
    time-of-day intact (circadian features survive — the clinical
    reason MIMIC shifts by days, not seconds).

    Scale shape: a narrow per-row projection (hash + interval add) —
    no shuffle, no state. ``offset_col`` (optional) emits the applied
    day offset for audit.
    """
    if max_shift_days < 0:
        raise ValueError("date_shift: max_shift_days must be >= 0")
    if not ts_cols:
        raise ValueError("date_shift: ts_cols must be non-empty")
    from mimic_iv_data_pipeline_spark.operators.sampling import hash_unit

    span = 2 * max_shift_days + 1
    # NULL-safe subject key: an unguarded hash of a NULL subject makes
    # the offset NULL and ts + NULL-interval silently WIPES every
    # timestamp of those rows — data destruction, not de-id. NULL
    # subjects form one deterministic shift group (groupBy semantics);
    # the NUL byte cannot collide with a real cast id.
    key = F.coalesce(F.col(subject_col).cast("string"), F.lit("\x00null"))
    off = (
        F.floor(hash_unit(key, salt) * F.lit(float(span)))
        .cast("long")
        - F.lit(max_shift_days)
    )
    out = df.withColumn("__ds_off", off)
    for c in ts_cols:
        out = out.withColumn(
            c, F.expr(f"{c} + make_dt_interval(__ds_off, 0, 0, 0)")
        )
    if offset_col is not None:
        return out.withColumnRenamed("__ds_off", offset_col)
    return out.drop("__ds_off")
