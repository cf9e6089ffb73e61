"""Physical data layout: multi-column z-order clustering for data
skipping.

At 100 TB the scan you avoid is worth more than the one you optimize:
parquet row-group/file min-max statistics prune reads only if rows with
nearby values are physically co-located. Sorting clusters ONE column;
z-ordering (bit-interleaved Morton codes over quantile buckets — the
same scheme as Delta Lake's ``OPTIMIZE ZORDER BY`` and DuckDB/Iceberg
ordering recipes) clusters several at once, so predicates on *any* of
the keyed columns prune files.

The pipeline's natural use: events keyed by ``(subject_id, ts)`` or
documents by ``(source, n_chars)`` — point lookups by id AND time-range
scans both skip, where a plain sort serves only one of the two.

Quantile bucketing (not min-max linear scaling) makes the code
skew-proof: each column's buckets are equal-frequency, computed with
one ``percentile_approx`` pass (mergeable sketch, no sort) and applied
via a broadcast literal threshold array + one higher-order ``filter``
count — JVM codegen, no UDF, no join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def _bucket(col: Column, thresholds: list[float]) -> Column:
    """Equal-frequency bucket index in [0, len(thresholds)] via a
    literal-array rank count (codegen; no join, no UDF)."""
    thr = F.array(*[F.lit(float(t)) for t in thresholds])
    return F.size(F.filter(thr, lambda t: t <= col.cast("double")))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, Column]:
    """Attach a Morton (z-order) key over ``cols``.

    One ``percentile_approx`` job learns per-column equal-frequency
    thresholds (2^bits buckets); the key interleaves the bucket bits so
    proximity in the key implies proximity in EVERY keyed column.
    Returns ``(df, key_column)`` — the df is unchanged, the key is a
    pure expression over it.
    """
    if bits * len(cols) > 63:
        # the interleaved key must fit a signed 64-bit long; overflowing
        # silently wraps and destroys the clustering property
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits * len(cols)} exceeds 63; "
            "reduce bits or the column count"
        )
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    quantiles = df.select(
        *[
            F.percentile_approx(F.col(c).cast("double"), F.lit(probs), F.lit(10_000)).alias(c)
            for c in cols
        ]
    ).collect()[0]

    z = F.lit(0).cast("long")
    ncols = len(cols)
    for ci, c in enumerate(cols):
        # thresholds are sorted; dedupe to keep the filter cheap on
        # low-cardinality columns. percentile_approx returns NULL (or
        # NULL elements) for an all-NULL column — such a column carries
        # no clustering signal, so it degrades to a single zero bucket
        # instead of raising inside sorted().
        thr = sorted({t for t in (quantiles[c] or []) if t is not None})
        b = F.least(_bucket(F.col(c), thr), F.lit(n_buckets - 1)).cast("long")
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * ncols + ci
            )
    return df, z.alias("__z")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as ``n_files`` z-clustered parquet files.

    ``repartitionByRange`` on the z-key gives each output file a
    contiguous z-range → tight min-max stats on every keyed column →
    file- and row-group-level skipping for predicates on any of them.
    The write is the cost; every later scan is the payoff (the
    Delta/Iceberg ``OPTIMIZE`` trade).
    """
    base, z = zorder_key(df, cols, bits)
    (
        base.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
