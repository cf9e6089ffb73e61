"""Table-maintenance utilities: small-file compaction and file-level
manifests.

A 100 TB pipeline's silent killer is file-count creep: every streaming
trigger, every fine-grained partitionBy, every retry leaves small
files, and scan cost is per-FILE (driver listing, footer reads, task
scheduling) long before it is per-byte. These are the maintenance
passes a table format (Delta/Iceberg OPTIMIZE) would run, expressed on
plain parquet directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["file_manifest", "compact_parquet"]


def file_manifest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-file statistics of a file-backed DataFrame: row count plus
    min/max for each requested column — the data-skipping index a
    format's manifest would hold, derivable for free from one scan via
    ``input_file_name()``.

    Use it to (a) audit z-order/clustering effectiveness (tight
    per-file spans = good skipping, see `operators/layout.py` tests),
    (b) find compaction candidates (many small ``n_rows``), and
    (c) drive manual partition pruning for engines reading the
    directory raw.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols or []:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_rows_per_file`` files;
    returns the output file count.

    Sizing by ROWS (one count pass) rather than bytes keeps the rule
    engine-portable; pick the target so files land near the 128-256 MB
    scan sweet spot for the table's row width. ``sort_within_by``
    switches the rewrite to ``repartitionByRange`` + per-file sort on
    those columns — output files then hold DISJOINT sorted key ranges
    (clustering for free while the data is in flight; single-key
    cousin of the z-order pass, and the layout that makes
    ``file_manifest`` spans tight for data skipping). Writes to
    ``out_path`` and leaves the source intact: atomic swap is the
    caller's move (rename/retarget), the same write-new-then-flip
    discipline every compactor uses.
    """
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    if sort_within_by:
        out = df.repartitionByRange(n_files, *sort_within_by)
        out = out.sortWithinPartitions(*sort_within_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    written = spark.read.parquet(out_path).select(
        F.input_file_name().alias("f")
    ).distinct().count()
    return written
