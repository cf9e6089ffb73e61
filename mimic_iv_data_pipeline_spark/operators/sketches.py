"""Frequency sketches over token streams: exact heavy hitters and a
Count-Min sketch built as a DataFrame aggregation.

Corpus-frequency questions ("what are the most common tokens / boiler-
plate lines?") drive stop-lists and dedup heuristics. The exact path
is a single hash aggregate on the token (vocabulary-bounded, so fine
even at 100 TB); the Count-Min path bounds the *state* instead —
``depth × width`` counters regardless of vocabulary size — which is
the shape you want when the keys are unbounded (URLs, 13-gram
fingerprints) and an ε-overestimate is acceptable.

Spark-first design: the sketch IS a tiny DataFrame ``(depth, bucket,
cnt)`` produced by one map-side-combinable groupBy — no driver
accumulator, no custom UDAF, mergeable across corpora by a further
groupBy-sum (the classic CM merge = counter-wise add). Hashing is the
same portable md5-prefix primitive as ``sampling._hash_long`` so the
whole construction has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "token_stream",
    "heavy_hitters",
    "cm_sketch",
    "cm_estimate",
    "bloom_build",
    "bloom_probe",
]


def token_stream(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per token occurrence (lowercased, ``\\s+`` split —
    identical semantics to ``operators.text.tokens``)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return df.select(F.explode(toks).alias("token")).filter(F.col("token") != "")


def heavy_hitters(df: DataFrame, text_col: str = "text", k: int = 50) -> DataFrame:
    """Exact global top-k tokens with deterministic tie-break.

    Three-phase: groupBy(token) (shuffle bounded by vocabulary,
    map-side partial aggregation does the heavy lifting), then a
    bucket-local rank prunes each of 256 hash-buckets to its own top-k
    (parallel windows — any global top-k member is top-k within its
    bucket, so nothing true is dropped), and only the ≤ 256·k
    survivors pass through the final single-partition row_number. The
    serial step is O(buckets·k) regardless of vocabulary size.
    """
    counts = token_stream(df, text_col).groupBy("token").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wb = Window.partitionBy("__b").orderBy(F.desc("cnt"), F.asc("token"))
    pruned = (
        counts.withColumn("__b", F.pmod(F.hash("token"), F.lit(256)))
        .withColumn("__r", F.row_number().over(wb))
        .filter(F.col("__r") <= k)
        .drop("__b", "__r")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _bucket(token: Column, row: int, width: int) -> Column:
    """Row-``row``'s CM bucket for a token: md5-prefix hash mod width."""
    digest = F.md5(F.concat(F.lit(f"{row}:"), token))
    h = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def cm_sketch(
    occ: DataFrame, token_col: str = "token", depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a Count-Min sketch ``(depth, bucket, cnt)`` from a token-
    occurrence stream.

    The explode to ``depth`` rows happens *before* the hash aggregate,
    so partial (map-side) combine collapses each partition to at most
    ``depth × width`` rows before the one tiny shuffle. State is
    O(depth × width) — independent of corpus size.
    """
    rows = F.array(*[
        F.struct(
            F.lit(d).cast("long").alias("depth"),
            _bucket(F.col(token_col), d, width).alias("bucket"),
        )
        for d in range(depth)
    ])
    return (
        occ.select(F.explode(rows).alias("r"))
        .select("r.depth", "r.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each probe token: min over rows of
    the counter at that row's bucket (the CM estimate — an
    overestimate with classical ε·N / e^-depth guarantees).

    The sketch is tiny → broadcast join; probes stream through without
    a shuffle on their side.
    """
    keyed = probes.select(
        F.col(token_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).cast("long").alias("depth"),
                    _bucket(F.col(token_col), d, width).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("r"),
    ).select(token_col, "r.depth", "r.bucket")
    joined = keyed.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cm_est")
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter as a DataFrame of DISTINCT set bit positions
    ``(bit)`` — at most ``num_bits`` rows regardless of key count.

    Spark-first sketch shape (cf. ``cm_sketch``): no driver-side bitset,
    no UDAF — one explode to ``num_hashes`` rows per key and one
    map-side-combinable distinct. Mergeable: union two filters and
    re-distinct (classic Bloom OR). The md5-prefix hash keeps a DuckDB
    oracle twin possible. Use when a 100 TB membership pre-filter must
    ship to every executor: ``num_bits`` rows of one long broadcast in
    KBs where the key set itself would be TBs.
    """
    bits = F.array(*[
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}{j}:"), F.col(key_col).cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(num_bits),
        )
        for j in range(num_hashes)
    ])
    return (
        keys.select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Probe: ``maybe_member`` is true iff ALL ``num_hashes`` bit
    positions of the key are set (no false negatives; false-positive
    rate ≈ (1 − e^{−kn/m})^k). The filter is ≤ ``num_bits`` rows →
    broadcast inner-count join; the probe side never shuffles."""
    keyed = probes.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{salt}{j}:"), F.col(key_col).cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(num_bits),
                )
                for j in range(num_hashes)
            ])
        ).alias("bit"),
    )
    hits = keyed.join(F.broadcast(bloom), "bit", "inner")
    agg = hits.groupBy(key_col).agg(F.count("*").cast("long").alias("__hits"))
    return probes.select(key_col).distinct().join(agg, key_col, "left").select(
        key_col,
        (F.coalesce("__hits", F.lit(0)) == num_hashes).alias("maybe_member"),
    )
