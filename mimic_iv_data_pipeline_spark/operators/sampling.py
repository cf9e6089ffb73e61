"""Deterministic sampling / splitting / packing operators for
training-data pipelines.

The reference splits train/test by shuffling an id list on the driver
(``model/ml_models.py:71``, ``model/dl_train.py:122``,
``model/tokenization.py:130-140``) — fine for 300k patients, unusable
at 100 TB (and irreproducible across runs unless the seed and the id
*order* are both pinned). These operators replace driver-side shuffles
with *content-addressed* decisions: every row's fate is a pure function
of its key, so the split is reproducible on any cluster, at any
partitioning, with no driver state and no shuffle at all (the hash is a
narrow per-row projection).

Portability contract (the reason for md5 instead of ``xxhash64``):
``hash_unit`` below is expressible verbatim in any ANSI engine —
DuckDB: ``cast(concat('0x', substr(md5(concat(salt, ':', cast(k as
varchar))), 1, 8)) as bigint) / 4294967296.0`` — so every operator in
this module carries a DuckDB oracle in the driver battery. At 100 TB
the md5-per-row cost is dwarfed by the scan; swap ``_hash_long`` for
``F.xxhash64`` only if profiling ever shows otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_unit",
    "hash_split",
    "stratified_sample",
    "pack_sequences",
    "source_mixture_rates",
]

_HASH_SPAN = 4294967296.0  # 2^32: span of the 8-hex-digit prefix


def _hash_long(key: Column, salt: str) -> Column:
    """First 32 bits of md5(salt ':' key) as an unsigned long."""
    digest = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def hash_unit(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) value derived deterministically from ``key``.

    The split/sample primitive: stable under repartitioning, executor
    count, and row order — unlike ``F.rand`` whose output depends on
    partition layout.
    """
    return _hash_long(key, salt) / F.lit(_HASH_SPAN)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashed key.

    ``fractions`` maps split name → mass (must sum to ~1.0). Rows with
    equal keys always land in the same split (leak-proof grouping:
    pass subject_id, not row id, to keep a patient's visits together —
    the reference's random id shuffle gives the same guarantee only
    because it splits *ids*, then joins back).

    Narrow op: no shuffle, no driver state. At 100 TB this is the only
    split strategy that doesn't need a global sort or collected id set.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u = hash_unit(F.col(key_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance languages
    or sources in a training corpus).

    Keeps a row iff ``hash_unit(key) < rate(stratum)``. Unlike
    ``df.sampleBy`` (seeded Bernoulli over partition order) the result
    is bit-stable across any cluster layout, so a corpus re-sample on
    1000 executors equals the local[32] one. Narrow op — no shuffle.
    """
    rate = None
    for name, r in rates.items():
        cond = F.col(strata_col) == F.lit(name)
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(F.lit(default_rate))
    return df.filter(hash_unit(F.col(key_col), salt) < rate)


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    out_col: str = "window_id",
    split_oversized: bool = False,
) -> DataFrame:
    """Assign documents to fixed-token-budget context windows
    (GPT-style concat-and-chunk packing, document boundaries kept).

    Within each shard, documents are laid out in ``order_col`` order
    and a document starts window ``floor(tokens_before / budget)`` —
    the window its first token falls into under plain concatenation.
    A window may exceed ``budget`` by at most one document's tail
    (standard greedy packing slack; exact bin packing is NP-hard and
    order-dependent anyway).

    Scale shape: the running sum is a window over (shard, order) — one
    shuffle on ``shard_col``, each shard packed independently, so 100
    TB packs as long as no single shard is huge (shard by file/source,
    never a constant). This is deliberately NOT a global
    ``Window.orderBy`` — that would serialize on one task.

    ``split_oversized=True`` switches to real concat-and-chunk
    semantics: a document spanning a window boundary is split, emitting
    one row per covered window with ``chunk_index`` (0-based within the
    doc) and ``chunk_tokens`` (its token share in that window) — so
    every window holds EXACTLY ``budget`` tokens except each shard's
    last. The explode is a narrow op after the same single shuffle
    (``F.sequence`` over first..last covered window; a doc emits
    ``ceil(tokens/budget) + 1`` rows at most).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    if not split_oversized:
        return df.withColumn(out_col, F.floor(before / F.lit(budget)).cast("long"))

    tokens = F.col(tokens_col).cast("long")
    b = F.col("__before")
    first_w = F.floor(b / F.lit(budget)).cast("long")
    last_w = F.floor((b + tokens - F.lit(1)) / F.lit(budget)).cast("long")
    # materialize the running sum BEFORE the explode: a generator and a
    # window function cannot share one projection
    exploded = df.withColumn("__before", before).withColumn(
        out_col,
        # empty docs (tokens=0) still land in their start window
        F.explode(F.sequence(first_w, F.greatest(first_w, last_w))),
    )
    wid = F.col(out_col)
    lo = F.greatest(wid * budget, b)
    hi = F.least((wid + 1) * budget, b + tokens)
    return exploded.select(
        *[c for c in df.columns],
        wid.alias(out_col),
        (wid - F.floor(b / F.lit(budget)).cast("long")).cast("long").alias("chunk_index"),
        F.greatest(hi - lo, F.lit(0)).cast("long").alias("chunk_tokens"),
    )


def source_mixture_rates(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Per-source sampling rates hitting a target mixture exactly
    (the Pile/Dolma "data mixing" step): given target shares ``p_s``
    and per-source token masses ``t_s``, the largest achievable corpus
    is ``C = min_s(t_s / p_s)`` (the scarcest source binds); each
    source then keeps ``rate_s = p_s · C / t_s`` of its tokens.

    Returns ``(stratum, tokens, target_share, rate, expected_tokens)``
    for the targeted strata. Two tiny aggregates: one groupBy(stratum)
    bounded by source count, one scalar min over it, joined back via
    broadcast — no driver collect, so the rate table composes straight
    into :func:`stratified_sample`-style filters on the full corpus.
    """
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1.0, got {total}")
    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()],
        schema="stratum string, target_share double",
    )
    masses = (
        df.select(F.col(strata_col).alias("stratum"), F.col(weight_col))
        .groupBy("stratum")
        .agg(F.sum(weight_col).cast("long").alias("tokens"))
        .join(F.broadcast(shares), "stratum")  # drops untargeted strata
    )
    cap = masses.agg(
        F.min(F.col("tokens") / F.col("target_share")).alias("__cap")
    )
    from mimic_iv_data_pipeline_spark.functions.rounding import dround

    raw_rate = F.least(
        F.lit(1.0), F.col("target_share") * F.col("__cap") / F.col("tokens")
    )
    return masses.crossJoin(F.broadcast(cap)).select(
        "stratum",
        "tokens",
        "target_share",
        dround(raw_rate, 6).alias("rate"),
        F.floor(raw_rate * F.col("tokens") + F.lit(0.5))
        .cast("long")
        .alias("expected_tokens"),
    )
