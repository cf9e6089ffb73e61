"""Structured Streaming twins of the batch temporal operators.

The reference is pure batch (SURVEY.md §2.9: no watermarks, no late
data) — its "streaming" is hand-rolled 10M-row chunk folding. These are
the real streaming counterparts for the ``events`` surface: the same
tumbling-bucket aggregation (T3) and sessionization as incremental
queries with watermark-bounded state, so the engine's temporal
semantics carry over to a live feed unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-based streaming source over an events directory. Explicit
    schema (streaming readers cannot infer), one file per trigger by
    default is left to the caller's options."""
    return spark.readStream.schema(EVENT_STREAM_SCHEMA).format(fmt).load(path)


def stream_bucketize(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """T3's streaming twin: tumbling event-time window aggregation with
    a watermark bounding late data (and state size — state for windows
    older than the watermark is dropped, which is what makes this run
    forever at 100 TB/day).

    Batch equivalence: for fully-arrived data this produces exactly
    ``bucketize_events(df, floor(t/1h))`` — asserted in
    tests/test_streaming.py by running the same input through both.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("avg_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "avg_value",
            "max_value",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (the streaming twin of
    operators.windows.sessionize): ``session_window`` merges events
    closer than ``gap`` into one growing window per user.

    Boundary semantics differ from the batch operator BY Spark's
    design and are documented rather than hidden: ``session_window``
    merges only when the inter-event diff is STRICTLY below ``gap``
    (two events exactly ``gap`` apart start separate sessions), while
    the batch ``sessionize`` breaks only when the diff EXCEEDS the gap
    (and compares second-truncated timestamps). Streams whose
    inter-event gaps never land exactly on the boundary sessionize
    identically; the equivalence test asserts the containment
    direction (streamed sessions are never coarser than batch).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_exact_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact dedup's streaming twin: first occurrence per key wins,
    duplicates arriving within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    EVICTS it once the watermark passes — bounded state, so a forever-
    running feed can dedup at 100 TB/day where a plain
    ``dropDuplicates`` on a stream would accumulate state without
    bound. Semantics vs batch: within any window shorter than the
    watermark the kept set equals batch ``dropDuplicates(key_cols)``
    (asserted in tests); duplicates farther apart than the watermark
    re-emit — the documented horizon trade-off every streaming dedup
    makes.
    """
    keys = key_cols or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


# the ONE documents schema — streaming readers cannot infer, so a
# drifted copy here would silently read new/renamed batch columns as
# NULL; import the batch definition instead of duplicating it
from mimic_iv_data_pipeline_spark.sources.readers import DOCUMENTS_SCHEMA

DOC_STREAM_SCHEMA = DOCUMENTS_SCHEMA


def read_doc_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-based streaming source over a documents directory (the
    live-ingest shape of the LLM-ops corpus surface)."""
    return spark.readStream.schema(DOC_STREAM_SCHEMA).format(fmt).load(path)


def stream_cm_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming twin of ``sketches.cm_sketch`` — and deliberately the
    SAME operator: explode-to-(depth,bucket) + incremental count is a
    standard streaming aggregation, and unlike most unbounded
    aggregations it needs no watermark because the construction itself
    bounds state at ``depth × width`` counters no matter how much
    stream passes through. Run in ``update``/``complete`` output mode;
    after any prefix of the stream the sketch equals the batch sketch
    over the same rows (asserted by the batch-equivalence test).

    This is the 100 TB/day ingest shape: corpus token frequencies kept
    live in O(1) state, probed at any moment with ``cm_estimate``.
    """
    from mimic_iv_data_pipeline_spark.operators.sketches import cm_sketch, token_stream

    # pre_aggregate=False: chained aggregations are unsupported in
    # streaming; the occurrence path is a single incremental aggregate
    return cm_sketch(
        token_stream(docs, text_col), depth=depth, width=width, pre_aggregate=False
    )


def stream_corpus_filter(
    docs: DataFrame,
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    split_fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Live-ingest corpus preprocessing: the stateless quality gate an
    LLM pipeline runs on documents AS THEY ARRIVE — quality metrics,
    language ID, PII scrub, and a deterministic hash split, composed
    into one narrow projection chain.

    Every step is a per-row Column expression (no aggregation, no
    state, no watermark), so this runs forever at any ingest rate and
    the output stream can fan straight into a partitioned
    ``writeStream`` (partition by split/source) for downstream batch
    mixing. Content-addressed splitting (``sampling.hash_split``) is
    what makes the assignment reproducible between the stream and any
    batch re-run — a seeded ``F.rand`` would give each micro-batch its
    own lineage-dependent stream of draws.

    Batch equivalence is exact and total: for any prefix of the stream
    the emitted rows equal the batch pipeline over the same rows
    (asserted in tests/test_multimodal_streaming.py).
    """
    from mimic_iv_data_pipeline_spark.operators.privacy import with_pii_scrub
    from mimic_iv_data_pipeline_spark.operators.sampling import hash_split
    from mimic_iv_data_pipeline_spark.operators.text import (
        predict_language,
        with_quality_metrics,
    )

    out = with_quality_metrics(docs, "text")
    out = predict_language(out, "text")
    # REPLACE text with the scrubbed form, exactly like the batch plan
    # (plans/llm_corpus.py step 3) — emitting `redacted` as a side
    # column while `text` keeps the raw PII would persist unscrubbed
    # PII through the writeStream sink
    out = with_pii_scrub(out, "text").withColumn("text", F.col("redacted")).drop(
        "redacted"
    )
    out = hash_split(
        out, "doc_id", split_fractions or {"train": 0.9, "valid": 0.05, "test": 0.05}
    )
    return out.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
    )


def stream_chunk_documents(
    docs: DataFrame,
    window: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Streaming twin of ``operators.text.chunk_documents``: the same
    coverage-guaranteed sliding-window explode, applied to documents as
    they arrive. Chunking is per-row (narrow explode — no aggregation,
    no state, no watermark), so batch equivalence is exact for any
    micro-batch partitioning of the stream, and the output can feed the
    ``writeStream`` sink or the packing stage directly."""
    from mimic_iv_data_pipeline_spark.operators.text import chunk_documents

    return chunk_documents(docs, "doc_id", "text", window=window, stride=stride)


def stream_enrich_dimension(
    events: DataFrame,
    dimension: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment: join a streaming fact feed
    against a (small) batch dimension — the serving-time counterpart of
    the batch PIT join (``operators/history.py:pit_join``). The natural
    dimension here is an SCD-2 history's CURRENT slice
    (``history.as_of`` / ``is_current``), so the stream always sees the
    latest attributes.

    Semantics Spark guarantees for stream-static joins: the static side
    is re-evaluated **per micro-batch**, so a dimension that reads from
    a table/path picks up snapshot refreshes without restarting the
    query; no state is kept for the static side (stateless join —
    unlike stream-stream joins there is no watermark bookkeeping).
    ``how`` may be 'inner' or 'left' (left keeps facts with no current
    dimension row — Spark disallows right/full outer against a static
    right side precisely because unmatched static rows could never be
    emitted correctly).

    Scale shape: wrap the dimension in the broadcast it almost always
    deserves (dimension tables are the small side by construction);
    every micro-batch is then a map-side hash join with zero shuffle of
    the stream. ``broadcast=False`` opts out for dimensions too large
    to ship whole (a FORCED broadcast overrides
    autoBroadcastJoinThreshold and would OOM every micro-batch) — the
    join then plans as a shuffled hash/SMJ per batch.
    """
    if how not in ("inner", "left"):
        raise ValueError("stream-static join supports how='inner' or 'left'")
    dim = F.broadcast(dimension) if broadcast else dimension
    return events.join(dim, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts_r",
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    match right rows of the same key whose time falls in
    ``[left_time + lower, left_time + upper]`` — clicks joined to the
    purchases they led to within the hour, labs joined to meds that
    follow, etc. The batch twin is ``asof_join``'s interval mode
    (operators/joins.py:34) without the tie-break (ALL matches emit,
    not just the nearest — a join, not an imputation).

    Why the shape matters: a stream-stream join must BUFFER both sides
    (either stream can arrive late), and unbounded buffering is the
    classic streaming OOM. Spark bounds the state with exactly the two
    things this function requires: a watermark on BOTH streams (rows
    older than the watermark are evicted) and a time-range join
    condition (tells the engine how long a buffered row can still
    match — here right state can be dropped ``upper`` past the
    watermark). Without both, append-mode inner join state grows
    forever; with them, state ≈ rate × (watermark + interval) per key —
    flat at 100 TB/day.

    The right stream's columns must be pre-renamed (no overlap with the
    left apart from ``on``) — streaming plans cannot be
    suffix-rewritten after the fact the way the batch asof_join does,
    because watermarks attach to specific column identities.
    """
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"rename right-side columns before joining (overlap: {sorted(overlap)})"
        )
    l_ = left.withWatermark(left_time, watermark)
    r_ = right.withWatermark(right_time, watermark)
    cond = (
        (l_[on] == r_[on])
        & (F.col(right_time) >= F.col(left_time) + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (F.col(right_time) <= F.col(left_time) + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return l_.join(r_, cond, "inner").drop(r_[on])
