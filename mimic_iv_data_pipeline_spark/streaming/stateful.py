"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's imputation (ffill per series,
``data_generation_icu.py:404-412``) only exists as a batch op. Its
streaming twin needs true keyed state: the last observed value per key
must survive across micro-batches. That is exactly
``applyInPandasWithState`` — Arrow-batched grouped map with a
GroupState handle — the Spark-native form of a custom stateful
operator (SURVEY.md §2.9 "streaming ops: none in reference").

``stream_lsh_dedup`` extends the same pattern to NEAR-duplicate
detection on a live corpus feed: per-band-bucket state holds the
MinHash signatures seen so far, so a document arriving months into the
stream still matches near-duplicates from the first micro-batch —
the streaming twin of ``operators/incremental.dedup_against_index``
with the index living in the state store instead of parquet.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOCF_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, value_filled double"
)
LOCF_STATE_SCHEMA = "last_value double"


def _locf_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key LOCF: nulls take the last non-null value seen, across
    micro-batch boundaries via the state handle.

    ``applyInPandasWithState`` gives NO ordering guarantee across the
    Arrow chunks of one group within a micro-batch, so sorting each
    chunk independently fills later-chunk rows with earlier timestamps
    out of order. Concatenate every chunk for the group first, sort
    ONCE by (ts, event_id), fill, and yield a single frame. Memory is
    one group's micro-batch slice — the same bound Spark already
    accepts to hand the group to Python.
    """
    (last,) = state.get if state.exists else (None,)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        filled = []
        for v in pdf["value"]:
            if pd.notna(v):
                last = float(v)
            filled.append(last)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].values,
                "event_id": pdf["event_id"].values,
                "ts": pdf["ts"].values,
                "value": pdf["value"].values,
                "value_filled": filled,
            }
        )
    if last is not None:
        state.update((last,))


def stream_locf(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Streaming last-observation-carried-forward per user.

    Input: a streaming events frame with nullable ``value``. Output:
    append-mode rows with ``value_filled``. State per user is ONE
    double — bounded regardless of stream length (no watermark needed
    for correctness; add state TTL via timeouts if the key space is
    unbounded).
    """
    src = events.selectExpr(
        "user_id",
        "event_id",
        "ts",
        f"{value_col} AS value",
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _locf_fn,
        outputStructType=LOCF_OUTPUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LSH_OUTPUT_SCHEMA = "doc_id long, dup_of long, est_jaccard double"
# signatures stored flattened with a fixed num_hashes stride (nested
# array-of-array state columns are not portable across state codecs)
LSH_STATE_SCHEMA = "ids array<bigint>, flat array<bigint>"

_M61 = (1 << 61) - 1
_M32 = 1 << 32


def _py_sig_factory(n: int, perms: list[tuple[int, int]]):
    """Python MinHash signature twin for the streaming path.

    The JVM path (``operators/dedup.minhash_signatures``) hashes
    shingles with ``xxhash64``, which has no Python counterpart in this
    container, so the streaming operator uses blake2b-folded shingle
    hashes through the SAME universal-hash family. Signatures are
    self-consistent across batches and across the batch/stream twins of
    THIS operator (the equivalence test runs this very function in
    batch mode); they do not join against JVM-built indexes — use
    ``dedup_against_index`` for that.
    Nested closure → pickled by value (see bpe._make_word_encoder).
    """
    from hashlib import blake2b

    ws = re.compile(r"\s+", re.ASCII)

    def signature(text: str) -> list[int]:
        toks = [w for w in ws.split((text or "").strip().lower()) if w]
        upper = max(len(toks) - n, 0)
        grams = {" ".join(toks[i : i + n]) for i in range(upper + 1)}
        xs = [
            int.from_bytes(blake2b(g.encode(), digest_size=8).digest(), "big")
            % _M32
            for g in grams
        ]
        if not xs:
            xs = [0]
        return [min((a * x + b) % _M61 for x in xs) for a, b in perms]

    return signature


def stream_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate detection.

    Stage 1 (stateless, Arrow-batched): signature each arriving doc and
    explode to its ``bands`` (band, bucket) keys. Stage 2 (stateful,
    keyed by band bucket): compare the signature against every
    signature previously seen in that bucket — across ALL prior
    micro-batches via the state handle — and emit ``(doc_id, dup_of,
    est_jaccard)`` for estimated Jaccard ≥ ``threshold``; then append
    the signature to the bucket state. Within a micro-batch, docs
    compare against lower-ids first (deterministic given batch
    boundaries). A pair sharing several bands emits once per shared
    band — distinct downstream.

    State is O(docs landing in the bucket) × ``num_hashes`` longs —
    the in-state-store form of the parquet MinHash index
    (`operators/incremental.py`); the LSH property that buckets stay
    small is exactly what bounds each GROUP's state. For an unbounded
    multi-year feed, pass ``state_ttl_minutes``: buckets idle longer
    than the TTL are EVICTED (processing-time timeout) and duplicates
    of documents older than the horizon re-emit as originals — the
    same horizon trade-off ``stream_exact_dedup`` documents for its
    watermark; re-sharding the band keyspace is the alternative.
    """
    from mimic_iv_data_pipeline_spark.operators.dedup import _minhash_perms

    # same validation as the batch path (operators/dedup.py r7 fix):
    # bands > num_hashes makes rows_per_band 0 → every band hashes the
    # EMPTY slice → one global bucket per band → unbounded state and
    # O(n²) comparisons; non-divisible bands silently drop the tail
    # hashes from every bucket key
    if bands <= 0 or bands > num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"stream_lsh_dedup: bands must divide num_hashes with "
            f"rows_per_band >= 1 (got num_hashes={num_hashes}, bands={bands})"
        )
    rows_per_band = num_hashes // bands
    sig_fn = _py_sig_factory(n, _minhash_perms(num_hashes))
    n_bands = bands

    def band_explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hashlib import blake2b

        for pdf in batches:
            if pdf.empty:
                continue
            ids, bnd, bkt, sigs = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sig = sig_fn(text)
                for b in range(n_bands):
                    chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    digest = blake2b(
                        b"\x00".join(str(v).encode() for v in chunk),
                        digest_size=8,
                    ).digest()
                    ids.append(doc_id)
                    bnd.append(b)
                    bkt.append(int.from_bytes(digest, "big") % (1 << 62))
                    sigs.append(sig)
            yield pd.DataFrame(
                {"doc_id": ids, "band": bnd, "bucket": bkt, "sig": sigs}
            )

    banded = docs.select(id_col, text_col).mapInPandas(
        band_explode, schema="doc_id long, band int, bucket long, sig array<bigint>"
    )
    H = num_hashes

    ttl_ms = None if state_ttl_minutes is None else state_ttl_minutes * 60_000

    def dedup_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past the TTL: drop the bucket's signature memory
            state.remove()
            return
        (seen_ids, flat) = state.get if state.exists else ([], [])
        seen_ids = list(seen_ids)
        flat = list(flat)
        chunks = [pdf for pdf in batches if len(pdf)]
        out_doc, out_dup, out_est = [], [], []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                # plain Python ints: the state store pickles via Pyrolite,
                # which rejects numpy scalar types
                sig = [int(v) for v in sig]
                for i, prior in enumerate(seen_ids):
                    prev = flat[i * H : (i + 1) * H]
                    est = sum(1 for a, b in zip(sig, prev) if a == b) / H
                    if est >= threshold:
                        out_doc.append(int(doc_id))
                        out_dup.append(int(prior))
                        out_est.append(round(est, 6))
                seen_ids.append(int(doc_id))
                flat.extend(sig)
        state.update((seen_ids, flat))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out_doc:
            yield pd.DataFrame(
                {"doc_id": out_doc, "dup_of": out_dup, "est_jaccard": out_est}
            )

    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        dedup_fn,
        outputStructType=LSH_OUTPUT_SCHEMA,
        stateStructType=LSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


RESERVOIR_OUTPUT_SCHEMA = "key long, weight double, es_key double"
RESERVOIR_STATE_SCHEMA = "keys array<bigint>, ws array<double>, es array<double>"


def stream_weighted_sample(
    rows: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "es",
    num_shards: int = 8,
) -> DataFrame:
    """Streaming twin of ``sampling.weighted_sample`` — a deterministic
    weighted reservoir (Efraimidis–Spirakis over content-addressed race
    keys, so the SAME rows win regardless of batching).

    Stage 1 (stateless): compute each row's race key
    ``e = −ln(u)/w`` with ``u`` the md5 unit of the row key — byte-for-
    byte the batch operator's formula — and a shard id. Stage 2
    (stateful per shard): keep the shard's current top-``k`` (state is
    exactly k (key, w, e) triples) and EMIT rows at the moment they
    enter it. Acceptance is monotone — a row outside the running top-k
    can never re-enter as more data arrives — so the emitted log is a
    superset of the final sample, and

        top-k by (es_key, key) over ALL emitted rows
          == batch ``weighted_sample`` over the same data

    (asserted exactly in tests). The per-shard k bounds state at
    ``num_shards × k`` rows total; reading the final sample is one
    bounded TakeOrdered over the emitted log.
    """
    from hashlib import md5 as _md5

    span = float(1 << 32)

    def race(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            if pdf.empty:
                continue
            keys, ws, es, shards = [], [], [], []
            for key, w in zip(pdf[key_col], pdf[weight_col]):
                # pandas delivers SQL NULL as NaN, not None — and NaN
                # passes both `is None` and `<= 0`, then poisons every
                # pool comparison; the batch twin excludes null weights.
                # NULL keys are excluded too (int(None)/int(NaN) would
                # raise mid-stream; the batch twin's md5 of a NULL key
                # is NULL and drops the row the same way).
                if key is None or key != key or w is None or w != w or w <= 0:
                    continue
                h = int(
                    _md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16
                )
                u = (h + 0.5) / span
                keys.append(int(key))
                ws.append(float(w))
                es.append(-math.log(u) / float(w))
                shards.append(h % num_shards)
            yield pd.DataFrame(
                {"key": keys, "weight": ws, "es_key": es, "shard": shards}
            )

    raced = rows.select(key_col, weight_col).mapInPandas(
        race, schema="key long, weight double, es_key double, shard int"
    )

    def reservoir(
        gkey: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (keys, ws, es) = state.get if state.exists else ([], [], [])
        pool = sorted(zip(es, keys, ws))  # (e, key, w) ascending
        out_k, out_w, out_e = [], [], []
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["es_key", "key"]
            )
            for key, w, e in zip(pdf["key"], pdf["weight"], pdf["es_key"]):
                entry = (float(e), int(key), float(w))
                if len(pool) < k:
                    pool.append(entry)
                    pool.sort()
                elif entry < pool[-1]:
                    pool[-1] = entry
                    pool.sort()
                else:
                    continue
                out_e.append(entry[0])
                out_k.append(entry[1])
                out_w.append(entry[2])
        state.update(
            ([p[1] for p in pool], [p[2] for p in pool], [p[0] for p in pool])
        )
        if out_k:
            yield pd.DataFrame(
                {"key": out_k, "weight": out_w, "es_key": out_e}
            )

    return raced.groupBy("shard").applyInPandasWithState(
        reservoir,
        outputStructType=RESERVOIR_OUTPUT_SCHEMA,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = "user_id long, stage_reached integer, reach_ts double"
FUNNEL_STATE_SCHEMA = "times array<double>"


def stream_funnel(
    events: DataFrame,
    stages: list[str],
) -> DataFrame:
    """Streaming twin of ``operators/windows.funnel_conversion``: a
    per-user funnel state machine over ``applyInPandasWithState``.

    State per user is the length-k array of earliest-qualifying stage
    times (the exact quantities the batch recurrence computes): an
    event of stage ``i`` advances the user iff stage ``i-1`` is
    reached and ``ts >= times[i-1]`` and stage ``i`` is still unset.
    Events are processed in (ts, event_id) order within each
    micro-batch group, so for a per-user event-time-ordered stream the
    final states match the batch funnel EXACTLY (asserted by the
    batch-equivalence test, including cross-batch chains where the
    signup arrives batches before the purchase). For out-of-order
    streams the state machine is a monotone approximation — a late
    earlier-stage event cannot retroactively lower an already-set
    stage time; bound lateness upstream with a watermark + sort, the
    same contract as ``stream_sessionize``.

    Output (update-per-appearance, append mode): the user's current
    ``(stage_reached, reach_ts)`` — stage_reached counts completed
    stages (0 = none), reach_ts is the furthest stage's qualifying
    time. Aggregate per-stage conversion = a batch groupBy over the
    latest row per user. State is k doubles per user — bounded; add a
    TTL timeout if the user space is unbounded.
    """
    if not stages or len(set(stages)) != len(stages):
        raise ValueError("stream_funnel: stages must be non-empty and distinct")
    k = len(stages)
    stage_idx = {s: i for i, s in enumerate(stages)}

    def funnel_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        def tsv(ts) -> float:
            # epoch seconds for TimestampType, passthrough for numerics
            return float(ts.timestamp()) if hasattr(ts, "timestamp") else float(ts)

        # unset stages are NaN (null-in-array round-trips are codec
        # territory; NaN is a plain double everywhere)
        (times,) = state.get if state.exists else ([math.nan] * k,)
        times = list(times)
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                i = stage_idx.get(et)
                if i is None or not math.isnan(times[i]):
                    continue
                t = tsv(ts)
                if i == 0:
                    times[0] = t
                elif not math.isnan(times[i - 1]) and t >= times[i - 1]:
                    times[i] = t
            reached = 0
            for t in times:
                if math.isnan(t):
                    break
                reached += 1
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "stage_reached": [reached],
                    "reach_ts": [times[reached - 1] if reached else math.nan],
                }
            )
        state.update((times,))

    src = events.selectExpr("user_id", "event_id", "ts", "event_type")
    return src.groupBy("user_id").applyInPandasWithState(
        funnel_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = "user_id long, event_id long, ewma double"
# 'seen' distinguishes "no prior state" from "state poisoned by a NULL
# value": the batch recursion propagates NULL/NaN forever once seen,
# so NaN cannot double as the uninitialized sentinel. NOTE: this is a
# STATE SCHEMA CHANGE vs the r6 single-field 'prev double' — a query
# restarting from a checkpoint written by the old schema fails Spark's
# state compatibility check; discard the checkpoint (and re-feed the
# stream) or run the old build to drain before upgrading.
EWMA_STATE_SCHEMA = "prev double, seen boolean"


def stream_ewma(
    events: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_break: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``operators/windows.ewma``: the per-key
    exponential smoothing recursion with its single-double state
    carried across micro-batches — the state is exactly the
    recursion's sufficient statistic (e_{t-1}), so streaming costs
    O(1) memory per key where the batch operator re-reads the series.

    Rows are processed in (ts, tie_break) order WITHIN each
    micro-batch group and the Python float op sequence matches the
    batch operator exactly (``a·x + (1−a)·e_prev`` on IEEE doubles),
    so for a per-key event-time-ordered stream the emitted values are
    BITWISE equal to a batch ewma over the union of the batches
    (asserted by the batch-equivalence test, including chains crossing
    batch boundaries). Out-of-order arrivals follow arrival order —
    bound lateness upstream with a watermark + sort, the same contract
    as ``stream_funnel``/``stream_sessionize``.

    Output (append mode): one row per input event with its smoothed
    value. State: (prev double, seen boolean) per key — ``seen`` is
    the explicit "recursion initialized" flag so a NULL/NaN value
    poisons the state forever (emitted as NULL), exactly like the
    batch operator, instead of silently restarting the recursion
    (NoTimeout; add a TTL when the key space is unbounded).
    """
    a = float(alpha)
    one_minus_a = 1.0 - a

    def ewma_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            s_prev, s_seen = state.get
            prev = float(s_prev) if s_prev is not None else math.nan
            seen = bool(s_seen)
        else:
            prev, seen = math.nan, False
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [ts_col, tie_break]
            )
            out = []
            for x in pdf[value_col].astype("float64"):
                xi = float(x)
                if not seen:
                    prev, seen = xi, True
                else:
                    prev = a * xi + one_minus_a * prev
                out.append(None if math.isnan(prev) else prev)
            yield pd.DataFrame(
                {
                    "user_id": pdf[key_col].astype("int64"),
                    "event_id": pdf[tie_break].astype("int64"),
                    "ewma": pd.array(out, dtype="Float64"),
                }
            )
        # a NaN prev (poisoned state) is stored as NULL and restored as
        # NaN above — the poisoning survives micro-batch boundaries.
        state.update((None if math.isnan(prev) else prev, seen))

    src = events.selectExpr(key_col, tie_break, ts_col, value_col)
    return src.groupBy(key_col).applyInPandasWithState(
        ewma_fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HOLT_OUTPUT_SCHEMA = (
    "user_id long, event_id long, level double, trend double, forecast double"
)
# same seen-flag discipline as EWMA_STATE_SCHEMA: NULL poisoning must
# survive micro-batch boundaries, so NaN cannot mark "uninitialized".
HOLT_STATE_SCHEMA = "level double, trend double, seen boolean"


def stream_holt(
    events: DataFrame,
    alpha: float,
    beta: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_break: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``operators/windows.holt_linear``: the per-key
    double-exponential (level + trend) recursion with its two-double
    state carried across micro-batches — O(1) memory per key, the
    trend-aware sibling of :func:`stream_ewma`.

    Same contracts as stream_ewma: rows processed in (ts, tie_break)
    order within each micro-batch group, the EXACT batch IEEE op
    sequence (l = α·x + (1−α)·(l+b); b = β·(l−l_prev) + (1−β)·b), so
    per-key event-time-ordered streams emit values BITWISE equal to
    the batch operator over the union of the batches; NULL values
    poison the state forever and are emitted as NULL (the seen flag
    keeps the recursion from silently restarting). State: (level,
    trend, seen) per key, NoTimeout — add a TTL for unbounded keys.
    """
    a = float(alpha)
    b = float(beta)
    one_minus_a, one_minus_b = 1.0 - a, 1.0 - b

    def holt_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            s_level, s_trend, s_seen = state.get
            level = float(s_level) if s_level is not None else math.nan
            trend = float(s_trend) if s_trend is not None else math.nan
            seen = bool(s_seen)
        else:
            level, trend, seen = math.nan, math.nan, False
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                [ts_col, tie_break]
            )
            levels, trends, fcs = [], [], []
            for x in pdf[value_col].astype("float64"):
                xi = float(x)
                if not seen:
                    level, trend, seen = xi, 0.0, True
                else:
                    nl = a * xi + one_minus_a * (level + trend)
                    trend = b * (nl - level) + one_minus_b * trend
                    level = nl
                fc = level + trend
                levels.append(None if math.isnan(level) else level)
                trends.append(None if math.isnan(trend) else trend)
                fcs.append(None if math.isnan(fc) else fc)
            yield pd.DataFrame(
                {
                    "user_id": pdf[key_col].astype("int64"),
                    "event_id": pdf[tie_break].astype("int64"),
                    "level": pd.array(levels, dtype="Float64"),
                    "trend": pd.array(trends, dtype="Float64"),
                    "forecast": pd.array(fcs, dtype="Float64"),
                }
            )
        state.update(
            (
                None if math.isnan(level) else level,
                None if math.isnan(trend) else trend,
                seen,
            )
        )

    src = events.selectExpr(key_col, tie_break, ts_col, value_col)
    return src.groupBy(key_col).applyInPandasWithState(
        holt_fn,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
