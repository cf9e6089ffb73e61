"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's imputation (ffill per series,
``data_generation_icu.py:404-412``) only exists as a batch op. Its
streaming twin needs true keyed state: the last observed value per key
must survive across micro-batches. That is exactly
``applyInPandasWithState`` — Arrow-batched grouped map with a
GroupState handle — the Spark-native form of a custom stateful
operator (SURVEY.md §2.9 "streaming ops: none in reference").
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
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
