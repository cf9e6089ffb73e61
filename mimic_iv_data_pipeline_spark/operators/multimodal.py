"""Multimodal column plumbing (scale extension; BASELINE.json north star).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The heavy codecs (PIL/ffmpeg
etc.) are NOT in this container, so the decode step is a clearly-marked
deterministic fake behind ``decode_fn`` — the Spark-side plumbing
(schema, batch shape, partition behavior) is real and tested, and a
production deployment swaps ``_fake_decode`` for a real codec without
touching the plan.

This mirrors the reference's one Python-heavy surface — the medspacy
notes pipeline (``preprocessing/notes_preproc.py:108-224``) — which has
the same shape: per-executor model init + Arrow-batched map.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    STUB: replace with a real codec (PIL/torchvision/ffmpeg) in
    production — raise if someone relies on it for real pixels.
    Derives stable pseudo-dimensions and an 8-dim byte-histogram
    feature from the payload so tests can assert exact values.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    hist = [0.0] * 8
    for b in payload:
        hist[b % 8] += 1.0
    total = float(n) or 1.0
    return {
        "byte_len": n,
        "width": width,
        "height": height,
        "feature": [h / total for h in hist],
    }


def decode_media(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] = _fake_decode,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract binary media via ``mapInPandas``.

    Arrow moves each partition to Python in columnar batches; the
    decode function runs per payload inside the batch loop (per-executor
    init of a real model would go before the ``for`` — once per
    partition, exactly the medspacy-pipeline pattern). Output rows map
    1:1 to inputs, so the stage is a narrow map — no shuffle, scales
    linearly with executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (real codecs: initialize the decoder/model HERE, once per task)
        for pdf in batches:
            decoded = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "byte_len": [d["byte_len"] for d in decoded],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text payloads as opaque
    binary media so the decode plumbing has a real fixture to run on."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def frame_sample(
    media: DataFrame,
    n_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits ``n_frames``
    (media_id, frame_idx, frame_payload) rows per input by slicing the
    payload deterministically — a UDTF-shaped 1→N expansion done with
    ``explode`` on the JVM side; a real implementation swaps the slice
    for codec frame extraction inside ``decode_media``-style mapInPandas.
    """
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    out = media.select("media_id", "payload", idx)
    # expr-level substring keeps BinaryType end to end (no string cast —
    # a real codec's bytes are not UTF-8)
    return out.select(
        "media_id",
        "frame_idx",
        F.expr(
            "substring(payload, cast(frame_idx * cast(length(payload) / {n} AS INT) + 1 AS INT), "
            "cast(length(payload) / {n} AS INT))".format(n=n_frames)
        ).alias("frame_payload"),
    )
