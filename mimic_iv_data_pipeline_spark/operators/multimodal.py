"""Multimodal column plumbing (scale extension; BASELINE.json north star).

Images/audio/video ride as opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The image modality is REAL:
:func:`image_header_decode` parses PNG/GIF/JPEG container headers
(stdlib-only) for width/height/mode, golden-tested on actual PNG bytes;
:func:`pil_decode` adds full pixel decode when Pillow is installed
(import-gated — not in this container). The audio modality is REAL for
WAV/RIFF: :func:`wav_decode` parses the container and computes PCM
features with stdlib ``wave`` + numpy (rms/peak/mean/zero-crossing),
tested on genuine generated WAV bytes. Video keeps the deterministic
``_fake_decode`` stand-in behind ``decode_fn`` — the Spark-side
plumbing (schema, batch shape, partition behavior) is real and a
production deployment swaps in ffmpeg without touching the plan.

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


def _pickle_module_by_value() -> None:
    """Serialize THIS module's functions by value into executor
    closures (``decode_fn`` defaults are module-level parsers): the
    correctness driver — and any user submitting from a directory
    where the package isn't importable — runs workers that cannot
    ``import mimic_iv_data_pipeline_spark``. Registration is
    idempotent and scoped to this module only."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])

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
        T.StructField("mode", T.StringType()),
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
    return {
        "byte_len": n,
        "width": width,
        "height": height,
        "feature": _byte_hist8(payload),
    }


def _byte_hist8(payload: bytes) -> list[float]:
    """Unit-normalized 8-bin byte histogram — the per-payload feature
    kernel shared by the decode stand-ins.

    Vectorized (optimization r11, guide §4.2): the previous
    ``for b in payload`` Python loop was the per-row hot path of the
    decode stage — one interpreted iteration PER BYTE of media.
    ``np.bincount(arr & 7)`` counts in C; the counts are exact int64s
    and the one float division per bin is unchanged, so the output is
    bit-identical to the loop (pinned by
    tests/test_multimodal_streaming.py::test_byte_hist_matches_loop).
    """
    import numpy as np

    n = len(payload)
    if n == 0:
        return [0.0] * 8
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8) & 7, minlength=8)
    return (counts / float(n)).tolist()


def image_header_decode(payload: bytes) -> dict:
    """REAL image decode for the metadata surface: parse PNG / GIF /
    JPEG container headers (pure stdlib — no PIL needed) for
    width/height/mode, plus the byte-histogram feature.

    PNG: IHDR chunk at fixed offset 16 (big-endian u32 pair), mode from
    the color-type byte. GIF: logical screen descriptor at offset 6
    (little-endian u16 pair). JPEG: scan markers for the first SOF0-15
    frame header (big-endian height, width at +5). Anything else raises
    ValueError — a caller who needs pixels (resize, embeddings) plugs
    PIL via :func:`pil_decode`.
    """
    import struct

    n = len(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and n >= 26:
        width, height = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        mode = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}.get(
            color_type, f"png_ct{color_type}"
        )
    elif payload[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        width, height = struct.unpack("<HH", payload[6:10])
        mode = "P"
    elif payload[:2] == b"\xff\xd8":  # JPEG SOI
        width = height = None
        mode = "RGB"
        i = 2
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
                mode = "L" if payload[i + 9] == 1 else "RGB"
                break
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        if width is None:
            raise ValueError("JPEG without SOF frame header")
    else:
        raise ValueError("unrecognized image container (want PNG/GIF/JPEG)")
    return {
        "byte_len": n,
        "width": int(width),
        "height": int(height),
        "mode": mode,
        "feature": _byte_hist8(payload),
    }


def pil_decode(payload: bytes) -> dict:
    """Full pixel decode via PIL when it is installed (import-gated:
    this container does not ship it). Returns the same dict shape as
    :func:`image_header_decode` but with pixel-derived stats in
    ``feature`` (mean channel intensities, normalized)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise ImportError(
            "pil_decode needs Pillow; use image_header_decode for "
            "dimensions/mode without pixel access"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload))
    stats = [
        sum(ch.getdata()) / (255.0 * img.width * img.height) for ch in img.split()
    ]
    return {
        "byte_len": len(payload),
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
        "feature": stats,
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

    Only the three consumed columns cross the Arrow boundary
    (optimization r11, guide §4.2): ``mapInPandas`` is a black box to
    Catalyst — it cannot prune the input projection itself — so an
    unprojected call serialized the ``meta`` map (and any extra caller
    columns) to Python and back for every row, pure boundary waste.
    """

    _pickle_module_by_value()
    media = media.select("media_id", "media_type", "payload")

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
                    "mode": [d.get("mode") for d in decoded],
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


AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def wav_decode(payload: bytes) -> dict:
    """REAL audio decode for WAV/RIFF payloads — stdlib only (``wave`` +
    numpy over the raw PCM): sample rate, channel count, exact sample
    count, duration, and a 4-dim PCM feature [rms, peak, mean, zero-
    crossing rate] normalized to [-1, 1] full scale. 8/16/32-bit PCM
    widths supported; compressed codecs (mp3 etc.) need ffmpeg and
    should go through a swapped ``decode_fn`` — same plumbing.
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, channels = w.getframerate(), w.getnchannels()
        n, width = w.getnframes(), w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width: {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        x = x - 128.0  # 8-bit WAV is unsigned
    x /= float(2 ** (8 * width - 1))
    zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
    feature = [
        float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
        float(np.max(np.abs(x))) if len(x) else 0.0,
        float(np.mean(x)) if len(x) else 0.0,
        zcr,
    ]
    return {
        "byte_len": len(payload),
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n,
        "duration_s": n / float(rate),
        "feature": feature,
    }


def decode_audio(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] = wav_decode,
) -> DataFrame:
    """Audio twin of :func:`decode_media`: Arrow-batched narrow map,
    1 row in → 1 row out, no shuffle — linear in executors. Swap
    ``decode_fn`` for an ffmpeg-backed callable for compressed codecs.

    Only ``media_id`` + ``payload`` cross the Arrow boundary (same
    guide-§4.2 projection as :func:`decode_media` — the function
    consumes nothing else and Catalyst cannot prune into the map).
    """

    _pickle_module_by_value()  # default decode_fn is module-level (as
    # in decode_media): workers must not need the package importable
    media = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "byte_len": [d["byte_len"] for d in decoded],
                    "sample_rate": [d["sample_rate"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "n_samples": [d["n_samples"] for d in decoded],
                    "duration_s": [d["duration_s"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=AUDIO_DECODED_SCHEMA)
