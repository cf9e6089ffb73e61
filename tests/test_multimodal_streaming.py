"""Tests for the multimodal mapInPandas plumbing and the Structured
Streaming twins (batch-equivalence of the tumbling-window aggregate)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    frame_sample,
)
from mimic_iv_data_pipeline_spark.sources.readers import read_events
from mimic_iv_data_pipeline_spark.streaming.events import (
    read_event_stream,
    stream_bucketize,
)


def test_decode_media_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = documents_as_media(docs)
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 50
    # byte_len equals the document char length (ascii corpus)
    lens = {r["media_id"]: r["byte_len"] for r in rows}
    for d in docs.collect():
        assert lens[d["doc_id"]] == len(d["text"])
    # features are unit-normalized byte histograms — deterministic
    for r in rows:
        assert r["media_type"] == "text/plain"
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80


def test_decode_media_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    a = decode_media(documents_as_media(docs)).collect()
    b = decode_media(documents_as_media(docs.repartition(4))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_frame_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    frames = frame_sample(documents_as_media(docs), n_frames=4)
    assert frames.count() == 20
    per_media = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n"))
    assert all(r["n"] == 4 for r in per_media.collect())


def test_stream_bucketize_matches_batch(spark, sf_smoke):
    """T3 streaming twin: availableNow over a file source produces the
    same buckets as the batch aggregate on the same data."""
    events = read_events(spark, sf_smoke)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events_src")
        events.write.parquet(src)

        stream = read_event_stream(spark, src)
        agg = stream_bucketize(stream, window_duration="1 hour", watermark="1 hour")
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_buckets")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r["bucket_start"], r["event_type"]): (r["n"], round(r["avg_value"], 6))
            for r in spark.sql("SELECT * FROM stream_buckets").collect()
        }
        expect = {
            (r["bucket_start"], r["event_type"]): (r["n"], round(r["avg_value"], 6))
            for r in events.groupBy(
                F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
            .collect()
        }
        # append mode emits only windows closed by the watermark; every
        # emitted window must match batch exactly, and most windows close
        # (the final watermark sits 1h behind max ts)
        assert len(got) >= len(expect) - 2
        for k, v in got.items():
            assert expect[k] == v, f"window {k}: stream {v} != batch {expect[k]}"


def test_stream_locf_carries_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: the last value per user must survive
    micro-batch boundaries — two sequential file drops, second batch's
    leading null fills from the FIRST batch's last value."""
    from pyspark.sql import types as T

    from mimic_iv_data_pipeline_spark.streaming.events import read_event_stream
    from mimic_iv_data_pipeline_spark.streaming.stateful import stream_locf

    src = tmp_path / "locf_src"
    ckpt = str(tmp_path / "locf_ckpt")
    src.mkdir()

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def write_batch(path, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)

    out_dir = str(tmp_path / "locf_out")

    def run_available():
        # file sink (memory sink cannot recover from a checkpoint, and
        # cross-batch state is exactly what this test exercises)
        stream = read_event_stream(spark, str(src) + "/*")
        q = (
            stream_locf(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    from datetime import datetime, timedelta

    ts0 = datetime(2024, 1, 1)
    # batch 1: user 1 sees 5.0 then a null (fills to 5.0)
    write_batch(str(src / "b1"), [
        (1, ts0, 1, "click", 5.0, "{}"),
        (2, ts0 + timedelta(minutes=1), 1, "error", None, "{}"),
    ])
    run_available()
    # batch 2: user 1's first event is null — must fill from batch 1's 5.0
    write_batch(str(src / "b2"), [
        (3, ts0 + timedelta(minutes=2), 1, "error", None, "{}"),
        (4, ts0 + timedelta(minutes=3), 1, "view", 7.0, "{}"),
    ])
    run_available()

    got = {
        r["event_id"]: r["value_filled"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[3] == 5.0, "state must carry the last value across micro-batches"
    assert got[4] == 7.0


def test_stream_sessionize(spark, sf_smoke, tmp_path):
    """session_window streaming: emitted sessions match the batch
    sessionizer's per-user session count on the same closed data."""
    from mimic_iv_data_pipeline_spark.operators.windows import sessionize
    from mimic_iv_data_pipeline_spark.streaming.events import (
        read_event_stream,
        stream_sessionize,
    )

    events = read_events(spark, sf_smoke)
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)

    stream = read_event_stream(spark, src)
    q = (
        stream_sessionize(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.sql("SELECT user_id, count(*) AS n FROM sess_out GROUP BY user_id")
        .collect()
    )
    got_counts = {r["user_id"]: r["n"] for r in got}

    batch = sessionize(events, "user_id", "ts", gap_seconds=1800, tie_break="event_id")
    expect = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id")
        .agg(F.max("session_id").alias("n"))
        .collect()
    }
    # append mode withholds sessions not yet closed by the watermark;
    # emitted counts can be at most the batch count, and most users'
    # sessions close (watermark trails max ts by 1h)
    assert got_counts, "stream emitted no sessions"
    for user, n in got_counts.items():
        assert n <= expect[user]
    closed_exactly = sum(1 for u, n in got_counts.items() if n == expect[u])
    assert closed_exactly >= len(expect) * 0.6


def _tiny_png(width: int, height: int, color_type: int = 2) -> bytes:
    """Build a real, spec-valid PNG in-test (stdlib only): signature +
    IHDR + one zlib IDAT of zero scanlines + IEND."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x00" * (width * bpp) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_header_decode_golden(spark):
    """Golden test on actual image bytes: the decode step is real for
    the image modality (round-2 upgrade from the r1 _fake_decode-only
    surface)."""
    from mimic_iv_data_pipeline_spark.operators.multimodal import (
        image_header_decode,
    )

    png = _tiny_png(13, 7, color_type=2)
    d = image_header_decode(png)
    assert (d["width"], d["height"], d["mode"]) == (13, 7, "RGB")
    assert d["byte_len"] == len(png)
    assert abs(sum(d["feature"]) - 1.0) < 1e-9

    rgba = image_header_decode(_tiny_png(640, 480, color_type=6))
    assert (rgba["width"], rgba["height"], rgba["mode"]) == (640, 480, "RGBA")

    gif = b"GIF89a" + (300).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    g = image_header_decode(gif)
    assert (g["width"], g["height"], g["mode"]) == (300, 200, "P")

    with pytest.raises(ValueError, match="unrecognized"):
        image_header_decode(b"not an image at all")


def test_decode_media_with_real_images(spark):
    """The mapInPandas plumbing carries the real decoder end to end:
    binary media column in, typed (width, height, mode) out."""
    from mimic_iv_data_pipeline_spark.operators.multimodal import (
        decode_media,
        image_header_decode,
    )

    rows = [
        (1, _tiny_png(32, 16, 2), "image/png", {"k": "a"}),
        (2, _tiny_png(8, 8, 0), "image/png", {"k": "b"}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, meta map<string,string>",
    )
    out = {r["media_id"]: r for r in decode_media(media, image_header_decode).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["mode"]) == (32, 16, "RGB")
    assert (out[2]["width"], out[2]["height"], out[2]["mode"]) == (8, 8, "L")


def test_stream_exact_dedup_matches_batch(spark, sf_smoke, tmp_path):
    """Streaming dedup (dropDuplicatesWithinWatermark) keeps exactly one
    row per key for data inside the watermark horizon — equal to batch
    dropDuplicates on the same input."""
    from mimic_iv_data_pipeline_spark.sources.readers import read_events
    from mimic_iv_data_pipeline_spark.streaming.events import (
        EVENT_STREAM_SCHEMA,
        read_event_stream,
        stream_exact_dedup,
    )

    src = str(tmp_path / "dedup_src")
    batch = (
        read_events(spark, sf_smoke)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", F.lit(None).cast("string"))
        # inject duplicates: every row twice
    )
    batch.unionAll(batch).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    deduped = stream_exact_dedup(stream, key_cols=["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_sink")
    assert got.count() == batch.count()  # one survivor per event_id
    assert got.select("event_id").distinct().count() == batch.count()


def _wav_bytes(rate=8000, freq=440.0, seconds=0.05, channels=1):
    import io
    import math
    import struct
    import wave

    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        samples = [
            int(16000 * math.sin(2 * math.pi * freq * i / rate))
            for i in range(n)
            for _ in range(channels)
        ]
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue(), n


def test_wav_decode_real_bytes(spark):
    import math

    from mimic_iv_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        wav_decode,
    )

    payload, n = _wav_bytes()
    d = wav_decode(payload)
    assert d["sample_rate"] == 8000 and d["channels"] == 1 and d["n_samples"] == n
    assert abs(d["duration_s"] - 0.05) < 1e-9
    # full-scale sine at 16000/32768 → rms ≈ amp/√2, peak ≈ amp
    amp = 16000 / 32768.0
    assert abs(d["feature"][0] - amp / math.sqrt(2)) < 0.01
    assert abs(d["feature"][1] - amp) < 0.01

    stereo, n2 = _wav_bytes(rate=16000, channels=2)
    media = spark.createDataFrame(
        [(1, payload, "audio/wav"), (2, stereo, "audio/wav")],
        ["media_id", "payload", "media_type"],
    )
    rows = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert rows[1]["n_samples"] == n and rows[2]["channels"] == 2
    assert rows[2]["sample_rate"] == 16000


def test_pil_decode_when_pillow_present(spark):
    """Activates automatically the day Pillow lands in the container:
    full pixel decode must agree with the stdlib header decode on
    dimensions/mode and produce normalized per-channel stats."""
    pytest.importorskip("PIL")
    from mimic_iv_data_pipeline_spark.operators.multimodal import (
        image_header_decode,
        pil_decode,
    )

    png = _tiny_png(13, 7, color_type=2)
    full = pil_decode(png)
    head = image_header_decode(png)
    assert (full["width"], full["height"], full["mode"]) == (
        head["width"], head["height"], head["mode"],
    )
    assert len(full["feature"]) == 3  # RGB → one stat per channel
    assert all(0.0 <= v <= 1.0 for v in full["feature"])
    assert full["feature"] == [0.0, 0.0, 0.0]  # zero-filled scanlines


def test_stream_cm_sketch_matches_batch(spark, sf_smoke, tmp_path):
    """The streaming CM sketch over a multi-file doc source equals the
    batch sketch on the same corpus — and its state is depth×width rows
    regardless of stream length (the no-watermark-needed property)."""
    from mimic_iv_data_pipeline_spark.operators.sketches import cm_sketch, token_stream
    from mimic_iv_data_pipeline_spark.streaming.events import (
        read_doc_stream,
        stream_cm_sketch,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    src = str(tmp_path / "docs_src")
    # two files → at least two micro-batches under maxFilesPerTrigger=1
    docs.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).format("parquet").load(src)
    assert read_doc_stream(spark, src).isStreaming  # reader shape check
    sketch = stream_cm_sketch(stream, depth=4, width=64)
    q = (
        sketch.writeStream.format("memory")
        .queryName("stream_cms")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["depth"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM stream_cms").collect()
    }
    expect = {
        (r["depth"], r["bucket"]): r["cnt"]
        for r in cm_sketch(token_stream(docs, "text"), depth=4, width=64).collect()
    }
    assert got == expect
    assert len(got) <= 4 * 64


def test_stream_corpus_filter_matches_batch(spark, sf_smoke, tmp_path):
    """The stateless ingest gate (quality + lang-ID + PII + hash split)
    emits exactly the batch pipeline's rows for the same input — the
    content-addressed split is what makes this hold across arbitrary
    micro-batch boundaries."""
    from mimic_iv_data_pipeline_spark.streaming.events import stream_corpus_filter

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    q = (
        stream_corpus_filter(stream)
        .writeStream.format("memory")
        .queryName("stream_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_gate"))
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.sql("SELECT * FROM stream_gate").collect())
    )
    expect = sorted(map(tuple, stream_corpus_filter(docs).collect()))
    assert got == expect and len(got) > 0
    # split column present and complete
    splits = {r[-1] for r in got}
    assert splits <= {"train", "valid", "test"}


def test_stream_chunk_documents_matches_batch(spark, sf_smoke, tmp_path):
    """Chunking is a stateless narrow explode — streamed chunks must
    equal the batch chunker's output for any micro-batch split."""
    from mimic_iv_data_pipeline_spark.operators.text import chunk_documents
    from mimic_iv_data_pipeline_spark.streaming.events import stream_chunk_documents

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    src = str(tmp_path / "chunk_src")
    docs.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    q = (
        stream_chunk_documents(stream, window=30, stride=20)
        .writeStream.format("memory")
        .queryName("stream_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_chunks"))
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.sql("SELECT * FROM stream_chunks").collect()))
    expect = sorted(
        map(tuple, chunk_documents(docs, "doc_id", "text", 30, 20).collect())
    )
    assert got == expect and len(got) > 0


def test_stream_enrich_dimension_matches_batch_and_refreshes(spark, sf_smoke, tmp_path):
    """Stream-static enrichment equals the batch join on the same input,
    keeps unmatched facts on how='left', and — because Spark re-plans
    the static side per micro-batch — picks up a dimension refresh
    between two availableNow passes without restarting anything."""
    from mimic_iv_data_pipeline_spark.operators.history import as_of, scd2_history
    from mimic_iv_data_pipeline_spark.sources.readers import read_events
    from mimic_iv_data_pipeline_spark.streaming.events import (
        read_event_stream,
        stream_enrich_dimension,
    )

    src = str(tmp_path / "enrich_src")
    batch = read_events(spark, sf_smoke).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).withColumn("props", F.lit(None).cast("string"))
    batch.write.mode("overwrite").parquet(src)

    # dimension = current slice of a user-attribute SCD-2 history
    dim_path = str(tmp_path / "dim")
    users = batch.select("user_id").distinct()
    log = users.select(
        "user_id", F.lit("basic").alias("tier"), F.lit(1).cast("long").alias("v")
    ).unionByName(
        users.filter(F.col("user_id") % 2 == 0).select(
            "user_id", F.lit("pro").alias("tier"), F.lit(2).cast("long").alias("v")
        )
    )
    hist = scd2_history(log, ["user_id"], "v")
    hist.filter(F.col("is_current")).select("user_id", "tier").write.mode(
        "overwrite"
    ).parquet(dim_path)

    dim = spark.read.parquet(dim_path)
    stream = read_event_stream(spark, src)
    enriched = stream_enrich_dimension(stream, dim, ["user_id"])
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enrich_sink").select("event_id", "tier")
    want = batch.join(dim, ["user_id"], "left").select("event_id", "tier")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    tiers = {r.tier for r in got.collect()}
    assert "pro" in tiers and "basic" in tiers

    # refresh the dimension snapshot (everyone upgraded), re-run the
    # stream over NEW files only: the static side re-reads per batch
    users.select("user_id", F.lit("pro").alias("tier")).write.mode(
        "overwrite"
    ).parquet(dim_path)
    batch.limit(50).write.mode("append").parquet(src)
    q2 = (
        stream_enrich_dimension(read_event_stream(spark, src), spark.read.parquet(dim_path), ["user_id"])
        .writeStream.format("memory")
        .queryName("enrich_sink2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert {r.tier for r in spark.table("enrich_sink2").select("tier").distinct().collect()} == {"pro"}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stream_enrich_dimension(stream, dim, ["user_id"], how="full")


def test_stream_stream_interval_join_matches_batch(spark, sf_smoke, tmp_path):
    """Clicks joined to purchases of the same user within [0, 1h] after
    the click — streaming result equals the batch interval join on the
    same fully-arrived input."""
    from mimic_iv_data_pipeline_spark.sources.readers import read_events
    from mimic_iv_data_pipeline_spark.streaming.events import (
        read_event_stream,
        stream_stream_interval_join,
    )

    src = str(tmp_path / "ssj_src")
    base = read_events(spark, sf_smoke).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).withColumn("props", F.lit(None).cast("string"))
    base.write.mode("overwrite").parquet(src)

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("ts_r"),
            F.col("event_id").alias("purchase_id"),
        )
        return clicks, buys

    s = read_event_stream(spark, src)
    sc, sb = split(s)
    joined = stream_stream_interval_join(sc, sb, "user_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ssj_sink").select("click_id", "purchase_id")

    bc, bb = split(base)
    want = bc.join(
        bb,
        (bc["user_id"] == bb["user_id"])
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 3600 SECONDS")),
    ).select("click_id", "purchase_id")
    assert got.count() > 0
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        # overlapping column names must be pre-renamed
        stream_stream_interval_join(sc, sc, "user_id")


def test_stream_incremental_rollup_matches_batch_recompute(spark, sf_smoke, tmp_path):
    """Two availableNow passes over a growing source maintain a state
    snapshot equal to a from-scratch rollup over all arrived rows."""
    from mimic_iv_data_pipeline_spark.operators.aggregates import rollup_state
    from mimic_iv_data_pipeline_spark.sources.readers import read_events
    from mimic_iv_data_pipeline_spark.streaming.events import read_event_stream
    from mimic_iv_data_pipeline_spark.streaming.rollup import (
        latest_rollup_snapshot,
        stream_incremental_rollup,
    )

    src = str(tmp_path / "roll_src")
    state = str(tmp_path / "roll_state")
    ckpt = str(tmp_path / "roll_ckpt")
    base = read_events(spark, sf_smoke).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).withColumn("props", F.lit(None).cast("string"))

    first = base.filter(F.col("event_id") % 2 == 0)
    second = base.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src)

    def run_pass():
        q = stream_incremental_rollup(
            read_event_stream(spark, src),
            ["event_type"], ["value"], state, ckpt,
        )
        q.awaitTermination(180)

    def state_rows():
        snap = latest_rollup_snapshot(spark, state)
        return sorted(
            (r.event_type, r.n, r.cnt_value, round(r.sum_value, 6),
             r.min_value, r.max_value)
            for r in snap.collect()
        )

    def batch_rows(df):
        return sorted(
            (r.event_type, r.n, r.cnt_value, round(r.sum_value, 6),
             r.min_value, r.max_value)
            for r in rollup_state(df, ["event_type"], ["value"]).collect()
        )

    run_pass()
    assert state_rows() == batch_rows(first)

    second.write.mode("append").parquet(src)
    run_pass()  # same checkpoint: only the NEW files form the delta
    assert state_rows() == batch_rows(base)


def test_stream_funnel_matches_batch_and_chains_across_batches(spark, tmp_path):
    """Streaming funnel state machine == batch funnel_conversion on the
    union of the micro-batches (per-user event-time-ordered drops),
    including the cross-batch chain where the signup arrives one batch
    before the purchase, and the pre-signup-view user who must NOT
    convert."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mimic_iv_data_pipeline_spark.operators.windows import funnel_conversion
    from mimic_iv_data_pipeline_spark.streaming.events import read_event_stream
    from mimic_iv_data_pipeline_spark.streaming.stateful import stream_funnel

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    t0 = datetime(2024, 1, 1)

    def m(i):
        return t0 + timedelta(minutes=i)

    # u1 completes across batches; u2's only view precedes signup (never
    # converts past signup); u3 completes inside batch 1; u4 views twice
    # (before AND after signup) — the later view must qualify.
    batch1 = [
        (1, m(0), 1, "signup", None, "{}"),
        (2, m(1), 1, "view", None, "{}"),
        (3, m(0), 2, "view", None, "{}"),
        (4, m(2), 2, "signup", None, "{}"),
        (5, m(0), 3, "signup", None, "{}"),
        (6, m(1), 3, "view", None, "{}"),
        (7, m(2), 3, "buy", None, "{}"),
        (8, m(0), 4, "view", None, "{}"),
        (9, m(1), 4, "signup", None, "{}"),
    ]
    batch2 = [
        (10, m(10), 1, "buy", None, "{}"),
        (11, m(10), 2, "buy", None, "{}"),  # no view yet -> must not count
        (12, m(10), 4, "view", None, "{}"),
        (13, m(11), 4, "buy", None, "{}"),
    ]

    src = tmp_path / "funnel_src"
    src.mkdir()
    ckpt = str(tmp_path / "funnel_ckpt")
    out_dir = str(tmp_path / "funnel_out")
    stages = ["signup", "view", "buy"]

    def run_available():
        stream = read_event_stream(spark, str(src) + "/*")
        q = (
            stream_funnel(stream, stages)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1")
    )
    run_available()

    # process-death simulation between passes (r6 verdict item 8): a
    # sink data file written by a task that died before its batch
    # committed to _spark_metadata must be invisible to readers —
    # exactly-once output across the restart, like stream_ewma's test.
    import glob as _glob
    import shutil as _shutil

    committed = sorted(_glob.glob(out_dir + "/part-*.parquet"))
    assert committed, "pass 1 wrote no sink files"
    n_committed = spark.read.parquet(out_dir).count()
    _shutil.copyfile(committed[0], out_dir + "/part-99999-dead-task.parquet")
    assert spark.read.parquet(out_dir).count() == n_committed

    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b2")
    )
    run_available()  # fresh query object == restore-from-checkpoint

    final = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("stage_reached").alias("stage"))
        .collect()
    )
    got = {r["user_id"]: r["stage"] for r in final}
    # u1: signup+view batch1, buy batch2 -> 3. u2: pre-signup view only
    # -> 1 (signup), the batch-2 buy can't skip the unreached view.
    # u3: all three in batch 1. u4: later view qualifies, then buy -> 3.
    assert got == {1: 3, 2: 1, 3: 3, 4: 3}

    # Batch equivalence: per-stage user counts from the streaming final
    # states == funnel_conversion over the union of both batches.
    union = spark.createDataFrame(batch1 + batch2, schema).select(
        "user_id", F.col("ts").cast("double").alias("ts"), "event_type"
    )
    batch_counts = {
        r["stage_idx"]: r["users"]
        for r in funnel_conversion(union, stages).collect()
    }
    stream_counts = {
        i: sum(1 for s in got.values() if s >= i) for i in (1, 2, 3)
    }
    assert stream_counts == batch_counts


def test_stream_ewma_matches_batch_across_batches(spark, tmp_path):
    """Streaming EWMA == batch ewma on the union of the micro-batches,
    BITWISE (same IEEE op sequence), including recursion chains that
    cross the batch boundary via the single-double state."""
    from datetime import datetime, timedelta

    from mimic_iv_data_pipeline_spark.operators.windows import ewma
    from mimic_iv_data_pipeline_spark.streaming.events import read_event_stream
    from mimic_iv_data_pipeline_spark.streaming.stateful import stream_ewma

    base = datetime(2024, 1, 1)
    rows = [
        (eid, eid % 5, base + timedelta(minutes=eid), float((eid * 37) % 101 - 50))
        for eid in range(200)
    ]
    schema = "event_id long, user_id long, ts timestamp, value double"
    full = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "ewma_src")
    sink = str(tmp_path / "ewma_sink")
    ckpt = str(tmp_path / "ewma_ckpt")
    # batch 1 = first half of event time, batch 2 = the rest (per-user
    # event-time-ordered arrival, the operator's stated contract)
    full.filter(F.col("event_id") < 100).write.mode("overwrite").parquet(src)

    def run_pass():
        q = (
            stream_ewma(read_event_stream(spark, src), alpha=0.25)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_pass()
    full.filter(F.col("event_id") >= 100).write.mode("append").parquet(src)
    run_pass()

    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["e"]
        for r in ewma(full, "user_id", "ts", "value", 0.25,
                      tie_break="event_id", out_col="e").collect()
    }
    assert got == want  # bitwise, including cross-batch chains


def test_stream_ewma_restart_exactly_once_and_null_state(spark, tmp_path):
    """Process-death coverage for stream_ewma (r6 verdict item 8), the
    stateful-op analogue of the rollup _SUCCESS guard:

    1. each pass is a FRESH query object restored from the checkpoint
       (what a restarted process does) — the (prev, seen) state must
       survive the restore, including a NULL-poisoned prev;
    2. between passes a crash is simulated the way the file sink
       experiences one: an orphan data file in the sink directory that
       never made it into the _spark_metadata commit log (written by a
       task that died before its batch committed). Exactly-once means
       readers NEVER see it — no duplicate rows after the restart;
    3. a key whose value goes NULL in batch 1 must stay NULL for all
       its later events in batch 2 (the seen-flag fix: NaN no longer
       doubles as the 'no prior state' sentinel, so the recursion must
       NOT silently restart at the batch boundary).
    """
    import glob
    import os
    import shutil
    from datetime import datetime, timedelta

    from mimic_iv_data_pipeline_spark.operators.windows import ewma
    from mimic_iv_data_pipeline_spark.streaming.events import read_event_stream
    from mimic_iv_data_pipeline_spark.streaming.stateful import stream_ewma

    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(120):
        value = float((eid * 37) % 101 - 50)
        if eid % 3 == 1 and eid == 40:  # user 1: one NULL mid-batch-1
            value = None
        rows.append((eid, eid % 3, base + timedelta(minutes=eid), value))
    schema = "event_id long, user_id long, ts timestamp, value double"
    full = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "ewma_r_src")
    sink = str(tmp_path / "ewma_r_sink")
    ckpt = str(tmp_path / "ewma_r_ckpt")
    full.filter(F.col("event_id") < 60).write.mode("overwrite").parquet(src)

    def run_pass():
        q = (
            stream_ewma(read_event_stream(spark, src), alpha=0.25)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_pass()

    # crash simulation: a data file outside the sink's commit log
    committed = sorted(glob.glob(os.path.join(sink, "part-*.parquet")))
    assert committed, "pass 1 wrote no sink files"
    orphan = os.path.join(sink, "part-99999-dead-task-orphan.parquet")
    shutil.copyfile(committed[0], orphan)

    full.filter(F.col("event_id") >= 60).write.mode("append").parquet(src)
    run_pass()  # fresh query object == restore-from-checkpoint

    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["e"]
        for r in ewma(full, "user_id", "ts", "value", 0.25,
                      tie_break="event_id", out_col="e").collect()
    }
    # exactly-once: the orphan contributed nothing (no dupes, counts
    # equal), and every value matches batch bitwise
    assert len(got) == len(want) == 120
    assert got == want
    # the NULL poisoning crossed the restart: every user-1 event from
    # the NULL onward is NULL, in batch 1 AND batch 2
    poisoned = [e for (u, e) in got if u == 1 and e >= 40]
    assert poisoned and all(got[(1, e)] is None for e in poisoned)
    # and pre-NULL user-1 values are real doubles
    assert all(got[(1, e)] is not None for (u, e) in got if u == 1 and e < 40)


def test_stream_holt_matches_batch_across_batches(spark, tmp_path):
    """Streaming Holt == batch holt_linear on the union of the
    micro-batches, BITWISE, including level/trend chains crossing the
    batch boundary and a NULL value whose poisoning must survive the
    checkpoint restore (seen-flag discipline, as stream_ewma)."""
    from datetime import datetime, timedelta

    from mimic_iv_data_pipeline_spark.operators.windows import holt_linear
    from mimic_iv_data_pipeline_spark.streaming.events import read_event_stream
    from mimic_iv_data_pipeline_spark.streaming.stateful import stream_holt

    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(160):
        value = float((eid * 53) % 97 - 48)
        if eid == 33:  # user 33%4==1: NULL mid-batch-1
            value = None
        rows.append((eid, eid % 4, base + timedelta(minutes=eid), value))
    schema = "event_id long, user_id long, ts timestamp, value double"
    full = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "holt_src")
    sink = str(tmp_path / "holt_sink")
    ckpt = str(tmp_path / "holt_ckpt")
    full.filter(F.col("event_id") < 80).write.mode("overwrite").parquet(src)

    def run_pass():
        q = (
            stream_holt(read_event_stream(spark, src), alpha=0.5, beta=0.25)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_pass()
    full.filter(F.col("event_id") >= 80).write.mode("append").parquet(src)
    run_pass()  # fresh query == restore-from-checkpoint

    got = {
        (r["user_id"], r["event_id"]): (r["level"], r["trend"], r["forecast"])
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["user_id"], r["event_id"]): (r["level"], r["trend"], r["forecast"])
        for r in holt_linear(full, "user_id", "ts", "value", 0.5, 0.25,
                             tie_break="event_id").collect()
    }
    assert len(got) == len(want) == 160
    assert got == want  # bitwise, including NULL-poisoned cells
    # the NULL at eid=33 poisons user 1 for the rest of the stream,
    # across the batch boundary
    later = [e for (u, e) in got if u == 1 and e > 33]
    assert later and all(got[(1, e)][0] is None for e in later)


def test_byte_hist_matches_loop():
    """The vectorized 8-bin byte histogram (optimization r11) is
    bit-identical to the original per-byte Python loop — counts are
    exact int64s, one float division per bin, same order."""
    import random

    from mimic_iv_data_pipeline_spark.operators.multimodal import _byte_hist8

    def loop_hist(payload: bytes) -> list[float]:
        hist = [0.0] * 8
        for b in payload:
            hist[b % 8] += 1.0
        total = float(len(payload)) or 1.0
        return [h / total for h in hist]

    rng = random.Random(11)
    cases = [
        b"",
        b"\x00",
        b"\xff" * 7,
        bytes(range(256)) * 3,
        bytes(rng.randrange(256) for _ in range(10_001)),
    ]
    for payload in cases:
        assert _byte_hist8(payload) == loop_hist(payload)


def test_decode_media_prunes_input_columns(spark, sf_dir):
    """decode_media/decode_audio project their inputs before the Arrow
    boundary (guide §4.2) — extra caller columns (meta maps, join
    leftovers) must neither break the map nor cross it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = documents_as_media(docs).withColumn("extra", F.lit("x"))
    out = decode_media(media)
    # the plan's Python boundary sees only the three consumed columns
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "meta" not in plan.split("MapInPandas")[0] or "meta#" not in plan
    rows = out.collect()
    assert len(rows) == 20
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-9 for r in rows)
