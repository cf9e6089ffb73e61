"""Round-11 streaming TTL soak (r10 verdict item 7).

``stream_lsh_dedup(state_ttl_minutes=...)`` is equivalence-tested for
a TTL longer than the run (tests/test_upsert_orc.py); this soak runs
the EVICTION path under sustained load — a few hundred micro-batches
(maxFilesPerTrigger=1, 100 ms processing-time trigger, plus the
no-data ticks Spark fires for stateful queries) — and asserts:

  1. STATE PLATEAUS: numRowsTotal grows during phase A (180 unique
     docs, one per micro-batch), then DROPS after an idle window
     longer than the 1-minute TTL (idle buckets evicted by the
     ProcessingTimeTimeout branch).
  2. NO POST-EVICTION FALSE MERGES: phase B replays near-duplicates of
     phase-A docs AFTER the idle window — their buckets are gone, so
     they must emit ZERO (doc, dup_of) pairs and silently re-register
     as originals (the documented horizon trade-off).
  3. WITHIN-HORIZON DEDUP STILL FIRES: phase C sends near-duplicates
     of the phase-B docs immediately (well inside the TTL) — every one
     must emit a pair pointing at its phase-B original.

Run:  python scripts/soak_r11_stream_ttl.py          (~4 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

TTL_MIN = 1
N_A, N_B = 180, 30


def doc_text(seed: int) -> str:
    # 12 words, every word UNIQUE to this seed — cross-doc shingle
    # overlap is exactly zero, so the only pairs the stream can emit
    # are the deliberately planted replays (same text + suffix word)
    return " ".join(f"w{seed}p{i}" for i in range(12))


def write_batch(spark, src: str, i: int, doc_id: int, text: str) -> None:
    spark.createDataFrame([(doc_id, text)], "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(src, f"b{i:05d}"))


def state_rows(q) -> int:
    p = q.lastProgress
    if not p or not p.get("stateOperators"):
        return -1
    return p["stateOperators"][0]["numRowsTotal"]


def wait_caught_up(q, src: str, timeout_s: int = 300) -> None:
    """Wait for three consecutive EMPTY progress reports (source
    exhausted — one could be a mid-feed gap; three spanning distinct
    batchIds cannot, since maxFilesPerTrigger=1 drains one file per
    non-empty batch)."""
    t0 = time.time()
    empty_ids: list[int] = []
    while time.time() - t0 < timeout_s:
        p = q.lastProgress
        if p is not None:
            if p["numInputRows"] == 0:
                if p["batchId"] not in empty_ids:
                    empty_ids.append(p["batchId"])
                if len(empty_ids) >= 3:
                    return
            else:
                empty_ids = []
        time.sleep(1)
    raise TimeoutError("stream did not catch up")


def main() -> None:
    from mimic_iv_data_pipeline_spark.streaming.stateful import stream_lsh_dedup

    spark = get_spark("soak_ttl")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    tmp = tempfile.mkdtemp(prefix="soak_ttl_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    out_dir = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    write_batch(spark, src, 0, 0, doc_text(0))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_lsh_dedup(stream, threshold=0.5, state_ttl_minutes=TTL_MIN)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        # ---- phase A: one unique doc per micro-batch --------------------
        t0 = time.time()
        for i in range(1, N_A):
            write_batch(spark, src, i, i, doc_text(i))
            if i % 20 == 0:
                print(f"A: fed {i} batches, state_rows={state_rows(q)}", flush=True)
        wait_caught_up(q, src)
        rows_after_a = state_rows(q)
        print(f"A: done ({time.time() - t0:.0f} s), state_rows={rows_after_a}",
              flush=True)
        assert rows_after_a > 0

        # ---- idle window: > TTL, no data — eviction ticks ---------------
        print(f"idle: sleeping {TTL_MIN * 60 + 45} s (> {TTL_MIN} min TTL)",
              flush=True)
        time.sleep(TTL_MIN * 60 + 45)
        rows_after_idle = state_rows(q)
        print(f"idle: state_rows {rows_after_a} -> {rows_after_idle}", flush=True)

        # ---- phase B: near-dups of EVICTED phase-A docs -----------------
        for j in range(N_B):
            write_batch(
                spark, src, N_A + j, 10_000 + j, doc_text(j) + " extra"
            )
        wait_caught_up(q, src)
        pairs_after_b = spark.read.parquet(out_dir).count() if os.path.exists(out_dir) else 0
        print(f"B: pairs so far = {pairs_after_b} (expect 0 — originals evicted)",
              flush=True)

        # ---- phase C: near-dups of phase-B docs, inside the TTL ---------
        for j in range(N_B):
            write_batch(
                spark, src, N_A + N_B + j, 20_000 + j,
                doc_text(j) + " extra more"
            )
        wait_caught_up(q, src)
        final = spark.read.parquet(out_dir)
        pairs = {(r["doc_id"], r["dup_of"]) for r in final.collect()}
        n_batches = q.lastProgress["batchId"]
        print(f"C: total distinct pairs = {len(pairs)}; batches run = {n_batches}",
              flush=True)

        ok = True
        if rows_after_idle >= rows_after_a:
            print(f"FAIL: state did not shrink after idle window "
                  f"({rows_after_a} -> {rows_after_idle})", flush=True)
            ok = False
        if pairs_after_b != 0:
            print(f"FAIL: {pairs_after_b} post-eviction false merges", flush=True)
            ok = False
        c_expected = {(20_000 + j, 10_000 + j) for j in range(N_B)}
        missing = c_expected - pairs
        extra = pairs - c_expected
        if missing or extra:
            print(f"FAIL: phase-C pairs missing={sorted(missing)[:5]} "
                  f"extra={sorted(extra)[:5]}", flush=True)
            ok = False
        print("SOAK " + ("PASS" if ok else "FAIL")
              + f": state {rows_after_a}->{rows_after_idle} after idle, "
              f"0 false merges, {len(pairs & c_expected)}/{N_B} in-horizon pairs, "
              f"{n_batches} micro-batches", flush=True)
        sys.exit(0 if ok else 1)
    finally:
        q.stop()
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
