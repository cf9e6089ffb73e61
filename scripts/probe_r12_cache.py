"""VERDICT r11 item 5: quantify the bench's warm-cache caveat.

``reuse=True`` operators persist intermediates without unpersisting,
and Spark's CacheManager plan-matches — so the bench's UNTIMED warm-up
execution can populate caches the timed runs then read. This probe
measures that flattery: for each persist-using bench entry it reports

  warm  — the bench protocol verbatim (warm-up exec, then min-of-N
          timed reps; caches live across reps), and
  cold  — same, but ``spark.catalog.clearCache()`` before every timed
          rep (each rep rebuilds its own caches; the persists INSIDE a
          single query execution still work — only cross-rep reuse is
          removed).

The delta is the standing measurement caveat to document in PERF.md —
identical on both sides of every cross-round comparison (the protocol
has been fn().count() with warm-up since r1), so it biases absolute
numbers, never deltas.

Run:  python scripts/probe_r12_cache.py [--sf /root/testdata/sf0.1] [--runs 3]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

# Bench entries whose operators persist() under reuse=True:
# fuzzy (q92/q99/nocap), dedup shingles/LSH (q40, q88, q34? no — exact),
# retrieval tf/weights (q113), text pair relations (q108, q184-adjacent),
# similarity base (q42/q53), corpus plan (q65), dsir per_doc (q80).
QUERIES = [
    "q40_minhash_lsh",
    "q42_cosine_topk",
    "q53_ann_ivf",
    "q65_contamination",
    "q80_dsir_weights",
    "q88_dedup_clean",
    "q92_edit_distance_join",
    "q99_edit_distance_sparse",
    "q108_kneser_ney",
    "q113_bm25",
    "q190_naive_bayes",
]


def main() -> None:
    args = sys.argv[1:]

    def opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    runs = int(opt("--runs", "3"))

    spark = get_spark("probe_r12_cache")
    import bench  # noqa: E402
    from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

    queries = {**all_queries(), **bench.EXTRA}
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    def canary() -> float:
        q = spark.range(50_000_000).selectExpr("id % 9973 AS k")
        q.groupBy("k").count().count()
        t0 = time.perf_counter()
        q.groupBy("k").count().count()
        return round(time.perf_counter() - t0, 3)

    print(f"canary start: {canary()}")
    rows = []
    for name in QUERIES:
        fn = queries[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} warm-up")
        fn(spark, sf_dir).count()  # codegen warm-up (also populates caches)
        # warm protocol: caches persist across reps (bench behavior)
        warm = float("inf")
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} warm rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            warm = min(warm, time.perf_counter() - t0)
        # cold-cache protocol: clearCache before every timed rep
        cold = float("inf")
        for r in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} cold rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            cold = min(cold, time.perf_counter() - t0)
        rows.append((name, round(warm, 3), round(cold, 3)))
        print(f"{name:32s} warm {warm:6.3f}  cold {cold:6.3f}  "
              f"ratio {cold / warm:5.2f}")
    print(f"canary end: {canary()}")
    tw = sum(r[1] for r in rows)
    tc = sum(r[2] for r in rows)
    print(f"TOTAL warm {tw:.3f}  cold {tc:.3f}  ratio {tc / tw:.2f}")


if __name__ == "__main__":
    main()
