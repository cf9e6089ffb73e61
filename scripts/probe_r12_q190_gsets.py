"""VERDICT r11 item 4 / r11 ledger "not yet": profile the q190
grouping-sets idea in the ONE regime where it could win — reuse=False
(cold cache), where the doc-length aggregate re-tokenizes the corpus.

The idea: fold nd = tok.groupBy(id).count() into the wc aggregate via
GROUPING SETS ((token, class), (id)) so the corpus is scanned once.
The r11 risk note: the Expand duplicates every token row ×2 BEFORE the
partial aggregates — trading one (possibly cached) corpus pass for a
doubled pre-aggregation input. This probe prices both sides at sf0.1:

  a. nd alone over a FRESH (unpersisted) token relation — the pass the
     fold would save;
  b. wc alone over the same fresh relation — the baseline aggregate;
  c. the combined GROUPING SETS aggregate — what the fold would cost.

Decision rule: the fold wins the cold regime iff c < a + b by more
than noise; it wins the warm regime iff c < b + (cached-scan nd),
which r11 already argued it cannot.

Run:  python scripts/probe_r12_q190_gsets.py [--sf /root/testdata/sf0.1] [--runs 3]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


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

    from pyspark.sql import functions as F

    from mimic_iv_data_pipeline_spark.operators.text import tokens

    spark = get_spark("probe_r12_q190_gsets")
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # q190's label derivation (deterministic pseudo-label, same as the
    # registry query's shape: a hash-bucketed class id)
    tok = docs.select(
        F.col("doc_id"),
        F.pmod(F.xxhash64("doc_id"), F.lit(5)).alias("__y"),
        F.explode(tokens(F.col("text"))).alias("__t"),
    )

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    def timed(tag, fn):
        fn()
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:28s} min-of-{runs}: {best:6.3f} s")
        return best

    nd = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    wc = tok.groupBy("__t", "__y").agg(F.count(F.lit(1)).alias("__cnt"))
    # grouping-sets twin: ONE corpus pass computing both granularities
    # (Expand duplicates every token row x2 before the partial aggs)
    combined = tok.groupingSets(
        [["__t", "__y"], ["doc_id"]], "__t", "__y", "doc_id"
    ).agg(F.count(F.lit(1)).alias("__cnt"))

    spark.sparkContext.setJobDescription("a: nd alone (fresh tok)")
    a = timed("a: nd (doc lengths)", lambda: noop(nd))
    spark.sparkContext.setJobDescription("b: wc alone (fresh tok)")
    b = timed("b: wc (count matrix)", lambda: noop(wc))
    spark.sparkContext.setJobDescription("c: grouping-sets combined")
    c = timed("c: GROUPING SETS both", lambda: noop(combined))
    print(f"\ncold-regime verdict: c ({c:.3f}) vs a+b ({a + b:.3f}) -> "
          f"{'WIN' if c < (a + b) * 0.9 else 'NO WIN (<10% or loss)'}")


if __name__ == "__main__":
    main()
