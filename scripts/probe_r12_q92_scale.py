"""VERDICT r11 item 7: scale-validate the q92 cap's hot-bucket
anti-join on an adversarial corpus where the complement is NON-empty.

Fixture: ~1.5M sf1-class rows of 12-char md5 prefixes (sparse — near
zero true pairs, the q99 shape) PLUS a planted pile of H identical
strings (every variant bucket of that string has size ≥ H). With
``max_bucket < H`` the complement holds exactly the pile's L+1 variant
hashes, so the r11 anti-join shape actually exercises a non-empty
broadcast complement — which the sf0.1 A/B (empty complement, 1.00×)
could not price.

Three timed variants, noop-sinked (guide §1.4), min-of-N:

  capped-anti  — the committed operator (NOT IN hot, broadcast anti).
  capped-ok    — the r10 shape reconstructed HERE, measurement-only:
                 inner-join the variant relation against the OK-bucket
                 list (n <= cap). At this scale the OK list is ~20M
                 distinct hashes (~160 MB estimated > the 64 MB
                 autoBroadcast) — the §3.1 regime where it stops
                 broadcasting and forces two extra exchanges on __v.
  uncapped     — max_bucket=None: pays the quadratic hot bucket
                 (13 × H² candidate pairs); bounds what the cap saves.

Also checks containment: capped pairs ⊆ uncapped pairs, and the only
missing pairs touch the planted pile (the documented recall trade).

Run:  python scripts/probe_r12_q92_scale.py [--n 1500000] [--hot 4000]
          [--cap 2000] [--runs 2] [--skip-uncapped]
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

    n = int(opt("--n", "1500000"))
    hot = int(opt("--hot", "4000"))
    cap = int(opt("--cap", "2000"))
    runs = int(opt("--runs", "2"))
    skip_uncapped = "--skip-uncapped" in args

    from pyspark.sql import functions as F

    from mimic_iv_data_pipeline_spark.operators.fuzzy import (
        deletion_variants,
        edit_distance_join,
    )

    spark = get_spark("probe_r12_q92_scale")
    sc = spark.sparkContext

    # corpus: n sparse strings; the LAST `hot` ids all carry ONE string
    base = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") >= n - hot, F.lit("cafebabe0000")
        ).otherwise(
            F.substring(F.md5(F.concat(F.lit("sc:"), F.col("id").cast("string"))), 1, 12)
        ).alias("name"),
    )
    base.write.mode("overwrite").parquet("/tmp/q92_scale_corpus")
    df = spark.read.parquet("/tmp/q92_scale_corpus")

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    def timed(tag, fn):
        fn()  # codegen warm-up
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:14s} min-of-{runs}: {best:7.3f} s")
        return best

    # --- capped, committed anti-join shape
    sc.setJobDescription("capped-anti")
    timed("capped-anti", lambda: noop(
        edit_distance_join(df, "id", "name", max_dist=1, max_bucket=cap)))

    # --- capped, r10 OK-list shape (reconstructed, measurement-only)
    def ok_shape():
        sides = df.select(
            F.col("id").alias("__id"),
            F.col("name").alias("__s"),
            F.explode(deletion_variants(F.col("name"), 1)).alias("__vs"),
        ).select(F.xxhash64("__vs").alias("__v"), "__id", "__s").persist()
        ok = (
            sides.groupBy("__v").agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= cap).select("__v")
        )
        kept = sides.join(ok, "__v")
        a = kept.select("__v", F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
        b = kept.select("__v", F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
        out = (
            a.join(b, "__v")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("dist", F.levenshtein("__sa", "__sb"))
            .filter(F.col("dist") <= 1)
            .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
            .distinct()
        )
        noop(out)
        sides.unpersist()

    sc.setJobDescription("capped-ok-list")
    timed("capped-ok", ok_shape)

    # --- uncapped (quadratic hot bucket)
    if not skip_uncapped:
        sc.setJobDescription("uncapped")
        timed("uncapped", lambda: noop(
            edit_distance_join(df, "id", "name", max_dist=1, max_bucket=None)))

    # --- semantics: capped ⊆ uncapped; missing pairs touch the pile only
    sc.setJobDescription("containment check")
    capd = edit_distance_join(df, "id", "name", max_dist=1, max_bucket=cap)
    unc = edit_distance_join(df, "id", "name", max_dist=1, max_bucket=None)
    extra_in_capped = capd.join(unc, ["id_a", "id_b", "dist"], "left_anti").count()
    missing = unc.join(capd, ["id_a", "id_b", "dist"], "left_anti")
    miss_total = missing.count()
    miss_nonpile = missing.filter(
        (F.col("id_a") < n - hot) & (F.col("id_b") < n - hot)
    ).count()
    print(f"capped-not-in-uncapped (must be 0): {extra_in_capped}")
    print(f"missing pairs: {miss_total} (non-pile, must be 0: {miss_nonpile})")
    print(f"capped rows: {capd.count()}  uncapped rows: {unc.count()}")


if __name__ == "__main__":
    main()
