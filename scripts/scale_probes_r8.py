"""Round-8 probes.

1. connected_components ABOVE the driver cap, before/after the r8
   partition-local contraction pre-pass: the same 3M-node / 6M-edge
   random graph as PERF r7b (star path took 50.6 s there, union-find
   25.8 s) plus a dense-blob graph (the near-dup cluster regime the
   contraction targets). Rounds are counted via a monkeypatched
   ``_star`` so the "reduced rounds" claim is measured, not inferred.

2. nightly_refresh end-to-end at 20M changes / 100M facts (the r7
   verdict's missing warehouse scale probe — SCD-2 and PIT were probed
   individually in r5, never the composed plan). Records wall-clock
   and the exchange count of the enriched plan.

Run: python scripts/scale_probes_r8.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def probe(name, fn):
    t0 = time.time()
    out = fn()
    print(f"{name}: {time.time() - t0:.2f} s ({out})", flush=True)


def cc_with_round_count(edges, **kw):
    """connected_components + how many alternating rounds it ran."""
    from mimic_iv_data_pipeline_spark.operators import graph

    rounds = {"n": 0}
    orig = graph._star

    def counting_star(e, large):
        if large:
            rounds["n"] += 1
        return orig(e, large)

    graph._star = counting_star
    try:
        n = graph.connected_components(edges, **kw).count()
    finally:
        graph._star = orig
    return n, rounds["n"]


def main():
    spark = get_spark("probes_r8", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    # --- 1. CC star path and the opt-in local contraction -------------
    # random sparse graph: the PERF r7b fixture, bit-for-bit — the
    # UNCORRELATED layout where the contraction is documented as a loss
    edges = spark.range(6_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(3_000_000)).alias("id_a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3_000_000)).alias("id_b"),
    )
    probe(
        "CC 6M random edges, star path, NO contraction (cap=0) [r7b: 50.6s]",
        lambda: "labels={}, star_rounds={}".format(
            *cc_with_round_count(edges, driver_cap=0)
        ),
    )
    probe(
        "CC 6M random edges, star path, local_contract=True (documented loss)",
        lambda: "labels={}, star_rounds={}".format(
            *cc_with_round_count(edges, driver_cap=0, local_contract=True)
        ),
    )
    probe(
        "CC 6M random edges, union-find (driver_cap=8M) [r7b: 25.8s]",
        lambda: "labels={}".format(
            cc_with_round_count(edges, driver_cap=8_000_000)[0]
        ),
    )

    # dense-blob graph in the PRODUCER LAYOUT: 60k blobs x 100 docs,
    # ~6M edges, repartitioned by blob — the partition-clustered shape
    # radius_join/LSH-bucket joins actually emit (each partition holds
    # whole blobs). This is the case local_contract targets.
    blob = spark.range(6_000_000).select(
        (F.col("id") % 60_000).alias("b"), F.col("id").alias("i")
    )
    blob_edges = blob.select(
        F.col("b"),
        (F.col("b") * 1000 + F.pmod(F.xxhash64("i"), F.lit(100))).alias("id_a"),
        (F.col("b") * 1000 + F.pmod(F.xxhash64("i", F.lit(1)), F.lit(100))).alias("id_b"),
    ).repartition(64, "b").select("id_a", "id_b")
    for flag in (False, True):
        probe(
            f"CC 6M blob edges (clustered layout), star path, local_contract={flag}",
            lambda flag=flag: "labels={}, star_rounds={}".format(
                *cc_with_round_count(blob_edges, driver_cap=0, local_contract=flag)
            ),
        )
    probe(
        "CC 6M blob edges, union-find cap, local_contract=True (small collect)",
        lambda: "labels={}".format(
            cc_with_round_count(
                blob_edges, driver_cap=8_000_000, local_contract=True
            )[0]
        ),
    )

    # --- 2. nightly_refresh at 20M changes / 100M facts --------------
    from mimic_iv_data_pipeline_spark.plans.warehouse import nightly_refresh

    n_keys = 2_000_000
    changes = spark.range(20_000_000).select(
        (F.col("id") % n_keys).alias("k"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.expr(f"id div {n_keys}") * 86_400
        ).alias("v"),
        # ~10 versions per key, attribute changes every other version
        F.concat(F.lit("tier_"), F.expr(f"id div {n_keys} div 2").cast("string")).alias("tier"),
        (F.col("id") % 100).cast("double").alias("amount"),
    )
    facts = spark.range(100_000_000).select(
        (F.col("id") % n_keys).alias("k"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64("id"), F.lit(10 * 86_400))
        ).alias("ft"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("m"),
    )

    def run_refresh():
        from mimic_iv_data_pipeline_spark.operators.profiling import Expectation

        out = nightly_refresh(
            changes,
            facts=facts,
            key_cols=["k"],
            version_col="v",
            attr_cols=["tier"],
            fact_time="ft",
            rollup_keys=["tier"],
            measure_cols=["m"],
            extra_rules=[Expectation("in_range", ("amount",), lo=0.0)],
            refuse=False,
        )
        nh = out.history.count()
        nr = out.rollup.count()
        nq = out.quarantined.count()
        plan = out.enriched._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange")
        return f"history={nh}, rollup_rows={nr}, quarantined={nq}, enriched_exchanges={n_exch}"

    probe("nightly_refresh 20M changes / 100M facts", run_refresh)


if __name__ == "__main__":
    main()
