"""Round-9 probes.

1. local_contract on the LSH/ngram DEDUP path's ACTUAL layouts (the
   r8 verdict item 5 question). The r8 probe showed a 3.5x win on the
   PRODUCER layout (pairs partition-clustered by bucket/cell, the geo
   shape). But ``ngram_jaccard_pairs``/``minhash_lsh_pairs`` ship
   their output through a trailing ``distinct`` / verify join, whose
   hash shuffle re-scatters pairs by (id_a, id_b) or by id_b — so the
   q76/q88 consumers never see the producer layout. Before threading
   the flag through those callers, measure the same 6M-edge dense-blob
   graph in all THREE layouts:
     a. producer-clustered (repartition by blob)  [r8 control]
     b. hash-scattered by (id_a, id_b)            [the distinct layout]
     c. grouped by id_b                           [the verify-join layout]
   with the star path (driver_cap=0), contraction on/off, counting
   star rounds; plus the contracted-forest SIZE per layout (what the
   driver fast path would Arrow-collect).

2. The same question at the driver fast path: collect size with/
   without contraction per layout (the fast path is what q76/q88
   actually take at every tested SF).

Run: python scripts/scale_probes_r9.py
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


def cc_with_round_count(edges, src="id_a", dst="id_b", **kw):
    from mimic_iv_data_pipeline_spark.operators import graph

    rounds = {"n": 0}
    orig = graph._star

    def counting_star(e, large):
        if large:
            rounds["n"] += 1
        return orig(e, large)

    graph._star = counting_star
    try:
        n = graph.connected_components(edges, src, dst, **kw).count()
    finally:
        graph._star = orig
    return n, rounds["n"]


def main():
    spark = get_spark("probes_r9", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    from mimic_iv_data_pipeline_spark.operators.graph import _local_contract

    # 60k blobs x 100 docs, ~6M edges — the r8 dense-blob fixture
    blob = spark.range(6_000_000).select(
        (F.col("id") % 60_000).alias("b"), F.col("id").alias("i")
    )
    base = blob.select(
        F.col("b"),
        (F.col("b") * 1000 + F.pmod(F.xxhash64("i"), F.lit(100))).alias("id_a"),
        (F.col("b") * 1000 + F.pmod(F.xxhash64("i", F.lit(1)), F.lit(100))).alias(
            "id_b"
        ),
    )
    layouts = {
        "producer(b)": base.repartition(64, "b").select("id_a", "id_b"),
        "hash(id_a,id_b)": base.select("id_a", "id_b").repartition(
            64, "id_a", "id_b"
        ),
        "by(id_b)": base.select("id_a", "id_b").repartition(64, "id_b"),
    }
    for lname, edges in layouts.items():
        edges = edges.localCheckpoint()  # freeze layout; exclude gen cost
        # contracted-forest size = what the driver fast path collects
        probe(
            f"forest size, layout={lname}",
            lambda e=edges: "raw={}, contracted={}".format(
                e.count(),
                _local_contract(
                    e.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
                ).count(),
            ),
        )
        for flag in (False, True):
            probe(
                f"CC star path (cap=0), layout={lname}, local_contract={flag}",
                lambda e=edges, f=flag: "labels={}, star_rounds={}".format(
                    *cc_with_round_count(e, src="id_a", dst="id_b", driver_cap=0, local_contract=f)
                ),
            )
        for flag in (False, True):
            probe(
                f"CC driver fast path (cap=8M), layout={lname}, "
                f"local_contract={flag}",
                lambda e=edges, f=flag: "labels={}".format(
                    cc_with_round_count(e, src="id_a", dst="id_b", driver_cap=8_000_000, local_contract=f)[0]
                ),
            )

    spark.stop()


if __name__ == "__main__":
    main()
