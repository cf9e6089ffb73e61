"""Round-7 probes, wave b.

1. connected_components ABOVE the raised 4M-edge cap: a 3M-node /
   6M-edge random graph runs the distributed star path by default —
   timed against a forced union-find (driver_cap=8M) on the SAME graph
   to locate the true crossover. If union-find at 6M edges is still
   several times faster, the 4M default is conservative and the
   docstring should say so (the cap is driver-RAM-bound, not
   crossover-bound).

2. canonical_url + registered-domain dedup at 20M messy URLs — the
   r6-new codegen regex chain's first scale number (pure narrow
   projection + one aggregate; no UDF).

3. extract_entities (D6 notes NLP, q219's operator) at 1M synthetic
   notes — the mapInPandas explode shape at ~30x the sf0.1 fixture.

Run: python scripts/scale_probes_r7b.py
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


def main():
    spark = get_spark("probes_r7b", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    from mimic_iv_data_pipeline_spark.operators.graph import connected_components

    # random graph: 3M nodes, 6M edges (sparse, ~2 avg degree, many
    # mid-size components — the near-dup cluster regime, not one blob)
    edges = spark.range(6_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(3_000_000)).alias("id_a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3_000_000)).alias("id_b"),
    )
    probe(
        "CC 6M edges, DEFAULT cap (4M -> star path)",
        lambda: f"{connected_components(edges).count()} labels",
    )
    probe(
        "CC 6M edges, driver_cap=8M (union-find, 96 MB Arrow collect)",
        lambda: f"{connected_components(edges, driver_cap=8_000_000).count()} labels",
    )

    from mimic_iv_data_pipeline_spark.functions.url import (
        canonical_url,
        url_registered_domain,
    )

    c = F.col("id")
    item = F.expr("id div 7").cast("string")
    messy = F.concat(
        F.lit("HTTP://"),
        F.when(c % 7 == 0, F.lit("crawler:secret@")).otherwise(F.lit("")),
        F.lit("WWW.Shop"), (c % 50_000).cast("string"), F.lit(".COM"),
        F.when(c % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/item/"), item,
        F.when(c % 3 == 0, F.lit("/?utm_source=news&utm_medium=email&id="))
        .otherwise(F.lit("?id=")),
        item,
        F.when(c % 5 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    urls = spark.range(20_000_000).select(messy.alias("url"))
    probe(
        "canonical_url + domain collapse, 20M messy URLs",
        lambda: urls.select(
            url_registered_domain(canonical_url(F.col("url"))).alias("d"),
            canonical_url(F.col("url")).alias("c"),
        )
        .groupBy("d")
        .agg(F.countDistinct("c").alias("n"))
        .count(),
    )

    from mimic_iv_data_pipeline_spark.operators.nlp import extract_entities
    from mimic_iv_data_pipeline_spark.queries.llmops import _Q219_NOTE_TEMPLATES

    m = F.pmod(F.col("id"), F.lit(4))
    text = (
        F.when(m == 0, F.lit(_Q219_NOTE_TEMPLATES[0]))
        .when(m == 1, F.lit(_Q219_NOTE_TEMPLATES[1]))
        .when(m == 2, F.lit(_Q219_NOTE_TEMPLATES[2]))
        .otherwise(F.lit(_Q219_NOTE_TEMPLATES[3]))
    )
    notes = spark.range(1_000_000).select(
        F.col("id").cast("string").alias("note_id"),
        F.col("id").alias("subject_id"),
        text.alias("text"),
    )
    probe(
        "extract_entities 1M notes (D6 mapInPandas explode)",
        lambda: f"{extract_entities(notes).count()} entities",
    )


if __name__ == "__main__":
    main()
