"""Round-9 wave-c probe: negative_sample at warehouse scale.

The r9 operator's two index strategies at their intended regimes:

* 50M-doc corpus / 100k queries / k=4 — the >1M branch (distributed
  prefix-sum dense index + draw-resolution equi-join). The probe
  records wall-clock and verifies output invariants (4 negatives per
  query, no positive leaks) without any driver-side materialization
  beyond the counts.
* 1M-doc corpus (the branch boundary) for the window-rank path.

Run: python scripts/scale_probes_r9c.py
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
    from mimic_iv_data_pipeline_spark.operators.sampling import negative_sample

    spark = get_spark("probes_r9c", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    corpus_big = spark.range(50_000_000).select(
        (F.col("id") * 7 + 3).alias("doc_id")  # non-contiguous ids
    )
    pos = spark.range(100_000).select(
        F.col("id").alias("query_id"),
        ((F.col("id") * 7 + 3) % 350_000_000).alias("doc_id"),
    )

    def run_big():
        out = negative_sample(pos, corpus_big, k=4, salt="p9c")
        n = out.count()
        leaks = out.join(pos, ["query_id", "doc_id"], "left_semi").count()
        return f"rows={n}, positive_leaks={leaks}"

    probe("negative_sample 50M corpus / 100k queries (prefix-sum branch)", run_big)

    corpus_1m = spark.range(1_000_000).select(F.col("id").alias("doc_id"))

    def run_1m():
        out = negative_sample(pos, corpus_1m, k=4, salt="p9c")
        return f"rows={out.count()}"

    probe("negative_sample 1M corpus / 100k queries (window-rank branch)", run_1m)
    spark.stop()


if __name__ == "__main__":
    main()
