"""Round-9 sf0.1 -> sf1 scaling battery (r8 verdict item 4).

Times the 5 most expensive bench entries (plus the q92 uncapped twin,
the q180 xxhash twin, and the q88 CC composite) at sf0.1 and at the
locally generated sf1 (scripts/gen_sf1.py, 10x data), in one warm
session, and prints the scaling exponent  log(t_sf1/t_sf0.1)/log(10)
per query — 1.0 = perfectly linear, >1 = super-linear (diagnose).

Protocol: bench.py's — one untimed warm run then min of two timed
runs, except the eager e2e pipeline (single run, its stage writes ARE
the work). sf0.1 times here are same-session controls for the ratio;
cross-round comparisons should still use bench.py + canary.

Run:  python scripts/gen_sf1.py && python scripts/scale_probes_r9b.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".sf1", "sf1")


def main() -> None:
    from mimic_iv_data_pipeline_spark import get_spark
    from mimic_iv_data_pipeline_spark.queries import all_queries

    sys.path.insert(0, REPO)
    import bench  # the EXTRA entries + ONCE protocol live there

    qs = {**all_queries(), **bench.EXTRA}
    targets = [
        "q92_edit_distance_join",
        "q92_edit_distance_nocap",
        "q180_bootstrap_ci",
        "q180_bootstrap_xxhash",
        "q190_naive_bayes",
        "q168_association_rules",
        "q88_dedup_clean",
        "e2e_mimic_pipeline",
    ]
    spark = get_spark("probes_r9b", **{"spark.driver.memory": "24g"})
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    def timed(name: str, sf_dir: str) -> float:
        fn = qs[name]
        spark.catalog.clearCache()
        if name in bench.ONCE:
            t0 = time.time()
            fn(spark, sf_dir).count()
            return time.time() - t0
        fn(spark, sf_dir).count()  # warm (codegen, file listing)
        best = math.inf
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best

    rows = []
    for name in targets:
        t01 = timed(name, SF01)
        t1 = timed(name, SF1)
        exp = math.log10(t1 / t01)  # /log10(10x) == 1
        rows.append((name, t01, t1, t1 / t01, exp))
        print(
            f"{name:28s} sf0.1={t01:7.2f}s  sf1={t1:7.2f}s  "
            f"ratio={t1 / t01:5.2f}x  exponent={exp:4.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
