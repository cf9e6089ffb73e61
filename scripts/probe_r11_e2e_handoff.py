"""Round-11 probe: e2e pipeline handoff seam at sf0.1 AND sf1
(r10 verdict item 6's measurement half — the seam itself and the
value-equality test landed with `run_pipeline(handoff=...)`).

Runs the bench's exact e2e entry (`bench._run_e2e` — cohort → UoM/
outlier cleaning → 48 h window → 2 h buckets → dense grid + impute →
feature matrix + tensor frame) in BOTH handoff modes at two scales:

  sf0.1 —  30k stays /  ~3M chart events (the bench's tracked scale)
  sf1   — 300k stays / ~30M chart events (the sf1-class readout)

`_e2e_tables` generates the MIMIC-shaped inputs declaratively from
the sf parsed out of the dir basename (xxhash64-deterministic), so
sf1 needs no on-disk testdata. Each (sf, mode) cell runs ``--runs``
times (default 2) and reports every raw plus the min; modes alternate
within a rep so intra-day host drift hits both evenly.

Run:  python scripts/probe_r11_e2e_handoff.py [--runs 2] [--sf1-runs 1]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2
    sf1_runs = (
        int(sys.argv[sys.argv.index("--sf1-runs") + 1])
        if "--sf1-runs" in sys.argv
        else 1
    )
    spark = get_spark("probe_e2e_handoff", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # two canary passes before timing (bench.py protocol — JIT warm-up)
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    results: dict[tuple[str, str], list[float]] = {}
    for sf_name, n in (("sf0.1", runs), ("sf1", sf1_runs)):
        for rep in range(n):
            for mode in ("parquet", "memory"):
                t0 = time.time()
                bench._run_e2e(spark, f"/tmp/{sf_name}", mode)
                dt = time.time() - t0
                results.setdefault((sf_name, mode), []).append(dt)
                print(f"{sf_name} {mode:8s} rep{rep}: {dt:7.1f} s", flush=True)
    print("---- summary (min of raws) ----", flush=True)
    for (sf_name, mode), ts in sorted(results.items()):
        raws = " ".join(f"{t:.1f}" for t in ts)
        print(f"{sf_name:6s} {mode:8s}: min {min(ts):7.1f} s  (raws: {raws})",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
