"""VERDICT r11 item 2: re-decide the q95/q74 chunk/url fan under the
bench protocol's interleaved-A/B leg.

The two text.py fan sites (chunk_documents, url_frequency) are gated on
``spark.graft.fanout.text`` for this measurement; variants alternate
rep-by-rep inside one session so both see the same contention profile.
The full-bench canary-adjusted compare is the second leg (run
separately with SPARK_GRAFT_FANOUT_TEXT exported via a conf override).

Run:  python scripts/probe_r12_chunkfan.py [--sf /root/testdata/sf0.1] [--reps 5]
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
    reps = int(opt("--reps", "5"))

    spark = get_spark("probe_r12_chunkfan")
    from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

    queries = all_queries()
    names = ["q95_chunk_overlap", "q74_url_dedup"]
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    best: dict[tuple[str, str], float] = {}
    # warm up BOTH plan shapes per query before timing (codegen)
    for name in names:
        for flag in ("1", "0"):
            spark.conf.set("spark.graft.fanout.text", flag)
            queries[name](spark, sf_dir).count()
    for rep in range(reps):
        for flag in ("1", "0"):
            spark.conf.set("spark.graft.fanout.text", flag)
            for name in names:
                spark.sparkContext.setJobDescription(
                    f"{name} fan={flag} rep{rep}"
                )
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                k = (name, flag)
                best[k] = min(best.get(k, float("inf")), dt)
                print(f"rep{rep} {name} fan={flag}: {dt:.3f}")
    print("\nmin-of-%d:" % reps)
    for name in names:
        on, off = best[(name, "1")], best[(name, "0")]
        print(f"{name:24s} fan ON {on:6.3f}  OFF {off:6.3f}  ON/OFF {on / off:5.2f}")


if __name__ == "__main__":
    main()
