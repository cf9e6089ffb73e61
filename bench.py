#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock over the headline set. Each query is
forced with a count() (no driver-side materialization of results — we
measure the plan, not Arrow transfer).

Min-of-N (r9 verdict item 5): the battery repeats ``--runs N`` times
(default $SPARK_GRAFT_BENCH_RUNS or 2) and the committed per-query
number is the MINIMUM across runs — each query's least-contended
observation. A single-run artifact on a noisy host reads as a phantom
regression (BENCH_r09 alone read 1.04x while min-of-4 over its raw
runs was 0.94x); emitting minima natively makes the headline artifact
self-defending. ``canaries`` records every run's (start, end) pair so
the contention story stays auditable; ``canary_sec``/``canary_end_sec``
keep their old meaning on the best run (minima), so older tooling and
``bench_compare.py`` read the file unchanged. Pass ``--runs 1`` for
the quick iteration loop.

Note (ADVICE r11): the two e2e twins' RETURNED row counts are not
cross-mode comparable — parquet mode returns range(tensors count) (its
count() is part of the r10-continuity timed region), memory mode
returns range(1) (its leaves are noop-forced). Cross-mode value parity
is the oracle sweep's job (tests/test_r11_wave.py), not this counter's.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402
from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

# Headline set: one per operator family — scan/agg, join, as-of, window,
# temporal bucketing, pivot, dedup, text, similarity — plus the two
# LLM-ops scale paths (MinHash-LSH banding, IVF ANN) so they are tracked
# round-over-round.
HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q08_outer_join_fill",
    "q15_mode_per_group",
    "q16_outlier_clamp",
    "q18_readmission_label",
    "q19_asof_join",
    "q20_ffill_bfill",
    "q29_bucketize_hourly",
    "q31_dense_grid",
    "q32_pivot_wide",
    "q34_dedup_exact",
    "q37_lang_id",
    "q39_ngram_jaccard",
    "q40_minhash_lsh",
    "q42_cosine_topk",
    "q53_ann_ivf",
    "q65_contamination",
    "q66_heavy_hitters",
    "q69_sequence_packing",
    "q70_repetition",
    "q79_tfidf_keywords",
    "q80_dsir_weights",
    "q83_ngram_novelty",
    "q85_duplicate_spans",
    "q88_dedup_clean",
    "q90_covariance_matrix",
    "q92_edit_distance_join",
    "q99_edit_distance_sparse",
    "q93_bpe_tokenize",
    "q95_chunk_overlap",
    "q96_weighted_sample",
    # round-4 families: PQ/ADC search, Kneser-Ney LM scoring, BM25,
    # MERGE-shape upsert, fixed-codebook PQ encode. q116_theta_sets is
    # deliberately NOT here: its output carries exact ground-truth
    # union/intersect counts next to the sketch estimates (differential
    # redundancy by design), so its wall-clock measures the exact
    # distinct joins production would never run, not the sketch path.
    "q103_pq_topk",
    "q108_kneser_ney",
    "q113_bm25",
    "q119_scd_upsert",
    "q123_pq_encode_fixed",
    # round-5: uncapped twin of q92 (the registry query now sets
    # max_bucket=2000 — the default-on skew wall; this entry keeps the
    # cap's cost/benefit measured round-over-round at identical output)
    "q92_edit_distance_nocap",
    # round-5 second wave: iterative graph (PageRank — the only
    # multi-job fixpoint in the registry), PIT range join against an
    # SCD-2 history, and the one-pass multi-distinct table profile.
    "q142_pagerank",
    "q144_pit_join",
    "q140_profile_table",
    # round-5 third wave: oriented wedge join (the second graph
    # workload beside PageRank), multi-pass funnel over the event log,
    # and the distributed-prefix-sum corpus selection.
    "q151_triangle_count",
    "q153_funnel",
    "q155_token_budget",
    # survival estimator (distinct-times windows) and the Apriori pair
    # join — the two remaining plan families not yet tracked.
    "q162_kaplan_meier",
    "q168_association_rules",
    # round-5 fourth/fifth wave: the event-time RANGE frame, the two
    # per-key recurrences (fold vs prefix identity), the global-rank
    # pipeline (prefix-sum engine, post layout-drift fix), and the
    # replicate-weighted bootstrap (md5-bound).
    "q171_rolling_revenue",
    "q173_ewma",
    "q174_cusum",
    "q176_lift_gains",
    "q180_bootstrap_ci",
    # round-5 sixth wave: the narrow bigram build + pair aggregate
    # (PMI) and the two-state struct fold (Holt, the q173 fold's
    # heavier sibling).
    "q184_pmi_collocations",
    "q187_holt_trend",
    # round-5 seventh wave: the tokens x classes scoring join.
    "q190_naive_bayes",
    # xxhash64 twin of q180 (EXTRA) — isolates the md5 digest cost
    # that dominates the oracle-mirrorable bootstrap.
    "q180_bootstrap_xxhash",
    # round-9: the two negative-mining entries (uniform draws via the
    # dense-index equi-join; ANN retrieve-then-exclude) — tracked so
    # the training-triple path is measured every round.
    "q220_negative_sample",
    "q221_hard_negatives",
    # round-8: the geo radius-join -> connected-components composite
    # (exercises the partition-local contraction fast path added in r8;
    # tracked so the clustered-layout CC plan is measured every round).
    "q210_geo_clusters",
    # round-6: the reference's actual workload shape end-to-end
    # (cohort -> cleaning -> windows -> dense grid -> features/tensors,
    # six stage writes) — regression-guards the composed pipeline, not
    # just operator micro-queries. Single-run (see ONCE).
    "e2e_mimic_pipeline",
    # round-11: the same composed pipeline with in-memory stage
    # handoffs (localCheckpoint boundaries, lazy leaves) — the
    # parquet/memory seam win tracked side by side with the
    # file-handoff twin above. Single-run (see ONCE).
    "e2e_mimic_pipeline_mem",
]


def _q92_edit_distance_nocap(spark, sf_dir):
    from mimic_iv_data_pipeline_spark.operators.fuzzy import edit_distance_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return edit_distance_join(cust, "c_custkey", "c_name", max_dist=1, max_bucket=None)


def _q180_bootstrap_xxhash(spark, sf_dir):
    """q180's twin on the JVM-hash seam: same plan, xxhash64 digests
    instead of md5 — tracks how much of the bootstrap's wall-clock is
    the oracle-mirrorable digest (the 100 TB path drops md5)."""
    from pyspark.sql import functions as F

    from mimic_iv_data_pipeline_spark.operators.sampling import poisson_bootstrap_ci
    from mimic_iv_data_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    return poisson_bootstrap_ci(
        ev, "event_type", "y", "event_id", n_replicates=40, hasher="xxhash64"
    )


def _e2e_tables(spark, sf_dir):
    """Declaratively generated MIMIC-shaped inputs scaled by sf (30k
    stays / ~3M chart events at sf0.1 — the r1 PERF.md probe shape),
    deterministic via xxhash64. Shared by both e2e handoff modes.

    Built from parsed SQL strings (r12, guide §5): this builder runs
    inside BOTH e2e entries' timed regions, and the Column-algebra form
    cost ~0.9 s of single-threaded driver time per run (py4j chatter +
    one eager JVM re-analysis per Dataset op). The expressions — and
    therefore every generated value — are identical
    (tests/test_r12_fixes.py pins old-form == new-form row multisets)."""
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_stays = max(1_000, int(300_000 * sf))
    n_subjects = max(500, n_stays // 2)
    base = "to_timestamp('2150-01-01 00:00:00')"

    stays_sql = [
        "id AS stay_id",
        f"pmod(xxhash64(id), {n_subjects}) AS subject_id",
        "CAST(NULL AS BIGINT) AS _pad",
    ]
    admit = (
        f"timestamp_seconds(unix_timestamp({base})"
        f" + pmod(xxhash64(stay_id, 1), {300 * 86400}))"
    )
    los_h = "CAST(pmod(xxhash64(stay_id, 2), 264) + 24 AS INT)"  # 1-12 d
    icustays = spark.range(n_stays).selectExpr(*stays_sql).selectExpr(
        "subject_id",
        "stay_id AS hadm_id",
        "stay_id",
        f"{admit} AS intime",
        f"timestamp_seconds(unix_timestamp({admit})"
        f" + CAST({los_h} AS BIGINT) * 3600) AS outtime",
        f"{los_h} / 24.0D AS los",
    )
    admissions = icustays.selectExpr(
        "subject_id",
        "hadm_id",
        "intime AS admittime",
        "outtime AS dischtime",
        "CAST(NULL AS TIMESTAMP) AS deathtime",
        "CAST(pmod(xxhash64(hadm_id, 3), 20) = 0 AS INT) AS hospital_expire_flag",
        "'Private' AS insurance",
        "'OTHER' AS ethnicity",
    )
    patients = icustays.select("subject_id").distinct().selectExpr(
        "subject_id",
        "CASE WHEN pmod(xxhash64(subject_id, 4), 2) = 0 THEN 'M' ELSE 'F' END"
        " AS gender",
        # ~15% minors, filtered by min_age
        "CAST(pmod(xxhash64(subject_id, 5), 85) + 5 AS INT) AS anchor_age",
        "CAST(2150 AS INT) AS anchor_year",
        "'2008 - 2010' AS anchor_year_group",
        "CAST(NULL AS TIMESTAMP) AS dod",
    )
    ev_per_stay = 100
    events = (
        spark.range(n_stays * ev_per_stay)
        .selectExpr(f"CAST(id / {ev_per_stay} AS BIGINT) AS stay_id", "id AS eid")
        .join(icustays.select("stay_id", "intime", "los"), "stay_id")
        .selectExpr(
            "stay_id",
            "timestamp_seconds(unix_timestamp(intime)"
            " + pmod(xxhash64(eid, 6), CAST(los * 86400 + 14400 AS BIGINT))"
            " - 7200) AS charttime",
            "pmod(xxhash64(eid, 7), 3) + 220045 AS itemid",
            "CASE WHEN pmod(xxhash64(eid, 8), 50) = 0 THEN 9999.0D"
            " ELSE 70.0D + pmod(xxhash64(eid, 9), 2000) / 100.0D END AS valuenum",
            "CASE WHEN pmod(xxhash64(eid, 10), 30) = 0 THEN 'BPM' ELSE 'bpm' END"
            " AS valueuom",
        )
    )
    return {
        "visits": icustays,
        "patients": patients,
        "admissions": admissions,
        "events": events,
    }


def _run_e2e(spark, sf_dir, handoff):
    import shutil
    import tempfile

    from mimic_iv_data_pipeline_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    out_dir = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        # Memory mode forces every leaf the parquet mode forces by
        # writing — same stage set end to end — via run_pipeline's
        # leaf_consumer overlap hook (optimization r12, guide §2.6):
        # each leaf's noop job is submitted from the pipeline's own
        # 2-thread pool the moment its input boundary is pinned, so
        # summary's job back-fills executors WHILE the timeseries
        # boundary computes (the parquet twin's async leaf writes have
        # had this shape since r11; the mem twin used to serialize
        # summary after the dense materialization and then force all
        # three leaves post-hoc). Same DAGs computed, same noop sink.
        #
        # Measurement fix (optimization r11, guide §1.4): the leaves
        # were previously forced with .count(), which lets the
        # optimizer PRUNE the aggregate payloads — a count() over
        # dl_tensor_frame computes only distinct ids, never the
        # collect_list/sort_array tensors (verified by plan), so the
        # mem twin under-measured exactly the work the parquet twin
        # pays for by writing. The noop sink computes every column
        # of every row without sink cost; pre-fix numbers are kept
        # in bench_runs_r11/ (see OPTIMIZATION_r11.md).
        def _force(df, _name):
            df.write.format("noop").mode("overwrite").save()

        staged = run_pipeline(
            spark,
            _e2e_tables(spark, sf_dir),
            out_dir,
            PipelineConfig(include_hours=48, bucket_hours=2),
            handoff=handoff,
            leaf_consumer=_force if handoff == "memory" else None,
        )
        if handoff == "memory":
            n = 1
        else:
            n = staged["tensors"].count()
        return spark.range(n)  # bench counts this (cheap, stable)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _e2e_mimic_pipeline(spark, sf_dir):
    """The reference's ACTUAL workload shape, end to end: cohort →
    UoM/outlier cleaning → 48 h window → 2 h buckets → dense grid +
    mean impute → feature matrix + tensor frame, six parquet stage
    writes (plans/pipeline.py:run_pipeline — handoff="parquet", the
    reference's csv.gz file-handoff semantics). Run ONCE per bench
    (see ONCE below): the entry is eager (it writes its stages), so
    warm-run timing would triple the cost while measuring the same DAG.
    """
    return _run_e2e(spark, sf_dir, "parquet")


def _e2e_mimic_pipeline_mem(spark, sf_dir):
    """The same composed pipeline with handoff="memory" (r10 verdict
    item 6): multi-consumer stages pin via localCheckpoint instead of
    parquet round-trips, leaves stay lazy. Benched next to the parquet
    twin every round so the seam's win is a tracked number, not a
    one-off probe. Values are mode-identical (tests/test_r11_wave.py).
    """
    return _run_e2e(spark, sf_dir, "memory")


EXTRA = {
    "q92_edit_distance_nocap": _q92_edit_distance_nocap,
    "q180_bootstrap_xxhash": _q180_bootstrap_xxhash,
    "e2e_mimic_pipeline": _e2e_mimic_pipeline,
    "e2e_mimic_pipeline_mem": _e2e_mimic_pipeline_mem,
}

# Entries that are eager end-to-end plans (stage writes inside): timed
# with a single run, no codegen warm-up — the warm-up would re-execute
# the whole pipeline for the same measurement.
ONCE = {"e2e_mimic_pipeline", "e2e_mimic_pipeline_mem"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    for i, a in enumerate(sys.argv):
        if a == "--runs" and i + 1 < len(sys.argv):
            n_runs = int(sys.argv[i + 1])
        elif a.startswith("--runs="):
            n_runs = int(a.split("=", 1)[1])
    n_runs = max(1, n_runs)
    spark = get_spark("bench")
    queries = {**all_queries(), **EXTRA}

    # Warm up JVM/codegen/shuffle machinery so timings measure the
    # queries, not first-use initialization.
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    # Warm timing: one untimed run pays one-off Janino whole-stage-codegen
    # compilation (~1.5s per novel plan shape), then two timed runs with
    # min() reported — min is robust to transient host contention, which
    # produced a phantom +45% "regression" on q15 in round 2 (same plan,
    # same code; re-measured at parity).
    # Host-contention canary: a FIXED pure-CPU aggregate (no IO, no
    # sf dependence, same plan every round). Its cross-round ratio
    # estimates how loaded the driver's box was — r6 burned analysis
    # time on a uniform ~1.2x "regression" across untouched queries
    # that was exactly this. Read BENCH_r{N}.canary_sec /
    # BENCH_r{M}.canary_sec and divide headline ratios by it before
    # calling anything a real delta (see PERF.md "Bench canary").
    def _canary() -> float:
        q = spark.range(50_000_000).selectExpr("id % 9973 AS k")
        # TWO warm-up passes (r9 verdict item 8): with one, 3 of 4 r9
        # runs showed the START canary 1.2-1.9x the end canary —
        # residual background JIT from the session warm-up was still
        # compiling during the first timed pass, so worst-of-two
        # normalization systematically over-adjusted. The second pass
        # lets the JIT settle before timing starts.
        q.groupBy("k").count().count()
        q.groupBy("k").count().count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q.groupBy("k").count().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # Per-battery-run loop: run r's timings are min-of-2 timed
    # executions per query (after a codegen warm-up execution in run 1
    # only — the JVM's codegen cache persists across runs); the
    # committed number is the min ACROSS runs. ONCE entries (eager
    # end-to-end plans with stage writes) execute once total, in run 1.
    canaries: list[list[float]] = []
    run_totals: list[float] = []
    best_t: dict[str, float] = {}
    for run in range(n_runs):
        c_start = _canary()
        run_total = 0.0
        for name in HEADLINE:
            fn = queries[name]
            if name in ONCE:
                if run > 0:
                    continue
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = time.perf_counter() - t0
            else:
                if run == 0:
                    fn(spark, sf_dir).count()  # codegen warm-up run
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    best = min(best, time.perf_counter() - t0)
            dt = round(best, 3)
            run_total += dt
            best_t[name] = min(best_t.get(name, float("inf")), dt)
        # second canary AFTER the battery: a single start-of-run sample
        # misses mid-run contention bursts (r8 observed a neighbor whose
        # bursts flagged disjoint query sets across four same-code
        # runs); a large start/end gap marks the run burst-contaminated.
        c_end = _canary()
        canaries.append([c_start, c_end])
        run_totals.append(round(run_total, 3))

    total = sum(best_t.values())
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {n: best_t[n] for n in HEADLINE if n in best_t},
                # the (start, end) canary PAIR of the fastest run (by
                # run_total) — a real observed pair, so tooling that
                # normalizes by max(start, end) sees one run's
                # contention, not per-position minima mixed across
                # runs (ADVICE r10); the full per-run pairs stay in
                # "canaries" below
                "canary_sec": canaries[run_totals.index(min(run_totals))][0],
                "canary_end_sec": canaries[run_totals.index(min(run_totals))][1],
                "runs": n_runs,
                "run_totals": run_totals,  # ONCE entries count in run 1 only
                "canaries": canaries,  # per-run (start, end) pairs
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
