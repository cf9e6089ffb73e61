"""Round-11 probes (r10 verdict items 2 and 3):

A. ``plans/llm_corpus.build_corpus`` END TO END at sf1-class size —
   the composed nine-stage corpus build has per-stage probes but no
   composed wall-clock readout. A purpose-built synthetic corpus with
   PLANTED structure gives every stage real work:

     * base docs: ~36 words each, deterministic 6-char content words
       (xxhash64-chosen from a 512-word vocabulary) interleaved with an
       8-stopword cycle every 5th position — passes the quality gate
       (mean word len ≈ 5, en marker hits, alpha), and no two docs
       share a word 3-gram (every shingle window contains ≥2 random
       words), so the near-dup join's Σdf² stays linear;
     * exact dups: N/20 docs copying a base doc verbatim under a new id
       (caught by stage 4);
     * near dups: N/20 docs = base doc + one appended constant word
       (3-gram Jaccard 34/36 ≈ 0.94 ≥ 0.8 — caught by stage 5);
     * low quality: N/50 two-token docs (die at min_tokens);
     * non-English: N/50 copies of a French-marker doc (die at lang);
     * contaminated: N/100 docs each equal to ONE distinct benchmark
       doc ("bench"-salted generator — 100% 8-gram overlap, caught by
       stage 6; distinct texts so they survive both dedup stages).

   Run at ~506k and ~5.06M docs; report per-stage wall-clock
   (CorpusStats.stage_seconds), survivor counts vs planted
   expectations, and the composed 10x exponent log10(t_5M/t_500k).

B. Clustered-embedding ANN recall dial — the r10 dial measured recall
   on UNIFORM random vectors (IVF's worst case) and argued real
   corpora sit above it; this probe measures it. 1M docs, 64 dims:
   90% cluster members (256 deterministic blob centers, noise sigma
   0.08 ≈ tight blobs; center norm ~1) + 10% uniform off-cluster tail,
   1k queries drawn near centers. Same pre-trained 256-cell quantizer
   protocol as r10 (sampled_matrix + _train_quantizer), recall of
   ivf_topk@16 vs exact cosine_topk@16 at n_probe in {8, 16, 32, 64}.

Run:  python scripts/scale_probes_r11.py [a|b|ab] [--small]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

# ---------------------------------------------------------------- probe A

_SYL = ["ba", "ce", "di", "fo", "gu", "ka", "le", "mi",
        "no", "pu", "ra", "se", "ti", "vo", "wu", "ze"]
VOCAB = [a + b + c for a in _SYL for b in _SYL for c in _SYL][:512]
STOPS = ["the", "is", "and", "have", "with", "that", "of", "to"]
W = 36  # words per doc


def _words_text(seed_col, salt: str):
    """~36-word deterministic doc: stopword cycle at every 5th position,
    xxhash64-chosen 6-char vocabulary words elsewhere. No two seeds
    share any 3-word shingle (each window has >= 2 random words)."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    stops = F.array(*[F.lit(s) for s in STOPS])
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(W - 1)),
            lambda i: F.when(
                i % 5 == 0,
                F.element_at(stops, (F.floor(i / 5) % 8 + 1).cast("int")),
            ).otherwise(
                F.element_at(
                    vocab,
                    (F.pmod(F.xxhash64(seed_col, i, F.lit(salt)), F.lit(512)) + 1)
                    .cast("int"),
                )
            ),
        ),
        " ",
    )


def gen_corpus(spark, n_base: int):
    """(docs, benchmark, planted) — see module docstring for the mix."""
    n_exact = n_base // 20
    n_near = n_base // 20
    n_lowq = n_base // 50
    n_fr = n_base // 50
    n_contam = n_base // 100
    n_bench = max(n_contam, 1)
    bounds = []
    lo = 0
    for n in (n_base, n_exact, n_near, n_lowq, n_fr, n_contam):
        bounds.append((lo, lo + n))
        lo += n
    total = lo
    (b_base, b_exact, b_near, b_lowq, b_fr, b_contam) = bounds

    i = F.col("id")
    base_seed = [
        i,                                  # base: own id
        i - F.lit(b_exact[0]),              # exact dup of base (id - off)
        i - F.lit(b_near[0]),               # near dup of base
        i,                                  # lowq (unused seed)
        i,                                  # fr (unused seed)
        F.pmod(i - F.lit(b_contam[0]), F.lit(n_bench)),  # bench copy
    ]
    text = (
        F.when(i < b_base[1], _words_text(base_seed[0], "doc"))
        .when(i < b_exact[1], _words_text(base_seed[1], "doc"))
        .when(
            i < b_near[1],
            F.concat(_words_text(base_seed[2], "doc"), F.lit(" neardup")),
        )
        .when(i < b_lowq[1], F.lit("zz zz"))
        .when(
            i < b_fr[1],
            F.lit("le monde est grand et le chat est la maintenant oui "
                  "le jour est long est le soir est la encore une fois"),
        )
        .otherwise(_words_text(base_seed[5], "bench"))
    )
    docs = spark.range(total).select(i.alias("doc_id"), text.alias("text"))
    bench = spark.range(n_bench).select(
        F.col("id").alias("doc_id"), _words_text(F.col("id"), "bench").alias("text")
    )
    planted = {
        "total": total,
        "base": n_base,
        "exact_dups": n_exact,
        "near_dups": n_near,
        "lowq": n_lowq,
        "fr": n_fr,
        "contaminated": n_contam,
    }
    return docs, bench, planted


def run_build(spark, tmp: str, n_base: int, tag: str):
    from mimic_iv_data_pipeline_spark.plans.llm_corpus import build_corpus

    docs_df, bench_df, planted = gen_corpus(spark, n_base)
    t0 = time.time()
    docs_df.repartition(64).write.mode("overwrite").parquet(f"{tmp}/docs_{tag}")
    bench_df.repartition(4).write.mode("overwrite").parquet(f"{tmp}/bench_{tag}")
    print(f"A.datagen[{tag}]: {time.time() - t0:.1f} s "
          f"(one-off; planted={planted})", flush=True)
    docs = spark.read.parquet(f"{tmp}/docs_{tag}")
    bench = spark.read.parquet(f"{tmp}/bench_{tag}")

    t0 = time.time()
    result, st = build_corpus(docs, benchmark=bench, stats=True)
    total = time.time() - t0
    print(f"A.build_corpus[{tag}]: TOTAL {total:.1f} s", flush=True)
    for k, v in st.stage_seconds.items():
        print(f"  stage {k:20s} {v:8.1f} s  survivors={getattr(st, k)}",
              flush=True)

    # planted-structure verification (fr/lowq die at quality; exact and
    # near dups at their stages; contaminated at stage 6)
    exp_quality = planted["base"] + planted["exact_dups"] + planted["near_dups"] + planted["contaminated"]
    exp_exact = exp_quality - planted["exact_dups"]
    exp_near = exp_exact - planted["near_dups"]
    exp_contam = exp_near - planted["contaminated"]
    checks = [
        ("after_quality", st.after_quality, exp_quality),
        ("after_exact_dedup", st.after_exact_dedup, exp_exact),
        ("after_near_dedup", st.after_near_dedup, exp_near),
        ("after_contamination", st.after_contamination, exp_contam),
    ]
    ok = True
    for name, got, exp in checks:
        mark = "OK" if got == exp else f"MISMATCH (expected {exp})"
        ok &= got == exp
        print(f"  check {name:22s} {got:>9} {mark}", flush=True)
    print(f"A.planted_structure[{tag}]: {'ALL OK' if ok else 'MISMATCH'}",
          flush=True)
    return total


def probe_a(spark, small: bool) -> None:
    import tempfile

    tmp = tempfile.mkdtemp(prefix="probe_r11a_")
    n_small = 44_000 if small else 440_000
    n_big = 440_000 if small else 4_400_000
    t_small = run_build(spark, tmp, n_small, "small")
    t_big = run_build(spark, tmp, n_big, "big")
    exp = math.log10(t_big / t_small) if t_small > 0 else float("nan")
    print(f"A.exponent: t_small={t_small:.1f} t_big={t_big:.1f} "
          f"log10-ratio(10x data)={exp:.2f}", flush=True)


# ---------------------------------------------------------------- probe B

DIMS = 64
N_CELLS = 256


def _unit_noise(seed_col, salt: str, scale: float):
    """Deterministic per-(row, dim) uniform noise in [-scale, scale)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(DIMS - 1)),
        lambda i: (
            F.pmod(F.xxhash64(seed_col, i, F.lit(salt)), F.lit(2000)).cast("double")
            / F.lit(1000.0)
            - F.lit(1.0)
        ) * F.lit(scale),
    )


def blob_corpus(spark, n: int, tail_frac: float = 0.10, sigma: float = 0.08):
    """90% blob members: embedding = center(cluster) + sigma-noise,
    cluster = xxhash(id) % 256, centers themselves xxhash-uniform in
    [-1,1)^64; 10% uniform tail (the r10 generator's regime)."""
    cid = F.pmod(F.xxhash64("id"), F.lit(N_CELLS))
    center = F.transform(
        F.sequence(F.lit(0), F.lit(DIMS - 1)),
        lambda i: (
            F.pmod(F.xxhash64(cid, i, F.lit("ctr")), F.lit(2000)).cast("double")
            / F.lit(1000.0)
            - F.lit(1.0)
        ),
    )
    is_tail = F.pmod(F.xxhash64("id", F.lit("tail")), F.lit(100)) < int(tail_frac * 100)
    member = F.zip_with(center, _unit_noise(F.col("id"), "nz", sigma), lambda c, z: c + z)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(is_tail, _unit_noise(F.col("id"), "tl", 1.0)).otherwise(member).alias(
            "embedding"
        ),
    )


def probe_b(spark) -> None:
    import tempfile

    from mimic_iv_data_pipeline_spark.operators.similarity import (
        _train_quantizer,
        cosine_topk_pandas,
        ivf_topk,
        sampled_matrix,
    )

    n_docs, n_q, k = 1_000_000, 1_000, 16
    tmp = tempfile.mkdtemp(prefix="probe_r11b_")
    t0 = time.time()
    blob_corpus(spark, n_docs).repartition(64).write.parquet(f"{tmp}/c")
    # queries: near-center probes (the serving shape) with their own noise
    blob_corpus(spark, n_q).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    ).repartition(4).write.parquet(f"{tmp}/q")
    print(f"B.datagen: {time.time() - t0:.1f} s (one-off)", flush=True)
    corpus = spark.read.parquet(f"{tmp}/c")
    queries = spark.read.parquet(f"{tmp}/q")

    t0 = time.time()
    X = sampled_matrix(corpus, "vec_id", "embedding", 262_144, "ivf")
    centers = _train_quantizer(X, N_CELLS, seed=42, iters=10)
    print(f"B.quantizer_train_256: {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_pandas(queries, corpus=corpus, k=k).collect()
    }
    t_exact = time.time() - t0
    print(f"B.exact@16: {t_exact:.1f} s, {len(exact)} pairs", flush=True)

    for n_probe in (8, 16, 32, 64):
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                queries, corpus=corpus, n_cells=N_CELLS, n_probe=n_probe,
                k=k, centroids=centers,
            ).collect()
        }
        dt = time.time() - t0
        rec = len(got & exact) / max(1, len(exact))
        print(
            f"B.dial n_probe={n_probe:3d} ({100 * n_probe // N_CELLS:3d}%): "
            f"{dt:6.1f} s  recall={rec:.3f}  speedup={t_exact / max(dt, 1e-9):.1f}x",
            flush=True,
        )


def main() -> None:
    which = "ab"
    small = "--small" in sys.argv
    for a in sys.argv[1:]:
        if a in ("a", "b", "ab"):
            which = a
    spark = get_spark("probes_r11", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    if "a" in which:
        probe_a(spark, small)
    if "b" in which:
        probe_b(spark)
    spark.stop()


if __name__ == "__main__":
    main()
