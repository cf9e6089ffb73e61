"""Registry/driver-contract consistency guards."""

from __future__ import annotations

import re
from pathlib import Path

from mimic_iv_data_pipeline_spark.queries import all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent


def test_every_oracle_has_a_query():
    queries, oracles = all_queries(), all_oracles()
    assert set(oracles) <= set(queries)
    # only the hash-based / approximate ops may lack an oracle
    no_oracle = set(queries) - set(oracles)
    # q56 graduated in r3: exact column + a deterministic tolerance
    # boolean give the HLL sketch a real (partial) oracle row
    assert no_oracle == {
        "q40_minhash_lsh",
        "q41_simhash",
        "q44_ann_lsh",
        "q53_ann_ivf",
        "q60_embedding_neardup_lsh",
        "q87_semantic_dedup",  # k-means cells: no SQL twin
        "q91_pca_project",  # eigenvector sign/order is engine-specific
        "q93_bpe_tokenize",  # iterative merge induction: no SQL twin
        "q102_pq_encode",  # k-means codebooks: no SQL twin
        "q103_pq_topk",
        "q104_pq_rerank",
        "q105_wordpiece",  # iterative merge induction: no SQL twin
        "q106_unigram_lm",  # EM fit: no SQL twin
        "q107_incremental_dedup",  # xxhash64 signatures: no SQL twin
        "q114_ivfpq",  # k-means quantizers: no SQL twin
        "q115_kmeans",  # iterative fit: no SQL twin
        "q122_rag_retrieve",  # IVF path: no SQL twin
    }


def test_readme_references_real_queries():
    """Every qNN mentioned in README/PERF must exist in the registry —
    guards the coverage table against drift."""
    queries = all_queries()
    prefixes = {name.split("_")[0] for name in queries}
    for doc in ["README.md", "PERF.md"]:
        text = (REPO / doc).read_text()
        for ref in set(re.findall(r"\bq\d{2}\b", text)):
            assert ref in prefixes, f"{doc} references unknown query {ref}"


def test_driver_shim_exports():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_shim", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert set(mod.oracle_sql()) <= set(mod.queries())
    assert len(mod.queries()) == len(all_queries())
