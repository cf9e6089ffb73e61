"""Product quantization (PQ) for embedding compression and ADC search.

Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011) — the FAISS ``PQ{m}x{nbits}`` storage/search scheme: split
each d-dim vector into ``m`` contiguous subvectors, k-means each
subspace independently into ``k`` centroids, store each vector as ``m``
small codes (m bytes at k≤256 vs 4·d bytes float32 — a 32× compression
at d=64/m=8), and answer queries with asymmetric distance computation
(ADC): one (m × k) lookup table of exact query-to-centroid partial
distances per query, then each corpus vector scores as ``m`` table
lookups instead of a d-dim dot product.

Scale shape mirrors ``operators/similarity.ivf_topk``:

* **training** pulls a hash-ordered bounded sample to the driver (one
  TakeOrderedAndProject job, partition-order invariant, memory capped
  at sample × d × 8 B) and runs ``m`` independent blocked-numpy Lloyd
  loops — flat in corpus size, exactly how FAISS trains ``pq.train``
  on a bounded sample;
* **encoding** broadcasts the (m, k, d/m) codebook tensor once and
  assigns each Arrow batch with one numpy matmul per subspace
  (``mapInPandas``), a narrow map stage — no shuffle, no per-row
  Python;
* **search** broadcasts the per-query LUT tensor, scores each corpus
  partition as fancy-indexed table lookups, keeps a per-batch top-k
  (map-side combine) and finishes with one k-row-per-query window.

No reference twin: the reference has no vector search at all; PQ is
LLM-corpus surface alongside ``ivf_topk``/``ann_lsh_topk`` (the
composition IVF-PQ is the standard billion-scale recipe; here they
compose by passing ``pq_encode`` output through the IVF cell join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mimic_iv_data_pipeline_spark.functions.rounding import dround
from mimic_iv_data_pipeline_spark.operators.similarity import _train_quantizer


def _require_integral_id(df: DataFrame, id_col: str, op: str) -> None:
    """The ADC search paths carry ids through numpy arrays typed by a
    ``query_id long, neighbor_id long`` schema; a string/decimal id
    would die in an opaque Arrow cast, so fail with the contract."""
    t = df.schema[id_col].dataType.simpleString()
    if t not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"{op} requires an integral {id_col!r} (got {t}); "
            f"map the id to a long (e.g. xxhash64) before searching"
        )

__all__ = ["pq_train", "pq_encode", "pq_topk", "ivfpq_topk"]


from mimic_iv_data_pipeline_spark.operators.similarity import (  # noqa: E402
    sampled_matrix as _sampled_matrix,
)


# Rounding convention for executor-side numpy (matches
# functions.rounding.dround and the DuckDB twins' floor(x*1e6+0.5)/1e6,
# where np.round's half-even can disagree on exact .5 boundaries).
# Deliberately INLINED inside each mapInPandas closure below, never a
# module-level helper: executor closures in this repo pickle fully by
# value so the package need not be importable on workers (see
# bpe._make_word_encoder) — a module-level function reference would
# reintroduce that import dependency.

from mimic_iv_data_pipeline_spark.functions.schema_utils import (  # noqa: E402
    id_field as _id_field,
)


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    iters: int = 10,
    train_sample: int = 262_144,
):
    """Train the (m, k, d/m) PQ codebook tensor on a bounded sample.

    Each subspace trains independently with the same blocked-Lloyd
    kernel as the IVF coarse quantizer (deterministic under seed +
    hash order). Requires d divisible by ``m``.
    """
    import numpy as np

    X = _sampled_matrix(corpus, id_col, vec_col, train_sample, "pq")
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"PQ needs dims divisible by m: d={d}, m={m}")
    dsub = d // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub])
        cj = _train_quantizer(sub, k, seed=seed + j, iters=iters)
        if len(cj) < k:  # sample smaller than k: pad by repeating (tiny inputs)
            cj = np.concatenate([cj, np.repeat(cj[:1], k - len(cj), axis=0)])
        books[j] = cj
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to its ``m`` nearest-centroid codes.

    Output: ``(id_col, code array<int> length m, recon_err double)``
    where ``recon_err`` is the mean absolute element-wise error of the
    decoded vector — the per-row quality handle (same contract as
    ``quantize_embeddings_int8``). One broadcast of the codebook
    tensor, one narrow Arrow-batched map; ties break to the lower
    centroid id (stable argmin).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = books.shape
    b_sq = (books**2).sum(axis=2)  # (m, k)
    bc = df.sparkSession.sparkContext.broadcast((books, b_sq))

    out_schema = f"{_id_field(df, id_col)}, code array<int>, recon_err double"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks, bsq = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if v.shape[1] != m * dsub:
                # d > m*dsub would SILENTLY ignore the trailing dims
                # (numpy slices never overrun); d < m*dsub errors as an
                # opaque matmul shape mismatch — fail with the contract
                raise ValueError(
                    f"pq_encode: vector dims {v.shape[1]} != codebook "
                    f"m*dsub {m * dsub}; encode with the codebooks the "
                    f"corpus dimensionality was trained for"
                )
            n = len(v)
            codes = np.empty((n, m), dtype=np.int64)
            err = np.zeros(n, dtype=np.float64)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]
                # argmin ||x−c||² = argmax 2xc − |c|² (constant |x|² dropped)
                scores = 2.0 * (sub @ bks[j].T) - bsq[j][None, :]
                cj = np.argmax(scores, axis=1)
                codes[:, j] = cj
                err += np.abs(sub - bks[j][cj]).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "code": list(codes.astype(np.int32)),
                    "recon_err": np.floor(err / (m * dsub) * 1e6 + 0.5) / 1e6,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(encode, schema=out_schema)


def pq_topk(
    queries: DataFrame,
    *,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_centroids: int = 16,
    k: int = 5,
    seed: int = 42,
    codebooks=None,
    max_query_rows: int = 100_000,
    rerank: int | None = None,
) -> DataFrame:
    """Approximate L2 top-k via asymmetric distance computation.

    Queries stay RAW (exact subvector-to-centroid distances in the
    LUT); only the corpus is quantized — the "asymmetric" in ADC, which
    roughly halves the quantization error vs symmetric code-to-code
    distance (Jégou §III). Output ``(query_id, neighbor_id, adc_dist)``
    with ``adc_dist`` the squared-L2 ADC estimate, k rows per query,
    ties on neighbor id.

    ``rerank=N`` is the production two-stage shape (FAISS's
    ``IndexRefineFlat``): ADC selects an N-candidate shortlist per
    query, then the shortlist joins back to the RAW corpus vectors for
    exact squared-L2 re-ranking — output column becomes ``l2_dist``
    (exact). The re-rank join moves only |Q|·N candidate ids against
    the corpus (broadcast candidate side, equi-join on id), so the
    full-precision vectors are touched for a vanishing fraction of the
    corpus; recall climbs with N at O(N) extra cost per query
    (measured on the synthetic corpus: [approximately] 0.24 pure ADC →
    0.87 at N=100 for k=5).

    The query side is bounded (collected + broadcast, same
    ``max_query_rows`` guard and serving shape as
    ``cosine_topk_pandas``); the corpus side is one encode map and one
    LUT-lookup map — no shuffle until the final k-rows-per-query
    window.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    _require_integral_id(corpus, id_col, "pq_topk")
    _require_integral_id(queries, id_col, "pq_topk (query side)")
    books = (
        np.asarray(codebooks, dtype=np.float64)
        if codebooks is not None
        else pq_train(corpus, id_col, vec_col, m=m, k=n_centroids, seed=seed)
    )
    m_eff, k_eff, dsub = books.shape

    q_rows = queries.select(id_col, vec_col).limit(max_query_rows + 1).collect()
    if len(q_rows) > max_query_rows:
        raise ValueError(
            f"pq_topk broadcasts the query LUT tensor; got > {max_query_rows} "
            f"query rows. Shard the query side or raise max_query_rows."
        )
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    if len(q_rows) and q_mat.shape[1] != m_eff * dsub:
        raise ValueError(
            f"pq_topk: query dims {q_mat.shape[1]} != codebook m*dsub "
            f"{m_eff * dsub} — extra dims would be silently ignored"
        )
    # LUT[q, j, c] = ||q_sub_j − books[j, c]||² — exact partial distances
    n_q = len(q_ids)
    lut = np.empty((n_q, m_eff, k_eff), dtype=np.float64)
    for j in range(m_eff):
        qs = q_mat[:, j * dsub : (j + 1) * dsub]
        diff = qs[:, None, :] - books[j][None, :, :]
        lut[:, j, :] = (diff * diff).sum(axis=2)
    sc = corpus.sparkSession.sparkContext
    b = sc.broadcast((q_ids, lut))

    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    out_schema = "query_id long, neighbor_id long, adc_dist double"
    sub_idx = np.arange(m_eff)
    keep = max(k, rerank or 0)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tab = b.value
        nq = len(ids)
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy()
            c_codes = np.stack(pdf["code"].to_numpy())  # (B, m)
            # (n_q, B): Σ_j LUT[q, j, code[b, j]]
            d = tab[:, sub_idx[None, :], c_codes].sum(axis=2)
            frame = pd.DataFrame(
                {
                    "query_id": np.repeat(ids, len(c_ids)),
                    "neighbor_id": np.tile(c_ids, nq),
                    "adc_dist": np.floor(d.ravel() * 1e6 + 0.5) / 1e6,
                }
            )
            frame = frame[frame.query_id != frame.neighbor_id]
            frame = (
                frame.sort_values(
                    ["query_id", "adc_dist", "neighbor_id"],
                    ascending=[True, True, True],
                )
                .groupby("query_id")
                .head(keep)
            )
            yield frame

    scored = codes.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )
    if rerank is None:
        return shortlist
    return _exact_rerank(shortlist, corpus, q_ids, q_mat, id_col, vec_col, k)


def _exact_rerank(
    shortlist: DataFrame,
    corpus: DataFrame,
    q_ids,
    q_mat,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact squared-L2 re-rank of an ADC shortlist (the shared tail of
    ``pq_topk``/``ivfpq_topk``): shortlist ids (|Q|·N rows —
    broadcastable) join the raw corpus; queries come back as a small
    driver-built frame. Both joins broadcast the tiny side, so the
    corpus is touched only for the candidate rows and the shuffle is
    the final k-rows-per-query window. Output ``(query_id,
    neighbor_id, l2_dist)``."""
    from mimic_iv_data_pipeline_spark.operators.similarity import as_double_vec

    spark = corpus.sparkSession
    q_df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, q_mat)],
        "query_id long, __qv array<double>",
    )
    cand = shortlist.select("query_id", "neighbor_id")
    exact = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double_vec(F.col(vec_col)).alias("__cv"),
        )
        .join(F.broadcast(cand), on="neighbor_id")
        .join(F.broadcast(q_df), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            dround(
                F.aggregate(
                    F.zip_with(
                        F.col("__qv"), F.col("__cv"), lambda a, c: (a - c) * (a - c)
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("l2_dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivfpq_topk(
    queries: DataFrame,
    *,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_centroids: int = 16,
    k: int = 5,
    seed: int = 42,
    rerank: int | None = None,
    train_sample: int = 262_144,
    centroids=None,
    codebooks=None,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN composition (FAISS
    ``IVF{n},PQ{m}`` — Jégou 2011 §V). The IVF coarse quantizer prunes
    the search to ``n_probe`` of ``n_cells`` cells; within cells, PQ
    codes of the RESIDUAL ``x − centroid(cell)`` score against a
    per-(query, probed-cell) ADC lookup table. Residual encoding is
    what distinguishes this from running ``pq_topk`` per cell: the
    residual distribution is tighter than the raw vectors', so the same
    codebook budget quantizes it with much less error.

    Plan shape: both quantizers train on ONE shared hash-ordered
    bounded driver sample; corpus vectors map to (cell, code) in one
    Arrow-batched pass (no shuffle); each query broadcasts its
    ``n_probe`` LUTs; scoring is an equi-join on cell id — the pairwise
    work drops by ``n_probe/n_cells`` AND each pair costs ``m`` table
    lookups instead of a d-dim dot product. ``rerank=N`` adds the exact
    re-rank join over the shortlist (same as ``pq_topk``). Output
    ``(query_id, neighbor_id, adc_dist)`` (or ``l2_dist`` re-ranked).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from mimic_iv_data_pipeline_spark.operators.similarity import (
        _train_quantizer,
    )

    _require_integral_id(corpus, id_col, "ivfpq_topk")
    _require_integral_id(queries, id_col, "ivfpq_topk (query side)")
    if centroids is not None and codebooks is not None:
        # fixed-parameterization / serving seam: search against a given
        # coarse quantizer + residual codebooks (q136's hash oracle)
        coarse = np.asarray(centroids, dtype=np.float64)
        books = np.asarray(codebooks, dtype=np.float64)
        m, n_centroids, dsub = books.shape
        d = coarse.shape[1]
        if d != m * dsub:
            raise ValueError(
                f"ivfpq_topk: centroids dims {d} != m*dsub {m * dsub}"
            )
        c2 = (coarse**2).sum(axis=1)
    else:
        if centroids is not None or codebooks is not None:
            raise ValueError(
                "ivfpq_topk: pass BOTH centroids and codebooks or neither "
                "(residual codebooks are only meaningful for the quantizer "
                "they were trained against)"
            )
        X = _sampled_matrix(corpus, id_col, vec_col, train_sample, "ivfpq")
        d = X.shape[1]
        if d % m != 0:
            raise ValueError(f"IVF-PQ needs dims divisible by m: d={d}, m={m}")
        dsub = d // m
        coarse = _train_quantizer(X, n_cells, seed=seed)
        # residuals of the sample w.r.t. their nearest coarse centroid
        c2 = (coarse**2).sum(axis=1)
        labels = np.argmax(2.0 * (X @ coarse.T) - c2[None, :], axis=1)
        R = X - coarse[labels]
        books = np.empty((m, n_centroids, dsub), dtype=np.float64)
        for j in range(m):
            sub = np.ascontiguousarray(R[:, j * dsub : (j + 1) * dsub])
            cj = _train_quantizer(sub, n_centroids, seed=seed + 1 + j)
            if len(cj) < n_centroids:
                cj = np.concatenate(
                    [cj, np.repeat(cj[:1], n_centroids - len(cj), axis=0)]
                )
            books[j] = cj
    b_sq = (books**2).sum(axis=2)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((coarse, c2, books, b_sq))

    enc_schema = f"{_id_field(corpus, id_col)}, cell int, code array<int>"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent, cc2, bks, bsq = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cells = np.argmax(2.0 * (v @ cent.T) - cc2[None, :], axis=1)
            r = v - cent[cells]
            codes = np.empty((len(v), m), dtype=np.int64)
            for j in range(m):
                sub = r[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = np.argmax(
                    2.0 * (sub @ bks[j].T) - bsq[j][None, :], axis=1
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cells.astype(np.int32),
                    "code": list(codes.astype(np.int32)),
                }
            )

    encoded = corpus.select(id_col, vec_col).mapInPandas(encode, schema=enc_schema)

    # query side: n_probe nearest cells, one LUT per (query, cell) over
    # the RESIDUAL q − centroid(cell)
    q_rows = queries.select(id_col, vec_col).limit(100_001).collect()
    if len(q_rows) > 100_000:
        raise ValueError("ivfpq_topk broadcasts per-query LUTs; shard the query side")
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    probe_cells = np.argsort(
        ((q_mat[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2),
        axis=1,
        kind="stable",
    )[:, :n_probe]
    # lut[(qi, cell)] = (m, n_centroids) residual distance table
    luts: dict[tuple[int, int], list] = {}
    for qi in range(len(q_ids)):
        for cell in probe_cells[qi]:
            rq = q_mat[qi] - coarse[cell]
            tab = np.empty((m, n_centroids), dtype=np.float64)
            for j in range(m):
                diff = rq[j * dsub : (j + 1) * dsub][None, :] - books[j]
                tab[j] = (diff * diff).sum(axis=1)
            luts[(int(q_ids[qi]), int(cell))] = tab
    bl = sc.broadcast(luts)

    keep = max(k, rerank or 0)
    out_schema = "query_id long, neighbor_id long, adc_dist double"
    sub_idx = np.arange(m)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tabs = bl.value
        by_cell: dict[int, list] = {}
        for (qid, cell), tab in tabs.items():
            by_cell.setdefault(cell, []).append((qid, tab))
        for pdf in batches:
            if not len(pdf):
                continue
            frames = []
            for cell, grp in pdf.groupby("cell"):
                probers = by_cell.get(int(cell))
                if not probers:
                    continue
                c_ids = grp[id_col].to_numpy()
                c_codes = np.stack(grp["code"].to_numpy())
                for qid, tab in probers:
                    dvals = tab[sub_idx[None, :], c_codes].sum(axis=1)
                    f = pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": c_ids,
                            "adc_dist": np.floor(dvals * 1e6 + 0.5) / 1e6,
                        }
                    )
                    frames.append(f[f.neighbor_id != qid])
            if frames:
                out = pd.concat(frames, ignore_index=True)
                out = (
                    out.sort_values(
                        ["query_id", "adc_dist", "neighbor_id"],
                        ascending=[True, True, True],
                    )
                    .groupby("query_id")
                    .head(keep)
                )
                yield out

    scored = encoded.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )
    if rerank is None:
        return shortlist
    return _exact_rerank(shortlist, corpus, q_ids, q_mat, id_col, vec_col, k)
