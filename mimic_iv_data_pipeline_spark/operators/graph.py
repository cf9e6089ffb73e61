"""Distributed graph primitives for the dedup family.

Near-dup pair generation (``operators/dedup.py``) yields an edge list;
corpus-level deduplication (C4 / Dolma / RefinedWeb recipes) needs the
*transitive closure* of those pairs — connected components — so each
cluster keeps exactly one canonical document.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): every round is two hash-aggregate +
join rounds over the edge list, and the edge set contracts toward star
graphs centered on each component's minimum id in O(log²) rounds
regardless of graph diameter — unlike naive min-label propagation,
whose round count is the graph *diameter* (a 10k-doc chain of
near-dups would need 10k shuffles; this needs ~a dozen). Each
iteration is ``localCheckpoint``-ed to truncate lineage, which is what
keeps the plan from growing exponentially in an iterative Spark job;
on a long-running cluster with executor loss you'd swap in reliable
``checkpoint()`` with a durable checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view of an edge list: both directions, no self-loops."""
    return (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _star(edges_sym: DataFrame, large: bool) -> DataFrame:
    """One large-star (``large=True``) or small-star round.

    Per node ``u`` with neighborhood Γ(u): ``m = min(Γ(u) ∪ {u})``.
    Large-star links every strictly-larger neighbor to ``m``;
    small-star links every ≤-neighbor and ``u`` itself to ``m``.
    Both are one groupBy + one join — pure shuffle-bounded DataFrame
    ops, no driver state.
    """
    mins = (
        edges_sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select("u", F.least(F.col("__mv"), F.col("u")).alias("m"))
    )
    joined = edges_sym.join(mins, "u")
    if large:
        out = joined.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = (
            joined.where(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected pair list.

    Returns ``(id, component)`` where ``component`` is the minimum id
    in the node's component (any orderable id type). ``nodes`` — a
    1-column DataFrame of ALL ids — adds isolated nodes as their own
    singleton components; without it only ids appearing in ``pairs``
    are labeled.

    Convergence is detected by edge-set fixpoint (count equal AND
    empty anti-diff — two cheap jobs per round on the checkpointed
    relation); ``max_iter`` is a safety valve far above the O(log²)
    bound, and hitting it raises rather than silently mislabeling.
    """
    edges = _symmetrize(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)
    n_edges = edges.count()

    converged = n_edges == 0
    for _ in range(max_iter):
        if converged:
            break
        stepped = _symmetrize(_star(_symmetrize(_star(edges, large=True)), large=False))
        stepped = stepped.localCheckpoint(eager=True)
        n_new = stepped.count()
        if n_new == n_edges and stepped.exceptAll(edges).isEmpty():
            converged = True
        edges, n_edges = stepped, n_new
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )

    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select(F.col("u").alias("id"), F.least(F.col("__mv"), F.col("u")).alias("component"))
    )
    if nodes is not None:
        node_ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
        labels = (
            node_ids.join(labels, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component"))
        )
    return labels


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Corpus-level near-dup removal: keep the minimum-id document of
    every connected component of ``pairs`` (the C4/Dolma "keep one per
    cluster" step). Non-clustered documents pass through untouched —
    the labels join is an equi-join on the id, broadcast when the
    cluster set is small."""
    labels = connected_components(pairs, src, dst)
    keep = labels.where(F.col("id") == F.col("component")).select("id")
    clustered = labels.select("id")
    return (
        docs.join(clustered.withColumnRenamed("id", id_col), id_col, "left_anti")
        .unionByName(docs.join(keep.withColumnRenamed("id", id_col), id_col, "left_semi"))
    )
