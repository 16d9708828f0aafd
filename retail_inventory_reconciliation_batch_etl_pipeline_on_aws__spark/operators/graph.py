"""Iterative graph operators for dedup-group resolution.

Near-dup detection yields PAIRS; deduplication needs GROUPS (every doc
mapped to one canonical representative). That is connected components
over the similarity graph -- an iterative algorithm Spark has no single
operator for, implemented here as driver-bounded label propagation over
DataFrames: the classic "small-star" style min-label exchange. Data
stays distributed; the driver sees only a per-iteration convergence
count (one scalar), so the same loop runs on a billion-edge graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve connected components by iterative min-label propagation.

    Input: undirected edges (any orientation, duplicates fine).
    Output: (node, component) -- component = the smallest node id
    reachable from ``node``. Deterministic for any input order.

    Each round every node adopts the minimum label among itself and its
    neighbors; rounds repeat until a fixpoint (checked with one scalar
    ``count`` on the changed set -- the only driver-side data). Label
    diameter halves-ish per round, so max_iter=20 covers any component
    of practical diameter; an unconverged graph raises rather than
    returning silently-wrong groups.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize once; every join below is an equi-join on node id.
    # persisted: the edge set is re-joined every iteration, and its
    # lineage (often an expensive similarity join) must not re-execute
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).persist()

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("_nbr_min") < F.col("component")).alias("_changed"),
            )
        ).persist()
        n_changed = updated.where(F.col("_changed")).count()  # one scalar to driver
        new_labels = updated.select("node", "component").persist()
        labels.unpersist()
        updated.unpersist()
        labels = new_labels
        if n_changed == 0:
            labels.count()  # materialize before releasing the edge cache
            sym.unpersist()
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_groups(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Canonical dedup grouping from near-dup pairs: every involved doc
    mapped to its group's smallest doc id (``canonical_id``), plus the
    group size. Docs not in any pair are their own group and are not
    emitted (they carry no dedup action)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("component").agg(F.count("*").alias("group_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            F.col("group_size").cast("long").alias("group_size"),
        )
    )
