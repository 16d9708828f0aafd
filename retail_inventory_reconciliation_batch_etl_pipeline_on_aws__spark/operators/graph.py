"""Iterative graph operators for dedup-group resolution.

Near-dup detection yields PAIRS; deduplication needs GROUPS (every doc
mapped to one canonical representative). That is connected components
over the similarity graph -- an iterative algorithm Spark has no single
operator for, implemented here as the alternating large-star /
small-star edge-rewriting algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which converges in O(log)
rounds in the component size -- not O(diameter) like plain min-label
propagation, where a 1000-hop chain needs 1000 rounds. Data stays
distributed; the driver sees only a per-iteration convergence scalar,
so the same loop runs on a billion-edge graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: for each node u, connect every strictly-larger
    neighbor to m(u) = min(N(u) + {u}). Operates on the symmetrized
    neighborhood so both endpoints act as the center."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_nmin"))
    mins = mins.select("u", F.least(F.col("u"), F.col("_nmin")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient edges larger-endpoint-first, then for each
    center u link u and all its (smaller) neighbors to m = min(N(u))."""
    oriented = (
        e.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve connected components by alternating large-star/small-star.

    Input: undirected edges (any orientation, duplicates fine).
    Output: (node, component) -- component = the smallest node id
    reachable from ``node``. Deterministic for any input order.

    Each round rewrites the edge set with one large-star then one
    small-star pass; the edge set contracts toward a star per component
    (every node pointing at the component minimum), with label distance
    shrinking multiplicatively -- O(log) rounds in component size, so
    ``max_iter=20`` covers components of ~10^6 nodes even in the
    worst (path-shaped) case, vs O(diameter) for plain min-label
    propagation. Convergence = edge set unchanged, checked with two
    one-scalar ``count`` actions per round (the only driver-side data);
    an unconverged graph raises rather than returning silently-wrong
    groups.

    Nodes appearing ONLY in self-loop edges (u == u) are still emitted,
    as their own singleton component -- the star passes drop self-loops,
    so these are captured up front and unioned back at the end.
    """
    # nodes whose every edge is a self-loop would otherwise vanish when
    # the u != v filter strips their edges; checkpointed ids-only frame
    selfloop_nodes = (
        edges.where(F.col(src) == F.col(dst))
        .select(F.col(src).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        # eager localCheckpoint, not persist: each round's plan references
        # e ~6 times (symmetrize + two star joins), so without lineage
        # truncation the logical plan grows ~6^rounds and Catalyst
        # analysis itself becomes the bottleneck long before execution.
        # Checkpointing also guarantees the input lineage (often an
        # expensive similarity join) never re-executes.
        .localCheckpoint(eager=True)
    )
    prev_count = e.count()
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # fixpoint test as two driver scalars: equal cardinality AND
        # empty one-sided difference (both sides distinct by construction)
        new_count = new_e.count()
        changed = (
            new_count != prev_count or new_e.subtract(e).limit(1).count() > 0
        )
        e = new_e
        prev_count = new_count
        if not changed:
            # star graph: every edge is (node, component_min); roots
            # appear only on the v side and label themselves
            labeled = e.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            ).unionByName(
                e.select(F.col("v").alias("node"), F.col("v").alias("component"))
                .distinct()
            ).distinct()
            # self-loop-only nodes: singleton components (nodes with any
            # real edge are already labeled; anti-join filters those out)
            orphans = selfloop_nodes.join(labeled, "node", "left_anti")
            return labeled.unionByName(
                orphans.select("node", F.col("node").alias("component"))
            )
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
