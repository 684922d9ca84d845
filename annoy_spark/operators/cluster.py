"""Connected components via alternating large-star / small-star.

The clustering stage of the dedup pipeline (SURVEY.md §3.4). Annoy has no
clustering; this is the union-find the north rule adds on top of verified
duplicate edges. Algorithm: Kiveris et al., "Connected Components in
MapReduce and Beyond" (SOCC'14) — converges in O(log n) rounds, each round
two shuffles (a groupBy-min and a join), no per-group materialization:

- large-star: point every neighbor v > u at min(N(u) ∪ {u})
- small-star: direct edges high->low, point every v in N(u) ∪ {u} at the min

Skew notes (100 TB posture): the per-node aggregate is min() — map-side
combined, so a mega-hub costs one partial per task, not a collected list.
The join back is u-keyed; AQE skew-join splitting handles hub keys. Each
iteration localCheckpoints to cut lineage (the CC-loop hazard in SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Direct every edge high -> low, drop loops and duplicates."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"),
            F.least("u", "v").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    bi = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bi.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        bi.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # input contract: edges already directed high -> low and loop-free
    # (_large_star emits (v, m) with v > u >= m); duplicates are tolerated —
    # min() ignores them and the caller's _canonical dedups the output — so
    # the old canonicalize-first pass (an extra distinct exchange per
    # iteration) is skipped (guide §2.4: remove shuffles outright).
    dir_ = edges
    mins = dir_.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        dir_.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return moved.union(self_edges)


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = 50,
    node_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Cluster assignment: (node_col, cluster_col=min node id in component).

    `edges` must have columns u, v. `nodes` (optional, single column
    node_col) adds singleton components. Deterministic: output depends only
    on the edge *set*, never on partitioning or row order.
    """
    # lazy localCheckpoint: the checksum action right after materializes the
    # checkpoint in the SAME job, halving the actions per iteration (the
    # eager variant ran a materialize job plus a checksum job)
    e = _canonical(edges).localCheckpoint(eager=False)
    prev = _checksum(e)
    for _ in range(max_iters):
        e = _canonical(_small_star(_large_star(e))).localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} iters")

    # At fixpoint every edge is (member, root): star graphs around minima.
    # Roots label themselves (the root->root loop was dropped as a self-edge).
    labels = (
        e.select(F.col("u").alias(node_col), F.col("v").alias(cluster_col))
        .union(e.select(F.col("v").alias(node_col), F.col("v").alias(cluster_col)))
        .distinct()
    )
    if nodes is not None:
        nodes = nodes.select(F.col(node_col).cast("long")).distinct()
        singletons = nodes.join(labels, node_col, "left_anti").select(
            F.col(node_col), F.col(node_col).alias(cluster_col)
        )
        labels = labels.unionByName(singletons)
    return labels
