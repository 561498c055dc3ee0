"""Duplicate-cluster resolution: connected components over near-dup
pair edges (the step after MinHash/Jaccard pair generation in a corpus
dedup pipeline — pairs alone don't say WHICH rows form one duplicate
group; components do, and then "keep one doc per component" is a
groupBy).

Algorithm: iterative min-label propagation — every node adopts the
smallest label among itself and its neighbors until fixpoint.  Each
iteration is two plain shuffles (join + groupBy-min), so the work per
round is O(|E|) and rounds = graph diameter.  Near-dup graphs are
overwhelmingly tiny cliques (diameter ≤ 2-3), so this converges in a
handful of rounds.  At web scale the same loop with the large-star /
small-star reformulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) cuts diameter to O(log n) rounds; the
per-round dataflow below is unchanged.

The driver-side loop is coordination only (one count per round for the
convergence test); all data movement stays distributed.  Lineage is
truncated per round with localCheckpoint so the plan doesn't grow with
iteration count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min
    node id reachable.  Deterministic: the fixpoint is unique."""
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    sym = sym.localCheckpoint(eager=True)

    # Label init fused with propagation round 1: every node starts at
    # min(self, direct neighbors) — the same single groupBy shuffle a
    # bare `.distinct()` init would cost, but one full join+groupBy
    # round cheaper overall (sym carries both orientations, so min("d")
    # per s IS the neighbor minimum).
    labels = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.min("d").alias("mind"))
        .select("node", F.least("node", "mind").alias("component"))
        .localCheckpoint(eager=True)
    )

    # Convergence probe: labels only ever DECREASE, so the total label
    # sum is strictly monotone until the fixpoint — an unchanged sum
    # means converged.  One cheap agg per round instead of a
    # join+count.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_labels = (
            sym.join(labels, sym["d"] == labels["node"])
            .select(F.col("s").alias("node"), "component")
        )
        labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("component")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
