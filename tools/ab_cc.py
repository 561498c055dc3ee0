"""A/B probe for the connected-components quotient contraction
(round 12, this session): plain min-label propagation re-shuffles the
FULL edge list every round; the shipped variant contracts the graph
onto its init-round label classes first and iterates over the (tiny)
quotient.  This probe measures both on the same edge sets at growing
replica counts so the claim "per-round work drops from O(|E|) to
O(|quotient|)" is backed by numbers, not prose.

Arms, each rebuilt from the DSL per timed run (the r6 timing lesson):

  A  plain loop      — init + O(diameter) rounds over all |E| edges
                       (re-implemented here verbatim from the
                       pre-contraction operators/graph.py);
  B  shipped variant — init + one contraction pass + the same loop
                       over the quotient edges only.

Edge sets: the q_dup_clusters near-dup graph (clique-heavy, the case
contraction targets) replicated K× with disjoint id offsets — K·|E|
edges, K× the components, identical structure per replica, so
per-unit work should stay flat if an arm scales linearly.

Checks: arm A and arm B must return IDENTICAL (node, component) sets
at every K (the fixpoint is unique), and the quotient edge count is
reported so the contraction ratio is visible.

Output: one JSON line; findings land in SCALE.md §Round-12.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.operators.graph import (  # noqa: E402
    connected_components,
)


def plain_label_propagation(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """The pre-contraction loop, verbatim: fused init, then join +
    groupBy-min over ALL edges per round until the label sum is
    stable.  Kept here (not in the package) purely as the measurement
    baseline."""
    sym = edges.select(
        F.col("a_id").alias("s"), F.col("b_id").alias("d")
    ).union(
        edges.select(F.col("b_id").alias("s"), F.col("a_id").alias("d"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.min("d").alias("mind"))
        .select("node", F.least("node", "mind").alias("component"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym["d"] == labels["node"]
        ).select(F.col("s").alias("node"), "component")
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


def replicated_edges(spark, sf_dir: str, k: int) -> DataFrame:
    """The q_dup_clusters edge set replicated k× with disjoint id
    offsets — identical per-replica structure, k× the edges and
    components."""
    from spark_streaming_join_example_spark.plans.advanced import (
        _dup_edges,
    )

    base = _dup_edges(spark, sf_dir).localCheckpoint(eager=True)
    offset = 1_000_000
    parts = [
        base.select(
            (F.col("a_id") + i * offset).alias("a_id"),
            (F.col("b_id") + i * offset).alias("b_id"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))
    ks = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_AB_KS", "1,2,4"
    ).split(",")]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"sf_dir": sf_dir, "runs": runs, "arms": {}}
    for k in ks:
        e = replicated_edges(spark, sf_dir, k)
        n_edges = e.count()

        a_times, b_times = [], []
        a_set = b_set = None
        for _ in range(runs):
            t0 = time.time()
            a = plain_label_propagation(e)
            a_set = frozenset(
                (r.node, r.component) for r in a.collect()
            )
            a_times.append(time.time() - t0)

            t0 = time.time()
            b = connected_components(e)
            b_set = frozenset(
                (r.node, r.component) for r in b.collect()
            )
            b_times.append(time.time() - t0)

        assert a_set == b_set, f"fixpoint mismatch at K={k}"
        result["arms"][f"K={k}"] = {
            "edges": n_edges,
            "nodes": len(a_set),
            "plain_sec": round(statistics.median(a_times), 3),
            "contracted_sec": round(statistics.median(b_times), 3),
            "plain_spread": [
                round(min(a_times), 3),
                round(max(a_times), 3),
            ],
            "contracted_spread": [
                round(min(b_times), 3),
                round(max(b_times), 3),
            ],
            "identical_labels": True,
        }
        print(
            f"K={k}: edges={n_edges} plain="
            f"{result['arms'][f'K={k}']['plain_sec']}s contracted="
            f"{result['arms'][f'K={k}']['contracted_sec']}s",
            file=sys.stderr,
        )

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
