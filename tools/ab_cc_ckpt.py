#!/usr/bin/env python3
"""A/B the connected-components input materialization strategy (r14).

q_dup_clusters' CC kernel is ~2.1 s of its 3.1 s wall at sf0.1
(tools/ab_dupclusters.py) and its first step eagerly localCheckpoints
the SYMMETRIZED edge relation — 2·|E| rows — purely so the expensive
upstream edge build isn't recomputed by the two consumers (labels0,
quotient).  The same protection is had by checkpointing the edge list
ITSELF (|E| rows, half the write) and unioning the two orientations
LAZILY from the checkpoint: each consumer then scans local checkpoint
blocks twice instead of once, but the blocks are half the size and
the eager materialization pass writes half the rows.

Arms (interleaved within each run, plans rebuilt per run, identical
output asserted at every run):

  A  shipped — sym = (e ∪ flip(e)).localCheckpoint(eager)
  B  half    — e0 = e.localCheckpoint(eager); sym = e0 ∪ flip(e0)

Usage: python tools/ab_cc_ckpt.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark


def _cc_over(sym, labels_parent):
    """The shipped pipeline from labels0 onward (operators/graph.py),
    shared by both arms — the arms differ only in how `sym` is
    materialized."""
    labels0 = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.min("d").alias("mind"))
        .select("node", F.least("node", "mind").alias("component"))
        .localCheckpoint(eager=True)
    )
    quotient = (
        sym.join(
            labels0.select(F.col("node").alias("s"), F.col("component").alias("ls")),
            "s",
        )
        .join(
            labels0.select(F.col("node").alias("d"), F.col("component").alias("ld")),
            "d",
        )
        .filter(F.col("ls") != F.col("ld"))
        .select(F.col("ls").alias("s"), F.col("ld").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if quotient.isEmpty():
        return labels0
    labels = (
        quotient.groupBy(F.col("s").alias("node"))
        .agg(F.min("d").alias("mind"))
        .select("node", F.least("node", "mind").alias("component"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(20):
        neighbor_labels = quotient.join(
            labels, quotient["d"] == labels["node"]
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
    roots = labels.select(
        F.col("node").alias("_cls"), F.col("component").alias("_root")
    )
    return labels0.join(
        roots, labels0["component"] == roots["_cls"], "left"
    ).select("node", F.coalesce("_root", "component").alias("component"))


def arm_a(edges):
    sym = (
        edges.select(F.col("a_id").alias("s"), F.col("b_id").alias("d"))
        .union(edges.select(F.col("b_id").alias("s"), F.col("a_id").alias("d")))
        .localCheckpoint(eager=True)
    )
    return _cc_over(sym, None)


def arm_b(edges):
    e0 = edges.select(
        F.col("a_id").alias("s"), F.col("b_id").alias("d")
    ).localCheckpoint(eager=True)
    sym = e0.union(e0.select(F.col("d").alias("s"), F.col("s").alias("d")))
    return _cc_over(sym, None)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()

    from spark_streaming_join_example_spark.plans.advanced import _dup_edges

    canon_a = canon_b = None
    t_a, t_b = [], []
    for i in range(n_runs + 1):  # run 0 = warmup + equality check
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ra = arm_a(_dup_edges(spark, sf_dir)).collect()
        da = time.perf_counter() - t0
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rb = arm_b(_dup_edges(spark, sf_dir)).collect()
        db = time.perf_counter() - t0
        if i == 0:
            canon_a = sorted(map(tuple, ra))
            canon_b = sorted(map(tuple, rb))
            assert canon_a == canon_b, "arms diverge"
            continue
        assert sorted(map(tuple, ra)) == canon_a
        assert sorted(map(tuple, rb)) == canon_a
        t_a.append(da)
        t_b.append(db)

    med = statistics.median
    print(
        f"A sym-ckpt  median {med(t_a):.3f}s (min {min(t_a):.3f} max {max(t_a):.3f})\n"
        f"B half-ckpt median {med(t_b):.3f}s (min {min(t_b):.3f} max {max(t_b):.3f})\n"
        f"B/A = {med(t_b) / med(t_a):.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
