#!/usr/bin/env python3
"""A/B the r16 loop-job fusion in operators/graph.py (guide §1.2).

Every iterative graph loop used to pay TWO driver-scheduled jobs per
round: an eager ``localCheckpoint`` materialization plus a separate
convergence-probe action (sum / count / isEmpty).  The r16 change
makes the checkpoint LAZY and lets the probe action materialize it —
the probe scans every partition, so the checkpoint is complete
exactly as under eager, at half the per-round job count (and the
same fusion trims the setup jobs: sym's checkpoint rides labels0's
materialization, quotient's rides the emptiness count).

Arms (interleaved within each run, plans rebuilt from the DSL per
timed run — the ab_tumbling protocol; identical output asserted on
the first run):

  A  (old) eager checkpoints + separate probe actions — the r15 HEAD
     implementations of connected_components / kcore / bfs_hops,
     inlined below and monkeypatched into operators.graph so the
     registered plans (late imports) pick them up.
  B  (new) lazy checkpoints, probe action materializes — what
     operators/graph.py ships now.

Per (query, arm, run) the tool reports wall seconds AND the number of
Spark jobs the invocation scheduled (setJobGroup +
statusTracker.getJobIdsForGroup) — the VERDICT r15 item-3 "probe
prints job count" evidence.

RESULT (2026-08-18, sf0.1).  End-to-end (5 interleaved runs, identity
OK): q_dup_clusters jobs 51 -> 46 wall 0.987x, q_kcore jobs 15 -> 13
wall 0.998x, q_bfs_hops jobs 28 -> 28 wall 1.022x — wall deltas all
inside the box noise (the un-shared edge build dominates each run).
CC kernel isolated over a pre-checkpointed edge relation (the
/tmp/ab_cc_kernel variant of this protocol, 15 interleaved runs):
A(old) med 2.553 s [1.94..4.42] vs B(new) med 2.371 s [1.89..3.11] =
0.929x, whole distribution shifted left (an earlier 9-run set on a
noisier window read 1.096x — overlapping either way).  ADOPTED on
the deterministic job-count reduction (each saved job is a driver
scheduling round-trip — pure fixed cost that grows with cluster
coordination latency at 100 TB) with the wall-time delta honestly
recorded as inside local noise.  Note on counting: AQE runs each
exchange stage of a DataFrame action as its OWN job, while an eager
localCheckpoint materializes through a single RDD-level job — so the
fusion saves exactly the probe action's job(s), and bfs_hops (whose
count() spans more AQE stages than its old isEmpty()) nets zero.

Usage: python tools/ab_loopjobs.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.operators import graph as G
from spark_streaming_join_example_spark.plans.registry import queries_dict

QUERIES = ("q_dup_clusters", "q_kcore", "q_bfs_hops")


# ---------------------------------------------------------------------------
# Arm A: the r15-HEAD (a4c3fdc) implementations — eager checkpoints,
# separate probe actions.  Copied verbatim minus comments.
# ---------------------------------------------------------------------------


def old_connected_components(edges, src="a_id", dst="b_id", max_iter=20,
                             strict=False):
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    sym = sym.localCheckpoint(eager=True)
    labels0 = (
        sym.groupBy(F.col("s").alias("node"))
        .agg(F.min("d").alias("mind"))
        .select("node", F.least("node", "mind").alias("component"))
        .localCheckpoint(eager=True)
    )
    quotient = (
        sym.join(labels0.select(F.col("node").alias("s"),
                                F.col("component").alias("ls")), "s")
        .join(labels0.select(F.col("node").alias("d"),
                             F.col("component").alias("ld")), "d")
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
    converged = False
    for _ in range(max_iter):
        neighbor_labels = (
            quotient.join(labels, quotient["d"] == labels["node"])
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
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        warnings.warn("old cc: unconverged", G.ConvergenceWarning)
    roots = labels.select(
        F.col("node").alias("_cls"), F.col("component").alias("_root")
    )
    return (
        labels0.join(roots, labels0["component"] == roots["_cls"], "left")
        .select("node", F.coalesce("_root", "component").alias("component"))
    )


def old_kcore(edges, k=2, src="u", dst="v", max_iter=30,
              input_distinct_half=False):
    if input_distinct_half:
        half = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        e = half.union(
            half.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).localCheckpoint(eager=True)
    else:
        sym = (
            edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e = sym.union(
            sym.select(F.col("d").alias("s"), F.col("s").alias("d"))
        ).distinct().localCheckpoint(eager=True)
    prev_n = e.count()
    converged = prev_n == 0
    for _ in range(max_iter):
        if converged:
            break
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        e = (
            e.join(keep, "s", "left_semi")
            .join(keep.select(F.col("s").alias("d")), "d", "left_semi")
            .localCheckpoint(eager=True)
        )
        n = e.count()
        if n == prev_n or n == 0:
            converged = True
        prev_n = n
    if not converged:
        warnings.warn("old kcore: unconverged", G.ConvergenceWarning)
    return e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("core_deg")
    )


def old_bfs_hops(edges, max_depth=3, source=None):
    edges = edges.select("u", "v").persist()
    src = (
        source if source is not None
        else edges.agg(F.min("u").alias("node"))
    )
    frontier = src.withColumn("dist", F.lit(0))
    visited = frontier
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier.select(F.col("node").alias("u")), "u")
            .select(F.col("v").alias("node"))
            .join(visited.select("node"), "node", "left_anti")
            .distinct()
            .withColumn("dist", F.lit(d))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


OLD = {
    "connected_components": old_connected_components,
    "kcore": old_kcore,
    "bfs_hops": old_bfs_hops,
}
NEW = {n: getattr(G, n) for n in OLD}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qd = queries_dict()
    tracker = spark.sparkContext.statusTracker()

    def run(name, arm, tag):
        for fn_name, fn in (OLD if arm == "A" else NEW).items():
            setattr(G, fn_name, fn)
        try:
            spark.catalog.clearCache()
            group = f"{name}-{arm}-{tag}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = qd[name](spark, sf_dir)
            rows = df.toArrow()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobGroup("", "")
            n_jobs = len(tracker.getJobIdsForGroup(group))
            return dt, n_jobs, rows
        finally:
            for fn_name, fn in NEW.items():
                setattr(G, fn_name, fn)

    res = {q: {"A": [], "B": [], "jobs": {}} for q in QUERIES}
    for i in range(n_runs):
        order = ("A", "B") if i % 2 == 0 else ("B", "A")
        for q in QUERIES:
            for arm in order:
                dt, n_jobs, rows = run(q, arm, i)
                res[q][arm].append(dt)
                res[q]["jobs"].setdefault(arm, n_jobs)
                if i == 0:
                    res[q].setdefault("out", {})[arm] = rows
            # identity: full multiset compare on the first run
            if i == 0:
                a = sorted(map(str, res[q]["out"]["A"].to_pylist()))
                b = sorted(map(str, res[q]["out"]["B"].to_pylist()))
                assert a == b, f"{q}: arm outputs differ!"
                print(f"{q}: identity OK ({len(a)} rows)", flush=True)
                del res[q]["out"]
        print(f"run {i} done", flush=True)

    for q in QUERIES:
        ma, mb = statistics.median(res[q]["A"]), statistics.median(res[q]["B"])
        print(
            f"{q}: A(old) {ma:.3f}s [{min(res[q]['A']):.3f},{max(res[q]['A']):.3f}] "
            f"jobs={res[q]['jobs']['A']}  ->  "
            f"B(new) {mb:.3f}s [{min(res[q]['B']):.3f},{max(res[q]['B']):.3f}] "
            f"jobs={res[q]['jobs']['B']}  ratio {mb/ma:.3f}"
        )


if __name__ == "__main__":
    main()
