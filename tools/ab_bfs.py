#!/usr/bin/env python3
"""A/B of the bfs_hops level-loop (r15, guide §2.3 "shuffle fewer
bytes"): apply the visited anti-join BEFORE the frontier distinct
instead of after.

Registered arm A per round:
    edges ⋈ frontier → project v → DISTINCT (exchange) → ANTI visited
Candidate arm B per round:
    edges ⋈ frontier → project v → ANTI visited → DISTINCT (exchange)

The anti filter is a per-row predicate on the node key, so it
commutes with the distinct (set semantics): both arms produce the
same frontier each round — asserted in-probe on the full (node, dist)
result.  The candidate's point: by round 2-3 of a dense graph most
expansion targets are ALREADY visited, so filtering them out before
the distinct (via the broadcast-hash anti, no shuffle) shrinks the
one per-round exchange by the visited fraction; the registered form
ships every expansion target (map-side-partially-deduped) into the
exchange first and discards the visited ones after.

Both arms run on the SAME eagerly-materialized edge relation (kernel
A/B; the shared-edge bench tier and the standalone query both wrap
this kernel), interleaved A,B,A,B..., timed by full materialization
of the returned (node, dist) relation with the noop sink.

Usage: python tools/ab_bfs.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.operators.graph import (  # noqa: E402
    bfs_hops,
)
from spark_streaming_join_example_spark.plans.copurchase import (  # noqa: E402
    copurchase_edges,
)


def bfs_anti_first(edges, max_depth=3):
    """Arm B: identical loop, anti-join hoisted above the distinct."""
    edges = edges.select("u", "v").persist()
    src = edges.agg(F.min("u").alias("node"))
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-bfs")
    sc = spark.sparkContext

    sc.setJobDescription("ab_bfs edge build (shared input)")
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    sc.setJobDescription(None)

    rows_a = sorted(map(tuple, bfs_hops(edges).collect()))
    rows_b = sorted(map(tuple, bfs_anti_first(edges).collect()))
    assert rows_a == rows_b, "bfs arms differ!"
    print(f"identity OK ({len(rows_a)} rows)", flush=True)

    arms = {"A": bfs_hops, "B": bfs_anti_first}
    times: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(n_runs):
        for arm, fn in arms.items():
            sc.setJobDescription(f"ab_bfs {arm} run{i}")
            t0 = time.perf_counter()
            fn(edges).write.format("noop").mode("overwrite").save()
            times[arm].append(time.perf_counter() - t0)
            sc.setJobDescription(None)
    for arm in arms:
        ts = times[arm]
        print(
            f"bfs_{arm}: median {statistics.median(ts):.3f}s "
            f"[{min(ts):.3f}, {max(ts):.3f}] n={len(ts)}",
            flush=True,
        )
    print(
        f"B/A = "
        f"{statistics.median(times['B']) / statistics.median(times['A']):.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
