#!/usr/bin/env python3
"""A/B: incremental duplicate-cluster maintenance vs full recompute.

Folds a synthetic pair stream batch-by-batch through
``streaming.cluster_index.merge_pairs_into_clusters`` (the r10
incremental path) and, at every step, also re-runs batch
``operators.graph.connected_components`` over ALL accumulated pairs
(what a non-incremental pipeline would do each ingest).  Prints
per-step wall times and verifies the two mappings agree at every
step.

The scale claim under test: the incremental fold's cost is one remap
pass over the store plus a CC over the CONTRACTED delta (whose size
tracks the delta, not the history), while recompute pays the full
iterative CC over the whole accumulated edge set every batch — so
the gap must WIDEN with history.

Synthetic workload: ``--nodes`` ids, ``--batches`` deltas of
``--edges`` pairs each, generated from md5 so runs are deterministic.
Edges are skewed toward chain-building (long components) to keep the
CC iteration count honest.

Usage: python tools/ab_cluster_merge.py [--nodes 50000]
       [--batches 8] [--edges 20000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from spark_streaming_join_example_spark.streaming.cluster_index import (  # noqa: E402
    merge_pairs_into_clusters,
)


_GROUP = 8  # nodes per duplicate group (near-dup clusters are small)


def synth_batch(spark, n_nodes: int, n_edges: int, salt: int):
    """Deterministic edges shaped like real near-dup pair deltas:
    duplicate groups are SMALL (≤ _GROUP docs), so each edge connects
    two members of one hash-chosen group; every 17th edge bridges to
    the group's XOR-1 partner so the merge path (two existing
    clusters unify) is exercised without forming chains — components
    stay ≤ 2 groups, the small-diameter regime the label-propagation
    kernel is specified for (high-diameter graphs use
    connected_components_star)."""
    n_groups = max(1, n_nodes // _GROUP)
    base = spark.range(n_edges).select(
        F.col("id").alias("i"),
        (
            F.abs(F.hash(F.concat(F.lit(f"g{salt}_"), F.col("id"))))
            % n_groups
        ).alias("g"),
        (
            F.abs(F.hash(F.concat(F.lit(f"a{salt}_"), F.col("id"))))
            % _GROUP
        ).alias("ka"),
        (
            F.abs(F.hash(F.concat(F.lit(f"b{salt}_"), F.col("id"))))
            % _GROUP
        ).alias("kb"),
    )
    return base.select(
        (F.col("g") * _GROUP + F.col("ka")).alias("a_id"),
        F.when(
            F.col("i") % 17 == 0,
            (F.col("g").bitwiseXOR(1) % n_groups) * _GROUP + F.col("kb"),
        )
        .otherwise(F.col("g") * _GROUP + F.col("kb"))
        .alias("b_id"),
    ).filter(F.col("a_id") != F.col("b_id"))


def canon(df):
    return {(r["node"], r["component"]) for r in df.collect()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--edges", type=int, default=20_000)
    ap.add_argument("--verify", action="store_true",
                    help="also assert incremental == recompute per step")
    args = ap.parse_args()

    spark = get_spark("ab-cluster-merge")
    spark.sparkContext.setLogLevel("ERROR")

    store = None
    accum = None
    print(
        f"nodes={args.nodes} batches={args.batches} "
        f"edges/batch={args.edges}"
    )
    print(f"{'step':>4} {'fold_s':>8} {'recompute_s':>12} "
          f"{'store_rows':>10} {'accum_edges':>11}")
    for step in range(args.batches):
        delta = synth_batch(
            spark, args.nodes, args.edges, salt=step
        ).localCheckpoint(eager=True)
        accum = (
            delta if accum is None else accum.unionByName(delta)
        ).localCheckpoint(eager=True)

        t0 = time.time()
        store = merge_pairs_into_clusters(store, delta).localCheckpoint(
            eager=True
        )
        n_store = store.count()
        t_fold = time.time() - t0

        t0 = time.time()
        full = connected_components(accum, "a_id", "b_id")
        n_full = full.count()
        t_full = time.time() - t0

        if args.verify:
            assert canon(store) == canon(full), f"mismatch at step {step}"
        else:
            assert n_store == n_full, (
                f"row-count mismatch at step {step}: {n_store} != {n_full}"
            )
        print(
            f"{step:>4} {t_fold:>8.2f} {t_full:>12.2f} "
            f"{n_store:>10} {accum.count():>11}"
        )
    print("incremental == recompute at every step "
          f"({'full value check' if args.verify else 'row counts'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
