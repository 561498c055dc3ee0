#!/usr/bin/env python3
"""A/B: cluster-snapshot rewrite volume — full snapshot vs the r11
partitioned touched-bucket layout (streaming/cluster_index.py).

The claim under test (SCALE.md §Round-10 named the design; §Round-11
records these numbers): once a corpus is indexed, each incremental
shard's pair delta touches FEW clusters, so the partitioned store
rewrites only the component-hash buckets on either side of each merge
while the full-snapshot layout rewrites the entire mapping every
batch.  Rewrite volume per batch should therefore track the DELTA
(times bucket granularity) in the partitioned layout and the whole
accumulated store in the full layout — a gap that widens as the store
grows.

Workload (deterministic, md5-seeded): one large initial delta (the
corpus build), then ``--shards`` small deltas (the steady-state
ingest).  Both layouts fold the identical deltas; the mappings are
verified equal after every batch.  Per batch this prints JSON with
bytes/rows written by each layout; the summary line carries the
steady-state ratios.

Usage: python tools/ab_cluster_rewrite.py [--nodes 200000]
       [--initial 100000] [--shards 6] [--shard-edges 100]
       [--buckets 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.streaming.cluster_index import (  # noqa: E402
    latest_clusters,
    update_cluster_snapshot,
)


def _edges(spark, n_nodes: int, n_edges: int, salt: str):
    """Deterministic pseudo-random edge list: md5-ordered pairs,
    chain-skewed (dst near src) so components grow instead of
    pairing off — the shape accumulated dup clusters actually have."""
    return (
        spark.range(n_edges)
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("-", F.lit(salt), "id")), 1, 12),
                    16,
                    10,
                ).cast("long")
                % n_nodes
            ).alias("a_id"),
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("+", F.lit(salt), "id")), 1, 6),
                    16,
                    10,
                ).cast("long")
                % 97
            ).alias("_hop"),
        )
        .select(
            "a_id",
            ((F.col("a_id") + F.col("_hop") + 1) % n_nodes).alias("b_id"),
        )
        .filter(F.col("a_id") != F.col("b_id"))
    )


def _dir_bytes(path) -> int:
    p = pathlib.Path(path)
    if not p.exists():
        return 0
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def _new_bytes(before: dict, root) -> int:
    """Bytes in files that appeared (or changed size) since ``before``
    — i.e. what this batch actually wrote."""
    total = 0
    for f in pathlib.Path(root).rglob("*"):
        if f.is_file():
            sz = f.stat().st_size
            if before.get(str(f)) != sz:
                total += sz
    return total


def _file_sizes(root) -> dict:
    return {
        str(f): f.stat().st_size
        for f in pathlib.Path(root).rglob("*")
        if f.is_file()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--initial", type=int, default=100_000)
    ap.add_argument("--shards", type=int, default=6)
    ap.add_argument("--shard-edges", type=int, default=100)
    ap.add_argument("--buckets", type=int, default=1024)
    args = ap.parse_args()

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="ab_cluster_rewrite_")
    full = os.path.join(work, "full")
    part = os.path.join(work, "part")

    deltas = [_edges(spark, args.nodes, args.initial, "init")]
    deltas += [
        _edges(spark, args.nodes, args.shard_edges, f"shard{k}")
        for k in range(args.shards)
    ]

    steady_full, steady_part = [], []
    try:
        for i, d in enumerate(deltas):
            d = d.localCheckpoint(eager=True)
            before_f = _file_sizes(full) if os.path.isdir(full) else {}
            t0 = time.perf_counter()
            update_cluster_snapshot(spark, full, d, i)
            t_full = time.perf_counter() - t0
            wrote_f = _new_bytes(before_f, full)

            before_p = _file_sizes(part) if os.path.isdir(part) else {}
            t0 = time.perf_counter()
            update_cluster_snapshot(
                spark, part, d, i, n_buckets=args.buckets
            )
            t_part = time.perf_counter() - t0
            wrote_p = _new_bytes(before_p, part)

            mf = latest_clusters(spark, full)
            mp = latest_clusters(spark, part, partitioned=True)
            rows_full = mf.count()
            sym_diff = mf.exceptAll(mp).unionByName(mp.exceptAll(mf)).count()
            assert sym_diff == 0, f"layouts diverged at batch {i}"

            rec = {
                "batch": i,
                "delta_edges": d.count(),
                "store_rows": rows_full,
                "full_bytes_written": wrote_f,
                "part_bytes_written": wrote_p,
                "full_s": round(t_full, 3),
                "part_s": round(t_part, 3),
            }
            print(json.dumps(rec), flush=True)
            if i > 0:
                steady_full.append(wrote_f)
                steady_part.append(wrote_p)

        print(
            json.dumps(
                {
                    "summary": "steady-state shard ingest",
                    "buckets": args.buckets,
                    "mean_full_bytes": round(
                        sum(steady_full) / len(steady_full)
                    ),
                    "mean_part_bytes": round(
                        sum(steady_part) / len(steady_part)
                    ),
                    "bytes_ratio_full_over_part": round(
                        sum(steady_full) / max(1, sum(steady_part)), 2
                    ),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
