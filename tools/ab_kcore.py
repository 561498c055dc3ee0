#!/usr/bin/env python3
"""A/B q_kcore's peel-loop formulation (guide §2.4) on the undirected
co-purchase half relation (u < v distinct — what q_kcore feeds).

Arms (all inlined here; only a measured winner is ported into
operators/graph.kcore):

A_cur   — the shipped r15 operator verbatim: generic setup (directed
          dedup shuffle + symmetrize dedup shuffle, each eagerly
          checkpointed), peel round = groupBy degrees + two left-semi
          joins against the keep set.
B_skip  — same peel, but the setup trusts the caller's contract (the
          half relation IS distinct with u < v): symmetrize by lazy
          mirror union, ONE checkpoint, zero setup dedup shuffles.
C_window— B's setup + peel round as two count-windows (partitionBy s,
          then d) with a single filter — no keep relation, no joins;
          2 keyed exchanges per round vs A/B's groupBy + 2 semi joins
          (locally those semi joins broadcast the node-sized keep set,
          so this trades a groupBy exchange + 2 broadcast builds for
          2 window exchanges — which wins is empirical).

Per-arm round counts are printed (the peel is a fixpoint, so all arms
must agree).  Identity asserted on the first run; arms interleaved,
noop-sink materialization.

Usage: python tools/ab_kcore.py [sf_dir] [n_runs] [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from spark_streaming_join_example_spark import get_spark, load_table
from spark_streaming_join_example_spark.operators.graph import basket_pairs

ROUNDS = {"last": 0}


def _half_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return basket_pairs(li, "l_orderkey", "l_partkey", directed=False)


def _finish(e):
    return (
        e.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .orderBy("node")
    )


def _peel_joins(e, k, max_iter):
    prev_n = e.count()
    rounds = 0
    for _ in range(max_iter):
        if prev_n == 0:
            break
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        e = (
            e.join(keep, "s", "left_semi")
            .join(keep.select(F.col("s").alias("d")), "d", "left_semi")
            .localCheckpoint(eager=True)
        )
        rounds += 1
        n = e.count()
        if n == prev_n or n == 0:
            break
        prev_n = n
    ROUNDS["last"] = rounds
    return e


def _peel_windows(e, k, max_iter):
    ws, wd = Window.partitionBy("s"), Window.partitionBy("d")
    prev_n = e.count()
    rounds = 0
    for _ in range(max_iter):
        if prev_n == 0:
            break
        e = (
            e.withColumn("du", F.count(F.lit(1)).over(ws))
            .withColumn("dv", F.count(F.lit(1)).over(wd))
            .filter((F.col("du") >= k) & (F.col("dv") >= k))
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        rounds += 1
        n = e.count()
        if n == prev_n or n == 0:
            break
        prev_n = n
    ROUNDS["last"] = rounds
    return e


def build_A(spark, sf_dir, k):
    half = _half_edges(spark, sf_dir)
    sym = (
        half.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        sym.union(sym.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _finish(_peel_joins(e, k, 30))


def build_B(spark, sf_dir, k):
    half = _half_edges(spark, sf_dir).select(
        F.col("u").alias("s"), F.col("v").alias("d")
    )
    e = half.union(
        half.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint(eager=True)
    return _finish(_peel_joins(e, k, 30))


def build_C(spark, sf_dir, k):
    half = _half_edges(spark, sf_dir).select(
        F.col("u").alias("s"), F.col("v").alias("d")
    )
    e = half.union(
        half.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).localCheckpoint(eager=True)
    return _finish(_peel_windows(e, k, 30))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark()
    arms = {"A_cur": build_A, "B_skip": build_B, "C_window": build_C}

    rows = {}
    for name, build in arms.items():
        rows[name] = [tuple(r) for r in build(spark, sf_dir, k).collect()]
        print(f"{name}: rounds={ROUNDS['last']}, rows={len(rows[name])}")
    base = rows["A_cur"]
    for name, r in rows.items():
        assert r == base, f"{name} diverges from A_cur"
    print(f"identity ok: {len(base)} rows")

    t: dict[str, list[float]] = {k_: [] for k_ in arms}
    for _ in range(n_runs):
        for name, build in arms.items():
            t0 = time.perf_counter()
            build(spark, sf_dir, k).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name].append(time.perf_counter() - t0)
    med = statistics.median
    for name, xs in t.items():
        print(
            f"{name} median {med(xs):.3f}s  [{min(xs):.3f}, {max(xs):.3f}]"
        )
    print(
        f"B/A = {med(t['B_skip']) / med(t['A_cur']):.3f}  "
        f"C/A = {med(t['C_window']) / med(t['A_cur']):.3f}"
    )


if __name__ == "__main__":
    main()
