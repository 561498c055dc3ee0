#!/usr/bin/env python3
"""A/B the r15 half-expansion edge build (operators/graph.basket_pairs
``directed=False`` + mirror-after-dedup) against the pre-r15 full
directed expansion, interleaved within each run (the ab_tumbling
protocol: plans rebuilt from the DSL per timed run, arms alternate so
box drift hits both equally).

Arms:
  A  (old) directed build: expand ALL ordered pairs per basket,
     filter u != v, distinct — one full-sized dedup shuffle.
  B  (new) directed build: expand u < v only, distinct, union the
     mirror (ReusedExchange on the swap branch) — one HALF-sized
     dedup shuffle (what copurchase_edges now does).
  Bu (new) undirected half alone — what q_triangle_count / q_kcore
     now consume directly.
  Ca (old) co-occurrence count: all ordered pairs -> groupBy(i,j)
     count (what q_collab_filter / q_association_rules did).
  Cb (new) co-occurrence count: u < v pairs -> groupBy count ->
     union mirrored counts (what they do now).

Materialization: .count() through each relation (noop-equivalent for
these all-column relations; count cannot prune the dedup/count
aggregates that dominate).  Output equality of the arms is asserted
on the first run (full multiset compare via sort).

Usage: python tools/ab_edges.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark, load_table
from spark_streaming_join_example_spark.operators.graph import basket_pairs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()

    def li():
        return load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )

    def old_directed():
        g = li().groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("_ps")
        )
        pairs = g.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, x -> "
                    "transform(_ps, y -> struct(x AS u, y AS v))))"
                )
            ).alias("_p")
        ).select(F.col("_p.u").alias("u"), F.col("_p.v").alias("v"))
        return pairs.filter(F.col("u") != F.col("v")).distinct()

    def new_directed():
        return basket_pairs(li(), "l_orderkey", "l_partkey")

    def new_undirected():
        return basket_pairs(li(), "l_orderkey", "l_partkey", directed=False)

    def old_cocount():
        g = li().groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("_ps")
        )
        pairs = g.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, x -> "
                    "transform(_ps, y -> struct(x AS u, y AS v))))"
                )
            ).alias("_p")
        ).select(F.col("_p.u").alias("i"), F.col("_p.v").alias("j"))
        return (
            pairs.filter(F.col("i") != F.col("j"))
            .groupBy("i", "j")
            .agg(F.count(F.lit(1)).alias("co"))
        )

    def new_cocount():
        co_h = (
            basket_pairs(
                li(), "l_orderkey", "l_partkey",
                distinct_pairs=False, directed=False,
            )
            .toDF("i", "j")
            .groupBy("i", "j")
            .agg(F.count(F.lit(1)).alias("co"))
        )
        return co_h.union(
            co_h.select(F.col("j").alias("i"), F.col("i").alias("j"), "co")
        )

    # ---- first-run output-identity assertions --------------------------
    a = sorted(map(tuple, old_directed().collect()))
    b = sorted(map(tuple, new_directed().collect()))
    assert a == b, f"directed arms diverge ({len(a)} vs {len(b)} rows)"
    u = sorted(map(tuple, new_undirected().collect()))
    assert u == sorted(t for t in a if t[0] < t[1]), "undirected != half"
    ca = sorted(map(tuple, old_cocount().collect()))
    cb = sorted(map(tuple, new_cocount().collect()))
    assert ca == cb, f"co-count arms diverge ({len(ca)} vs {len(cb)} rows)"
    print(f"identity ok: directed={len(a)} undirected={len(u)} co={len(ca)}")

    arms = {
        "A_old_directed": old_directed,
        "B_new_directed": new_directed,
        "Bu_new_undirected": new_undirected,
        "Ca_old_cocount": old_cocount,
        "Cb_new_cocount": new_cocount,
    }
    t: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(n_runs):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().count()
            t[name].append(time.perf_counter() - t0)
    med = statistics.median
    for name, xs in t.items():
        print(
            f"{name:18s} median {med(xs):.3f}s  "
            f"[{min(xs):.3f}, {max(xs):.3f}]"
        )
    print(
        f"directed B/A = {med(t['B_new_directed']) / med(t['A_old_directed']):.3f}  "
        f"undirected Bu/A = {med(t['Bu_new_undirected']) / med(t['A_old_directed']):.3f}  "
        f"cocount Cb/Ca = {med(t['Cb_new_cocount']) / med(t['Ca_old_cocount']):.3f}"
    )


if __name__ == "__main__":
    main()
