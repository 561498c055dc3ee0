#!/usr/bin/env python3
"""A/B of q_collab_filter degree-table sharing — measured and
REJECTED (r15, guide §2.4): the registered plan keeps arm A.

Arm A (registered): degrees from li.distinct().groupBy(item) — a
full |lineitem| dedup exchange + an item exchange, disjoint from the
pair expansion's groupBy(orderkey).collect_set.
Arm B (candidate): degrees and pairs both derive from ONE basket
groupBy(orderkey).collect_set relation (degrees = exploded set
sizes; value-identical because collect_set dedupes within-basket
repeats), hoping the shared exchange is read via ReusedExchange.
Arm C (candidate): B plus an eager localCheckpoint of the shared
groups relation, so it computes exactly once.

Measured at sf0.1 (5 interleaved runs of the 3 arms): A 2.335 s
[2.214, 2.697], B 2.346 s [2.197, 2.470], C 2.307 s [2.274, 2.506]
— B/A = 1.005, C/A = 0.988, a NULL result (an earlier 2-arm probe's
B/A = 1.128 did not reproduce interleaved 3-way; box noise).  Why no
win exists to take: the physical plan replicates the groups subtree
4× (co-count mirror union ×2, the two degree broadcasts ×2) and
ReusedExchange does not fire across those consumers under AQE, so B
recomputes the EXPENSIVE ObjectHashAggregate(collect_set) subtree
four times where A recomputes only the cheap distinct+count chain
twice; C's checkpoint write of array rows roughly cancels the two
cheap recomputations it saves.  The registered form stays A (no
change shipped); re-probe if the consumer count grows.

Usage: python tools/ab_collab.py [sf_dir] [n_runs]
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


def _basket_groups(li):
    return li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("_ps")
    )


def _degrees_from_groups(g):
    return g.select(F.explode("_ps").alias("item")).groupBy("item").agg(
        F.count(F.lit(1)).alias("d")
    )


def _finish(co_h, di):
    co = co_h.union(
        co_h.select(F.col("j").alias("i"), F.col("i").alias("j"), "co")
    )
    scored = (
        co.join(F.broadcast(di.toDF("i", "d_i")), "i")
        .join(F.broadcast(di.toDF("j", "d_j")), "j")
        .select(
            "i", "j", "co",
            F.expr(
                "CAST(co * co * 1000000 div (d_i * d_j) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("cos2_ppm").desc(), F.col("co").desc(), F.col("j")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("reco"),
            F.col("co").alias("n_cobaskets"),
            "cos2_ppm",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def _co_h(li):
    return (
        basket_pairs(
            li, "l_orderkey", "l_partkey",
            distinct_pairs=False, directed=False,
        )
        .toDF("i", "j")
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("co"))
    )


def build_A(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    di = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("d"))
    return _finish(_co_h(li), di)


def build_B(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    g = _basket_groups(li)
    co_h = (
        g.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(_ps, x -> "
                    "transform(_ps, y -> struct(x AS u, y AS v)))), "
                    "p -> p.u < p.v)"
                )
            ).alias("_p")
        )
        .select(F.col("_p.u").alias("i"), F.col("_p.v").alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return _finish(co_h, _degrees_from_groups(g))


def build_C(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    g = _basket_groups(li).localCheckpoint(eager=True)
    co_h = (
        g.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(_ps, x -> "
                    "transform(_ps, y -> struct(x AS u, y AS v)))), "
                    "p -> p.u < p.v)"
                )
            ).alias("_p")
        )
        .select(F.col("_p.u").alias("i"), F.col("_p.v").alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return _finish(co_h, _degrees_from_groups(g))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    arms = {"A_reg": build_A, "B_share": build_B, "C_ckpt": build_C}

    rows = {}
    for name, build in arms.items():
        rows[name] = sorted(
            tuple(r) for r in build(spark, sf_dir).collect()
        )
    base = rows["A_reg"]
    for name, r in rows.items():
        assert r == base, f"{name} diverges from A_reg"
    print(f"identity ok: {len(base)} rows")

    t: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(n_runs):
        for name, build in arms.items():
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name].append(time.perf_counter() - t0)
    med = statistics.median
    for name, xs in t.items():
        print(
            f"{name} median {med(xs):.3f}s  [{min(xs):.3f}, {max(xs):.3f}]"
        )
    print(
        f"B/A = {med(t['B_share']) / med(t['A_reg']):.3f}  "
        f"C/A = {med(t['C_ckpt']) / med(t['A_reg']):.3f}"
    )


if __name__ == "__main__":
    main()
