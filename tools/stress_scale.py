#!/usr/bin/env python3
"""Scale stress probe: replicate the sf0.1 fact tables K× (key-shifted
so join cardinalities scale honestly), then time the headline plans at
1× and K× to show they scale ~linearly (partial aggs, broadcast dims,
TakeOrdered top-k — nothing quadratic, nothing driver-bound).

Writes nothing outside /tmp. Usage:
    python tools/stress_scale.py [K] [sf_dir]
Prints one JSON line with per-query (base_s, scaled_s, ratio).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.sources.batch import load_table


def replicate(df, key_cols, k: int, shift: int):
    """Union K key-shifted copies (distinct keys per copy → honest
    group/join cardinality growth)."""
    out = None
    for i in range(k):
        c = df
        for col in key_cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * shift))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    work = "/tmp/spark_graft_stress"
    shutil.rmtree(work, ignore_errors=True)

    spark = get_spark("stress")
    # the engine session raises autoBroadcastJoinThreshold to 64 MB —
    # right for fixture-scale dims, wrong for this probe: a K×-scaled
    # customer table is EXACTLY the dim-outgrows-broadcast case a real
    # scale-up hits (at 64 MB the hashed build side OOMed the 8 GB
    # driver at K=30).  Capping at Spark's stock 10 MB makes the same
    # declared plan degrade to a shuffle join for the scaled dim while
    # genuinely small sides keep broadcasting — the behavior we are
    # here to measure.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    shift = 10_000_000

    # one lineitem replica serves every case: shifting ALL keys keeps
    # the l_orderkey⋈o_orderkey join aligned (orders shifts by the same
    # i*shift) AND grows the part/supplier populations so the supply-
    # catalog case scales wide, not just deep
    replicate(li, ["l_orderkey", "l_partkey", "l_suppkey"], k, shift).write.parquet(
        f"{work}/lineitem"
    )
    replicate(o, ["o_orderkey", "o_custkey"], k, shift).write.parquet(f"{work}/orders")
    replicate(c, ["c_custkey"], k, shift).write.parquet(f"{work}/customer")

    big_li = spark.read.parquet(f"{work}/lineitem")
    big_o = spark.read.parquet(f"{work}/orders")
    big_c = spark.read.parquet(f"{work}/customer")

    def pricing(lineitem):
        return (
            lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def revenue(cust, orders, lineitem):
        return (
            cust.join(orders, cust.c_custkey == orders.o_custkey)
            .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            .groupBy("c_mktsegment")
            .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev"))
        )

    def topk(orders):
        return orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10)

    # round-6 kernel A/B: the two-phase global rank vs the single-
    # partition window it replaces, on the same K×-replicated input.
    # Both reduce to sum(rn) = n(n+1)/2 — a 1-row result that forces
    # the full ranking AND cross-checks the two paths for equality.
    from spark_streaming_join_example_spark.operators.ranking import (
        global_row_number,
    )
    from pyspark.sql import Window

    def rank_two_phase(orders):
        r = global_row_number(
            orders.select("o_totalprice", "o_orderkey"),
            ["o_totalprice", "o_orderkey"],
            out="rn",
        )
        return r.agg(F.sum("rn").alias("s"))

    def rank_single_sort(orders):
        w = Window.orderBy("o_totalprice", "o_orderkey")
        return orders.select(
            F.row_number().over(w).cast("long").alias("rn")
        ).agg(F.sum("rn").alias("s"))

    # TPC-H Q2 kernel: derived supply catalog (composite-key groupBy
    # over lineitem) + per-part min window + min-cost filter.  Both
    # |parts| and rows/part grow with K, so this times the catalog
    # shuffle AND the key-cardinality window honestly.
    def min_cost_catalog(lineitem):
        unit_c = F.round(
            F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100.0)
        ).cast("long")
        ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
            F.min(unit_c).alias("cost_c")
        )
        w = Window.partitionBy("l_partkey")
        return (
            ps.withColumn("min_c", F.min("cost_c").over(w))
            .filter(F.col("cost_c") == F.col("min_c"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cost_c").alias("s"))
        )

    cases = {
        "pricing": (lambda: pricing(li), lambda: pricing(big_li)),
        "q2_supply_catalog": (
            lambda: min_cost_catalog(li),
            lambda: min_cost_catalog(big_li),
        ),
        "revenue_join3": (
            lambda: revenue(c, o, li),
            lambda: revenue(big_c, big_o, big_li),
        ),
        "topk": (lambda: topk(o), lambda: topk(big_o)),
        "global_rank_two_phase": (
            lambda: rank_two_phase(o),
            lambda: rank_two_phase(big_o),
        ),
        "global_rank_single_sort": (
            lambda: rank_single_sort(o),
            lambda: rank_single_sort(big_o),
        ),
    }

    # Timing discipline: re-collecting the SAME DataFrame reuses its
    # materialized shuffle map stages (and any localCheckpoint), so it
    # measures only the final stage — flattering for multi-stage plans.
    # Each timed run therefore REBUILDS the plan from the DSL: every
    # shuffle, sort, and checkpoint is paid again.  One untimed warm
    # pass first covers JIT/file-listing; report the min of 2 runs.
    def timed_fresh(fn) -> float:
        fn().collect()  # warm code paths
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn().collect()  # fresh build → fresh lineage, no stage reuse
            samples.append(time.perf_counter() - t0)
        return min(samples)

    results = {}
    for name, (base_fn, big_fn) in cases.items():
        base_s = timed_fresh(base_fn)
        big_s = timed_fresh(big_fn)
        results[name] = {
            "base_s": round(base_s, 3),
            f"x{k}_s": round(big_s, 3),
            "ratio": round(big_s / max(base_s, 1e-9), 2),
        }

    # cross-check: both rank paths must produce the identical sum(rn)
    # (= n(n+1)/2) on the scaled input — a correctness probe at K-scale
    s_two = rank_two_phase(big_o).collect()[0].s
    s_one = rank_single_sort(big_o).collect()[0].s
    assert s_two == s_one, (s_two, s_one)

    rows = {"base_lineitem": li.count(), "scaled_lineitem": big_li.count()}
    print(json.dumps({"k": k, "rows": rows, "queries": results}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
