#!/usr/bin/env python3
"""A/B of the partsupp-catalog pre-filter (r15, guide §3.2 / §2.3):
semi-join lineitem against the broadcast key set that the downstream
joins will keep ANYWAY, *before* the (partkey, suppkey) catalog
aggregate — the query's only lineitem-sized exchange — instead of
aggregating all of lineitem and filtering after.

Why this is exact (both arms assert identical collected results
in-probe): the pre-filter predicate is on a GROUPING key of the
catalog aggregate (l_partkey for q_min_cost_supplier's p_size = 15
part slice, l_suppkey for q_important_stock's 3-nation supplier
slice), so it removes whole groups that the registered plan's
post-aggregate inner join removes identically, and never a row from a
surviving group — surviving (min, sum) aggregates are bit-identical.

Arms, interleaved A,B,A,B,... with a fresh DataFrame build per timed
run (the r6 lesson) and `noop` materialization:

  mincost_A   registered q_min_cost_supplier (catalog over ALL of
              lineitem, p_size=15 broadcast join after)
  mincost_B   + broadcast LEFT SEMI on size-15 part keys before the
              catalog groupBy (~2% of part keys survive)
  impstock_A  registered q_important_stock (catalog over ALL of
              lineitem, supplier⋈nation(3 rows) joins after)
  impstock_B  + broadcast LEFT SEMI on the 3 scoped nations' supplier
              keys before the catalog groupBy (~12% of suppliers)

Usage: python tools/ab_partsupp.py [sf_dir] [n_runs]
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
from pyspark.sql import Window  # noqa: E402

from spark_streaming_join_example_spark import get_spark, load_table  # noqa: E402
from spark_streaming_join_example_spark.plans.tpch_gaps import (  # noqa: E402
    _derived_partsupp,
)


def _mincost(spark, sf_dir, prefilter: bool):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p15 = p.filter(F.col("p_size") == 15)
    if prefilter:
        li = li.join(
            F.broadcast(p15.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
            "left_semi",
        )
    ps = _derived_partsupp(li)
    eligible = (
        ps.join(F.broadcast(p15), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost_c", F.min("ps_supplycost_c").over(w))
        .filter(F.col("ps_supplycost_c") == F.col("min_cost_c"))
        .select(
            "p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
            F.col("ps_supplycost_c").alias("supplycost_c"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def _impstock(spark, sf_dir, prefilter: bool):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n3 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    if prefilter:
        sk = s.join(
            F.broadcast(n3),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        ).select(F.col("s_suppkey").alias("l_suppkey"))
        li = li.join(F.broadcast(sk), "l_suppkey", "left_semi")
    ps = _derived_partsupp(li)
    scoped = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_qty_c")).alias("value_cc"),
        )
    )
    by_part = scoped.groupBy("ps_partkey").agg(
        F.sum("value_cc").alias("part_value_cc")
    )
    avg_floor = by_part.agg(
        F.expr("sum(part_value_cc) div count(*)").alias("avg_cc")
    )
    return (
        by_part.join(F.broadcast(avg_floor))
        .filter(F.col("part_value_cc") > F.lit(2) * F.col("avg_cc"))
        .select("ps_partkey", "part_value_cc")
    )


BUILDERS = {"mincost": _mincost, "impstock": _impstock}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-partsupp")
    sc = spark.sparkContext

    for name, build in BUILDERS.items():
        # identity gate first: full sorted-row comparison
        rows_a = sorted(map(tuple, build(spark, sf_dir, False).collect()))
        rows_b = sorted(map(tuple, build(spark, sf_dir, True).collect()))
        assert rows_a == rows_b, f"{name}: arm outputs differ!"
        print(f"{name}: identity OK ({len(rows_a)} rows)", flush=True)

        times: dict[str, list[float]] = {"A": [], "B": []}
        # warm both arms once, then interleave
        for arm, pref in (("A", False), ("B", True)):
            build(spark, sf_dir, pref).write.format("noop").mode(
                "overwrite"
            ).save()
        for i in range(n_runs):
            for arm, pref in (("A", False), ("B", True)):
                sc.setJobDescription(f"ab_partsupp {name} {arm} run{i}")
                t0 = time.perf_counter()
                build(spark, sf_dir, pref).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[arm].append(time.perf_counter() - t0)
                sc.setJobDescription(None)
        for arm in ("A", "B"):
            ts = times[arm]
            print(
                f"{name}_{arm}: median {statistics.median(ts):.3f}s "
                f"[{min(ts):.3f}, {max(ts):.3f}] n={len(ts)}",
                flush=True,
            )
        print(
            f"{name} B/A = "
            f"{statistics.median(times['B']) / statistics.median(times['A']):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
