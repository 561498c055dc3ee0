#!/usr/bin/env python3
"""A/B q_assortativity's two count-window exchanges against a
degree-table form over the UNDIRECTED half relation (r15, guide §2.3
/ §2.4), interleaved within each run (the ab_tumbling protocol:
plans rebuilt from the DSL per timed run, arms alternate so box
drift hits both equally).

Arms (both compute the registered output — one row, bit-identical):

  A  (current) window form over the DIRECTED edge list: annotate
     x = count(*) over (partition by u), y = count(*) over
     (partition by v) — two full-edge-list exchanges + window sorts —
     then the single 6-moment aggregate.
  B  degree-table form over the HALF relation: localCheckpoint the
     u < v half once, build deg(node) with one partial-aggregated
     exchange (map-side partial aggregation collapses the unionAll of
     both endpoint columns to node cardinality per map partition),
     join both endpoint degrees back (node-cardinality build side —
     AQE broadcasts locally, degrades to co-partitioned shuffle joins
     at web scale), and fold the mirror ALGEBRAICALLY: every
     directed edge is a half edge seen from both ends, so
       n = 2*nh, sx = sy = Σ(du+dv), sxy = 2*Σ du*dv,
       sxx = syy = Σ(du² + dv²)
     — exact BIGINT identities, so the one final double expression
     is computed from bit-identical integers.

Materialization: .collect() (single-row result).  Output equality of
the arms is asserted on the first run.

MEASURED RESULT (sf0.1, 7 interleaved runs, 2026-08-17) — NULL, arm A
KEPT: A_window median 3.971 s [3.282, 12.243] vs B_degree_half
3.923 s [3.194, 6.466], B/A = 0.988 with grossly overlapping ranges
(the run rode a noisy box; both arms' outliers are box artifacts).
The standalone query's wall is dominated by the shared co-purchase
edge build, so the two window exchanges vs one degree exchange +
two joins difference is lost in it; and under bench edge-sharing the
arms differ even less.  The registered window form stays — it is the
simpler plan and loses nothing measurable.  At true cluster scale the
B algebra (degree table + BIGINT mirror identities) remains the
documented fallback if the two full-edge window sorts ever dominate
(SCALE.md §W — windows over the edge list).

Usage: python tools/ab_assort.py [sf_dir] [n_runs]
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()

    def li():
        return load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )

    def final_select(mom):
        return mom.select(
            F.col("n").alias("n_edges"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / F.sqrt(
                    (
                        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                    ).cast("double")
                )
                / F.sqrt(
                    (
                        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                    ).cast("double")
                ),
                8,
            ).alias("assortativity"),
        )

    def a_window():
        e = basket_pairs(li(), "l_orderkey", "l_partkey")
        pairs = (
            e.withColumn(
                "x", F.count(F.lit(1)).over(Window.partitionBy("u"))
            )
            .withColumn(
                "y", F.count(F.lit(1)).over(Window.partitionBy("v"))
            )
            .select("x", "y")
        )
        mom = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        return final_select(mom)

    def b_degree_half():
        e_h = basket_pairs(
            li(), "l_orderkey", "l_partkey", directed=False
        ).localCheckpoint(eager=True)
        deg = (
            e_h.select(F.col("u").alias("node"))
            .unionAll(e_h.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        j = e_h.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("du")),
            "u",
        ).join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")),
            "v",
        )
        half = j.agg(
            F.count(F.lit(1)).alias("nh"),
            F.sum(F.col("du") + F.col("dv")).alias("s1"),
            F.sum(F.col("du") * F.col("dv")).alias("sxyh"),
            F.sum(
                F.col("du") * F.col("du") + F.col("dv") * F.col("dv")
            ).alias("sq"),
        )
        mom = half.select(
            (F.lit(2) * F.col("nh")).alias("n"),
            F.col("s1").alias("sx"),
            F.col("s1").alias("sy"),
            (F.lit(2) * F.col("sxyh")).alias("sxy"),
            F.col("sq").alias("sxx"),
            F.col("sq").alias("syy"),
        )
        return final_select(mom)

    ra = a_window().collect()
    rb = b_degree_half().collect()
    assert [tuple(r) for r in ra] == [tuple(r) for r in rb], (
        f"arms diverge: {ra} vs {rb}"
    )
    print(f"identity ok: {ra[0].asDict()}")

    arms = {"A_window": a_window, "B_degree_half": b_degree_half}
    t: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(n_runs):
        for name, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().collect()
            t[name].append(time.perf_counter() - t0)
    med = statistics.median
    for name, xs in t.items():
        print(
            f"{name:14s} median {med(xs):.3f}s  "
            f"[{min(xs):.3f}, {max(xs):.3f}]"
        )
    print(f"B/A = {med(t['B_degree_half']) / med(t['A_window']):.3f}")


if __name__ == "__main__":
    main()
