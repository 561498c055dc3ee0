#!/usr/bin/env python3
"""A/B the r16 fan-out of _dup_edges' quadratic-verify input
(plans/advanced.py, guide §2.5).

AQE coalesces the KB-sized doc-mask aggregate to ONE post-shuffle
partition.  The O(n²) BroadcastNestedLoopJoin that streams it is
cheap in itself, but q_dup_clusters' connected-components setup
UNIONS the un-persisted edge relation with its flip — so the map side
of the first CC shuffle recomputed the NLJ and hash-partitioned
~2 × 1.43 M edge rows through TWO single-threaded tasks.  The r16
change round-robins the checkpointed mask relation to core count
(≤ 2,500 rows by the all-pairs guard, so the added exchange is KBs by
construction), fanning both the verify and the downstream map side.

NOTE this is a DIFFERENT site than the r15-refuted q_dup_clusters
scan fan-out (which widened the documents scan feeding the token
explode — rejected at 1.29×): here the widened relation is the
quadratic join's streamed side after the aggregate.

Arms (interleaved, plans rebuilt per run, identity asserted on run 0):
  A  (old) _dup_edges without the repartition (inlined below);
  B  (new) the shipped plans/advanced._dup_edges;
both feeding the shipped connected_components (the registered
q_dup_clusters shape).

VERDICT (2026-08-18, sf0.1, 7 interleaved runs on a 0%-steal window,
identity asserted): REJECTED, non-overlapping — A(old, 1-partition
verify) med 3.144 s [2.93..3.24 + one 13.0 outlier] vs B(fanned) med
4.224 s [3.96..4.98] = 1.344×.  The single-task O(n²) verify is only
~4 M integer ops and the downstream CC union re-shuffles immediately;
round-robining the KB-sized mask relation to 32 partitions adds an
exchange plus 32/64-way tiny-task overhead to every consumer for
nothing.  Same conclusion as r15's q_dup_clusters scan fan-out
(1.29×), now refuted at the second candidate site: this query's
pipeline shuffles immediately after every fan-out point, which is
exactly the documented scan_fanout anti-case.  plans/advanced.py
reverted; this file is the rejection record.

Usage: python tools/ab_dupedges_fanout.py [sf_dir] [n_runs]
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
from spark_streaming_join_example_spark.operators.dedup import (
    distinct_tokens,
)
from spark_streaming_join_example_spark.operators.graph import (
    connected_components,
)
from spark_streaming_join_example_spark.operators.guards import (
    assert_allpairs_bounded,
)
from spark_streaming_join_example_spark.plans.advanced import _dup_edges


def _old_dup_edges(spark, sf_dir):
    """The pre-r16 bitmask builder, verbatim minus the repartition."""
    d = assert_allpairs_bounded(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000),
        max_rows=2500,
        what="ab_dupedges_fanout old arm",
        scale_path="(probe)",
    )
    toks = d.select("doc_id", F.explode(distinct_tokens("text")).alias("tok"))
    vocab = toks.select("tok").distinct()
    assert vocab.count() <= 63, "probe assumes the bitmask branch"
    vid = vocab.select(
        "tok", (F.row_number().over(Window.orderBy("tok")) - 1).alias("tid")
    )
    t = (
        toks.join(F.broadcast(vid), "tok")
        .groupBy("doc_id")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), tid))").alias("mask"))
        .select("doc_id", "mask", F.bit_count("mask").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = t.select(
        F.col("doc_id").alias("a_id"), F.col("mask").alias("a_mask"),
        F.col("n").alias("a_n"),
    )
    b = t.select(
        F.col("doc_id").alias("b_id"), F.col("mask").alias("b_mask"),
        F.col("n").alias("b_n"),
    )
    common = F.bit_count(F.col("a_mask").bitwiseAND(F.col("b_mask")))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(3 * common >= F.col("a_n") + F.col("b_n"))
        .select("a_id", "b_id")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def full(builder):
        return connected_components(builder(spark, sf_dir)).select(
            F.col("node").alias("doc_id"), F.col("component").alias("cluster")
        )

    A, B = [], []
    outs = {}
    for i in range(n_runs):
        arms = [("A", _old_dup_edges), ("B", _dup_edges)]
        if i % 2:
            arms.reverse()
        for name, builder in arms:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = full(builder).toArrow()
            dt = time.perf_counter() - t0
            (A if name == "A" else B).append(dt)
            if i == 0:
                outs[name] = sorted(map(str, out.to_pylist()))
        if i == 0:
            assert outs["A"] == outs["B"], "arm outputs differ!"
            print(f"identity OK ({len(outs['A'])} rows)", flush=True)
        print(f"run {i}: A {A[-1]:.2f}s  B {B[-1]:.2f}s", flush=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"A(old, 1-partition verify) med {ma:.3f}s "
          f"{sorted(round(x, 2) for x in A)}")
    print(f"B(new, fanned verify)      med {mb:.3f}s "
          f"{sorted(round(x, 2) for x in B)}")
    print(f"ratio {mb / ma:.3f}")


if __name__ == "__main__":
    main()
