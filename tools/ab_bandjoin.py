"""Scale probe for the date-bucket band-join blocking
(q_contained_orders, plans/round18.py — r12): measure, as the order
count n grows, how the blocked join's candidate set compares to the
Θ(n²)-per-key all-pairs scan it replaces.

Claims under test (the SCALE.md story):
  1. candidates / true-matches stays a SMALL CONSTANT (~3: a ±15-day
     band against 15-day buckets admits at most the 3-bucket
     neighborhood, and every true pair is admitted exactly once);
  2. candidates / all-pairs stays ≈ bandwidth / keyspan — independent
     of n — so the blocked join's work is OUTPUT-sized while the
     unblocked scan's is n²-sized.

Method: nested prefixes of the sf0.1 orders table (by o_orderkey, so
each prefix is a superset of the previous — same date span, growing
density).  For each n: all_pairs = Σ per-priority C(n_p, 2);
candidates = bucket-equi-join pairs BEFORE the band filter; matches =
pairs after it.  One JSON line per n.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.sources.batch import (  # noqa: E402
    load_table,
)


def probe(spark, sf_dir: str, n: int) -> dict:
    o = (
        load_table(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .limit(n)
        .localCheckpoint(eager=True)
    )
    day = (F.unix_micros("o_orderdate") / F.lit(86_400_000_000)).cast(
        "long"
    )
    a = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").alias("a_cust"),
        F.col("o_orderkey").alias("a_key"),
        day.alias("a_day"),
        (day / 15).cast("long").alias("bucket"),
    )
    b = o.select(
        F.col("o_orderpriority").alias("b_prio"),
        F.col("o_custkey").alias("b_cust"),
        F.col("o_orderkey").alias("b_key"),
        day.alias("b_day"),
        F.explode(
            F.array(
                (day / 15).cast("long") - 1,
                (day / 15).cast("long"),
                (day / 15).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    cand = a.join(
        b,
        (F.col("prio") == F.col("b_prio"))
        & (a["bucket"] == b["bucket"])
        & (F.col("a_cust") != F.col("b_cust"))
        & (F.col("a_key") < F.col("b_key")),
    )
    n_cand = cand.count()
    n_match = cand.filter(
        F.abs(F.col("a_day") - F.col("b_day")) <= 15
    ).count()
    per_prio = {
        r.prio: r.c
        for r in o.groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    all_pairs = sum(c * (c - 1) // 2 for c in per_prio.values())
    return {
        "n": n,
        "all_pairs": all_pairs,
        "candidates": n_cand,
        "matches": n_match,
        "cand_over_match": round(n_cand / max(1, n_match), 3),
        "cand_over_allpairs": round(n_cand / max(1, all_pairs), 5),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bandjoin")
    for n in (5_000, 10_000, 20_000, 40_000, 80_000):
        print(json.dumps(probe(spark, sf_dir, n)))


if __name__ == "__main__":
    main()
