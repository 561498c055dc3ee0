"""A/B probe for AQE's skew-join splitter — the runtime re-plan the
100 TB story leans on whenever a join key is hot (SCALE.md cites it
for the LSH hot-bucket paths and the salted-join discussion; this
probe pins the mechanism with numbers on THIS build).

Setup: a deliberately skewed fact key — 97 % of lineitem rows collapse
onto one key, the rest keep their own — sort-merge-joined against a
one-row-per-key dim built from the same key space (hot key on ONE side
only, so the join output stays fact-sized and the experiment isolates
the straggler effect, not an output explosion).  Without the splitter
the hot key's entire partition is ONE sort-merge task — the classic
straggler; with it, AQE splits the oversized partition into chunks
and replicates the dim side's matching partition per chunk.

Arms (AQE on and broadcast disabled in BOTH, so both plan the same
sort-merge join; thresholds lowered so a fixture-sized partition
counts as skewed — production defaults fire at 256 MB partitions):

  A  spark.sql.adaptive.skewJoin.enabled = false — straggler task;
  B  ... = true — split evidence asserted via `skew=true` in the
     final adaptive plan.

Output: one JSON line; findings land in SCALE.md §Round-12.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyspark.sql.functions as F  # noqa: E402

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.sources.batch import (  # noqa: E402
    load_table,
)


def skewed_fact(spark, sf_dir: str):
    """lineitem with 97 % of rows collapsed onto join key 1.

    The round-robin repartition matters for the experiment: AQE's
    splitter cuts a skewed reduce partition along MAP-OUTPUT
    boundaries, and sf0.1's lineitem is a single-row-group parquet
    file — byte-range splits hand every row to ONE mapper, making the
    hot partition unsplittable no matter how skewed.  Spreading the
    scan over 16 map tasks first restores the multi-mapper provenance
    any 100 TB scan has natively."""
    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    key = F.when(F.col("l_orderkey") % 100 < 97, F.lit(1)).otherwise(
        F.col("l_orderkey")
    )
    return li.select(
        key.alias("k"),
        "l_extendedprice",
        "l_discount",
        "l_quantity",
    )


def dim(spark, sf_dir: str):
    """One row per key: orders already carries a unique o_orderkey, so
    no distinct is needed — important, because a post-shuffle
    HashAggregate between the exchange and the join blocks
    OptimizeSkewedJoin (the rule only rewrites a sort-merge join whose
    sort children read PLAIN shuffle stages)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 7 + 1).cast("double").alias("weight"),
    )


def build_join(spark, sf_dir: str):
    f = skewed_fact(spark, sf_dir)
    d = dim(spark, sf_dir)
    j = f.join(d, "k")
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("weight") * 100)
            .cast("long")
        ).alias("wsum_cents"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # fixture-sized partitions must qualify as skewed: any partition
    # over 1 MB and 2x the median splits (production: 256 MB / 5x)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1MB",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def arm(enabled: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(enabled).lower()
        )
        times = []
        rows = None
        plan = None
        for _ in range(runs):
            q = build_join(spark, sf_dir)
            t0 = time.time()
            rows = tuple(sorted(map(tuple, q.collect())))
            times.append(time.time() - t0)
            # final (post-execution) adaptive plan carries the skew marks
            plan = q._jdf.queryExecution().executedPlan().toString()
        return times, rows, plan

    t_off, rows_off, plan_off = arm(False)
    t_on, rows_on, plan_on = arm(True)

    assert rows_off == rows_on, "skew arm changed the result"
    has_skew_on = "skew=true" in plan_on
    has_skew_off = "skew=true" in plan_off
    assert has_skew_on and not has_skew_off, (
        f"plan evidence wrong: on={has_skew_on} off={has_skew_off}"
    )

    f = skewed_fact(spark, sf_dir)
    n_fact = f.count()
    n_hot = f.filter(F.col("k") == 1).count()

    result = {
        "sf_dir": sf_dir,
        "runs": runs,
        "fact_rows": n_fact,
        "hot_key_rows": n_hot,
        "hot_fraction": round(n_hot / n_fact, 4),
        "skew_off_sec": round(statistics.median(t_off), 3),
        "skew_on_sec": round(statistics.median(t_on), 3),
        "off_spread": [round(min(t_off), 3), round(max(t_off), 3)],
        "on_spread": [round(min(t_on), 3), round(max(t_on), 3)],
        "plan_evidence": "SortMergeJoin(skew=true) in B's final plan only",
        "results_identical": True,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
