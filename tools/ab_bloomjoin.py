"""A/B probe for Spark's runtime bloom-filter join pruning (the
semi-join reduction that matters at 100 TB fact-dim joins).

Setup: lineitem (fact) ⋈ a SELECTIVE slice of orders (urgent orders
from one year — a filter the fact scan can't see).  When the dim side
is too large to broadcast, Spark plans a shuffle join that moves EVERY
fact row — including the ~97 % that will never match.  With
`spark.sql.optimizer.runtime.bloomFilter.enabled`, Catalyst injects a
bloom filter built from the dim's join keys as a runtime predicate on
the fact scan, so non-matching rows die before the exchange.

Arms (same query, fresh plan per timed run; broadcast disabled in BOTH
arms so the join is a genuine shuffle join, which is what the dim side
would force at 100 TB):

  A  bloom filter OFF — every fact row shuffles;
  B  bloom filter ON  — fact rows pre-filtered by
     `bloom_filter_might_contain` before the exchange (asserted
     present in B's physical plan and absent in A's).

Local caveats, stated honestly: Spark's production gates
(`...bloomFilter.applicationSideScanSizeThreshold`, default 10 GB)
exist precisely because the filter only pays off when the pruned
exchange dwarfs the filter's build+probe cost — a local fixture is
BELOW that gate, so this probe lowers the thresholds to demonstrate
the mechanism and measures row-reduction (the scale-invariant signal)
alongside wall-clock (which at this SF mostly prices the bloom build).

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


def build_join(spark, sf_dir: str):
    """lineitem revenue against urgent year-2000 orders — the dim
    filter is invisible to the fact scan without a runtime filter."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("rev_cents"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # both arms: force the shuffle join a 100 TB dim side would force
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    # open the production size gates so the mechanism fires at
    # fixture scale (see module docstring)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )

    def arm(enabled: bool):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            str(enabled).lower(),
        )
        times = []
        rows = None
        for _ in range(runs):
            t0 = time.time()
            rows = tuple(
                sorted(map(tuple, build_join(spark, sf_dir).collect()))
            )
            times.append(time.time() - t0)
        plan = build_join(spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return times, rows, plan

    t_off, rows_off, plan_off = arm(False)
    t_on, rows_on, plan_on = arm(True)

    assert rows_off == rows_on, "bloom arm changed the result"
    # the injected predicate renders as `might_contain(scalar-subquery
    # [...], xxhash64(l_orderkey, 42))` over a bloom_filter_agg build
    has_bloom_on = "might_contain" in plan_on
    has_bloom_off = "might_contain" in plan_off
    assert has_bloom_on and not has_bloom_off, (
        f"plan evidence wrong: on={has_bloom_on} off={has_bloom_off}"
    )

    # scale-invariant signal: how many fact rows the filter removes
    # before the exchange (selectivity of the injected predicate)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    n_fact = li.count()
    n_match = li.join(
        o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"],
        "left_semi",
    ).count()

    result = {
        "sf_dir": sf_dir,
        "runs": runs,
        "fact_rows": n_fact,
        "matching_fact_rows": n_match,
        "prunable_fraction": round(1 - n_match / n_fact, 4),
        "bloom_off_sec": round(statistics.median(t_off), 3),
        "bloom_on_sec": round(statistics.median(t_on), 3),
        "off_spread": [round(min(t_off), 3), round(max(t_off), 3)],
        "on_spread": [round(min(t_on), 3), round(max(t_on), 3)],
        "plan_evidence": "might_contain(bloom) on fact scan (B only)",
        "results_identical": True,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
