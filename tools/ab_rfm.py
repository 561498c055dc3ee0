#!/usr/bin/env python3
"""A/B q_rfm_segments' three CHAINED global_ntile passes against a
FAN-OUT form (r15, guide §2.3 — shuffle narrower rows — plus stage
parallelism): checkpoint the user rollup once, rank three NARROW
(user_id, metric) projections independently, and join the three
scores back on user_id.

Why the arms are identical (asserted in-probe on full sorted
rowsets): each global_ntile is a pure function of (ordering, row
multiset) — the two-phase kernel's range partitioning moves only
WHERE local ranking happens, and every ordering carries the user_id
tie-break, so each user's three scores are the same integers in both
shapes; arm B merely re-associates them via an exact user_id
equi-join instead of threading them through the next range shuffle.

  A  registered chain: ntile(ntile(ntile(rollup)))) — each pass
     range-shuffles the FULL row (user_id + 3 metrics + accumulated
     scores) and the three sort barriers are strictly sequential.
  B  fan-out: rollup.localCheckpoint (computed once, shared by all
     branches — within-query sharing, the ranking kernels' own
     discipline), three independent global_ntile over 2-column
     projections (narrower exchanges), then join scores back on
     user_id (user-cardinality; AQE broadcasts locally, co-partitions
     at scale).  The three sort subtrees are independent, so Spark
     can schedule them concurrently inside the one job.

MEASURED RESULT (sf0.1, 5 interleaved runs, 2026-08-17) — ADOPTED:
A_chain median 2.547 s [2.384, 2.662] vs B_fanout 2.023 s [1.837,
2.201] = B/A 0.794, NON-OVERLAPPING ranges (A min 2.384 > B max
2.201); identity asserted on the full 1500-row set.  Re-confirmed
post-adoption with the registry as the B arm (see
OPTIMIZATION_r15.md).

Usage: python tools/ab_rfm.py [sf_dir] [n_runs]
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

from spark_streaming_join_example_spark import get_spark, load_table  # noqa: E402
from spark_streaming_join_example_spark.operators.ranking import (  # noqa: E402
    global_ntile,
)
from spark_streaming_join_example_spark.plans import round5b  # noqa: E402


def _rollup(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.round(F.col("value") * F.lit(1_000_000.0)).cast("long")
            ).alias("monet_e6"),
        )
    )


def build_a(spark, sf_dir):
    """The pre-r15 CHAINED form (inline reconstruction — the registry
    adopted the fan-out, so the old shape lives here as the A arm)."""
    rfm = _rollup(spark, sf_dir)
    scored = global_ntile(
        global_ntile(
            global_ntile(
                rfm,
                4,
                [F.col("last_us").desc(), F.col("user_id")],
                out="r_score",
            ),
            4,
            [F.col("freq").desc(), F.col("user_id")],
            out="f_score",
        ),
        4,
        [F.col("monet_e6").desc(), F.col("user_id")],
        out="m_score",
    ).select("user_id", "freq", "monet_e6", "r_score", "f_score", "m_score")
    return scored.select(
        "user_id",
        "freq",
        "monet_e6",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int")
        .alias("rfm_cell"),
    )


def build_b(spark, sf_dir):
    """The registered (r15 fan-out) form."""
    return round5b.q_rfm_segments(spark, sf_dir)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-rfm")
    sc = spark.sparkContext

    rows_a = sorted(map(tuple, build_a(spark, sf_dir).collect()))
    rows_b = sorted(map(tuple, build_b(spark, sf_dir).collect()))
    assert rows_a == rows_b, (
        f"arm outputs differ: {len(rows_a)} vs {len(rows_b)} rows"
    )
    print(f"identity OK ({len(rows_a)} rows)", flush=True)

    times: dict[str, list[float]] = {"A_chain": [], "B_fanout": []}
    builders = {"A_chain": build_a, "B_fanout": build_b}
    for arm, build in builders.items():  # warm both arms once
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for i in range(n_runs):
        for arm, build in builders.items():
            sc.setJobDescription(f"ab_rfm {arm} run{i}")
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[arm].append(time.perf_counter() - t0)
            sc.setJobDescription(None)
    for arm in builders:
        ts = times[arm]
        print(
            f"{arm:9s} median {statistics.median(ts):.3f}s "
            f"[{min(ts):.3f}, {max(ts):.3f}] n={len(ts)}",
            flush=True,
        )
    med = statistics.median
    print(
        f"B/A = {med(times['B_fanout']) / med(times['A_chain']):.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
