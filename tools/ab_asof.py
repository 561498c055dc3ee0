#!/usr/bin/env python3
"""A/B the forward as-of formulations as PER-USER event depth grows.

q_asof_next_purchase (plans/round20.py) computes "each click → the
next purchase by the same user" with NO join: one per-user window and
an ignore-nulls carry.  The textbook alternative is a pair join
(clicks × later purchases per user) reduced by a min-struct.  Both are
LINEAR in users — the axis that separates them is events-per-user
depth D: the join materializes ~(D·clicks)·(D·purchases) candidate
pairs per user before its aggregate (quadratic in D), while the carry
pays one sort (D log D) and a linear scan.

This probe replicates each user's click/purchase events D ∈
{1, 2, 4, 8, 16} times WITHIN the user (ts jittered by +i seconds,
event ids offset so both stay unique), asserts the two formulations
produce IDENTICAL per-user aggregates at every D, and reports medians
of 5 timed runs (plans rebuilt from the DSL per run; variants
interleaved).

Usage: python tools/ab_asof.py [sf_dir] [n_runs] [depths-csv]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.sources.batch import load_table


def replicated(spark, sf_dir: str, d: int) -> DataFrame:
    """Click/purchase slice with each event replicated d times within
    its user (ts + i seconds, event_id offset by i * 10^10)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    if d == 1:
        return e
    reps = spark.range(d).select(F.col("id").alias("_i"))
    return e.crossJoin(F.broadcast(reps)).select(
        "user_id",
        "event_type",
        (F.col("ts") + F.make_interval(secs=F.col("_i"))).alias("ts"),
        (F.col("event_id") + F.col("_i") * F.lit(10_000_000_000)).alias(
            "event_id"
        ),
    )


def carry_form(e: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = e.withColumn(
        "np_ts",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    clicks = carried.filter(F.col("event_type") == "click")
    gap = F.unix_micros("np_ts") - F.unix_micros("ts")
    return clicks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("np_ts").alias("n_matched"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_us_total"),
    )


def join_form(e: DataFrame) -> DataFrame:
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    pairs = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (
            (F.col("p_ts") > F.col("c_ts"))
            | (
                (F.col("p_ts") == F.col("c_ts"))
                & (F.col("p_id") > F.col("c_id"))
            )
        ),
        "left",
    )
    nearest = pairs.groupBy("c_user", "c_ts", "c_id").agg(
        F.min(F.struct("p_ts", "p_id")).alias("np")
    )
    gap = F.unix_micros(F.col("np.p_ts")) - F.unix_micros("c_ts")
    return nearest.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("np.p_ts").alias("n_matched"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_us_total"),
    )


def canon(df: DataFrame):
    return sorted(tuple(r) for r in df.collect())


def timed(build, n_runs: int) -> list[float]:
    out = []
    for _ in range(n_runs):
        df = build()
        t = time.perf_counter()
        df._jdf.collectToPython()
        out.append(time.perf_counter() - t)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()

    depths = (
        tuple(int(x) for x in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 2, 4, 8, 16)
    )
    for d in depths:
        base = replicated(spark, sf_dir, d).localCheckpoint(eager=True)
        a, b = canon(carry_form(base)), canon(join_form(base))
        assert a == b, f"D={d}: formulations diverge ({len(a)} vs {len(b)})"
        # interleave timed runs
        ts_c, ts_j = [], []
        carry_form(base)._jdf.collectToPython()  # warm both paths once
        join_form(base)._jdf.collectToPython()
        for _ in range(n_runs):
            t = time.perf_counter()
            carry_form(base)._jdf.collectToPython()
            ts_c.append(time.perf_counter() - t)
            t = time.perf_counter()
            join_form(base)._jdf.collectToPython()
            ts_j.append(time.perf_counter() - t)
        rows = base.count()
        print(
            f"D={d} rows={rows} users={len(a)}: "
            f"carry median {statistics.median(ts_c):.3f}s "
            f"(min {min(ts_c):.3f}) | "
            f"join median {statistics.median(ts_j):.3f}s "
            f"(min {min(ts_j):.3f}) | "
            f"join/carry {statistics.median(ts_j)/statistics.median(ts_c):.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
