#!/usr/bin/env python3
"""A/B the recovery-window formulations as purchase multiplicity grows.

q_error_then_purchase (plans/round22.py) asks "which errors were
followed by a purchase within 2 h" with a LEFT-SEMI interval join —
each error matches at most once no matter how many purchases land in
its window.  The textbook alternative materializes the INNER join
(error × every qualifying purchase) and dedups with DISTINCT.  Both
are linear in errors; the separating axis is purchases-per-window
multiplicity K: the inner form materializes and shuffles K rows per
recovered error before the distinct, the semi form short-circuits at
the first match and its output never exceeds |errors|.

This probe replicates each purchase K ∈ {1, 2, 4, 8, 16} times within
its user (ts + i seconds — all replicas stay inside any window the
original hits), asserts the two formulations produce IDENTICAL
per-user (n_errors, n_recovered) at every K, and reports medians of
interleaved timed runs (plans rebuilt from the DSL per run).

Usage: python tools/ab_semijoin.py [sf_dir] [n_runs] [ks-csv]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.sources.batch import load_table


def replicated(spark, sf_dir: str, k: int) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("error", "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    if k == 1:
        return e
    reps = spark.range(k).select(F.col("id").alias("_i"))
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(reps))
        .select(
            "user_id",
            "event_type",
            (F.col("ts") + F.make_interval(secs=F.col("_i"))).alias("ts"),
            (F.col("event_id") + F.col("_i") * F.lit(10_000_000_000)).alias(
                "event_id"
            ),
        )
    )
    return e.filter(F.col("event_type") == "error").unionByName(purchases)


def _sides(e: DataFrame):
    err = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts"), F.col("event_id").alias("e_id")
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return err, pur


_WINDOW = "INTERVAL 2 HOURS"


def semi_form(e: DataFrame) -> DataFrame:
    err, pur = _sides(e)
    rec = err.join(
        pur,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("e_ts"))
        & (F.col("p_ts") <= F.col("e_ts") + F.expr(_WINDOW)),
        "left_semi",
    ).select(F.col("user_id").alias("r_user"), F.col("e_id").alias("r_id"))
    return (
        err.join(
            rec,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("e_id") == F.col("r_id")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count("r_id").alias("n_recovered"),
        )
    )


def inner_distinct_form(e: DataFrame) -> DataFrame:
    err, pur = _sides(e)
    rec = (
        err.join(
            pur,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("e_ts"))
            & (F.col("p_ts") <= F.col("e_ts") + F.expr(_WINDOW)),
        )
        .select(F.col("user_id").alias("r_user"), F.col("e_id").alias("r_id"))
        .distinct()
    )
    return (
        err.join(
            rec,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("e_id") == F.col("r_id")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.count("r_id").alias("n_recovered"),
        )
    )


def canon(df: DataFrame):
    return sorted(tuple(r) for r in df.collect())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ks = (
        tuple(int(x) for x in sys.argv[3].split(","))
        if len(sys.argv) > 3
        else (1, 2, 4, 8, 16)
    )
    spark = get_spark()

    for k in ks:
        base = replicated(spark, sf_dir, k).localCheckpoint(eager=True)
        a, b = canon(semi_form(base)), canon(inner_distinct_form(base))
        assert a == b, f"K={k}: formulations diverge ({len(a)} vs {len(b)})"
        semi_form(base)._jdf.collectToPython()  # warm both paths once
        inner_distinct_form(base)._jdf.collectToPython()
        ts_s, ts_i = [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            semi_form(base)._jdf.collectToPython()
            ts_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            inner_distinct_form(base)._jdf.collectToPython()
            ts_i.append(time.perf_counter() - t0)
        rows = base.count()
        print(
            f"K={k} rows={rows} users={len(a)}: "
            f"semi median {statistics.median(ts_s):.3f}s "
            f"(min {min(ts_s):.3f}) | "
            f"inner+distinct median {statistics.median(ts_i):.3f}s "
            f"(min {min(ts_i):.3f}) | "
            f"inner/semi {statistics.median(ts_i)/statistics.median(ts_s):.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
