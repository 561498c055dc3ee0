#!/usr/bin/env python3
"""A/B the q_events_tumbling hour-bucket expression (r12 VERDICT item 3).

q_events_tumbling drifted 1.024x -> 1.224x vs baseline across two
driver rounds (the only headline query above 1x).  The suspect is the
per-row expression chain: the loader normalizes the fixture's raw
int64-nanosecond `ts` with `timestamp_micros(ts div 1000)`, and the
query then applies `date_trunc('hour', ts)` — i.e. every row pays an
integer div, a long->timestamp conversion, and a timezone-aware
truncation before the hash aggregate.

With the session timezone pinned to UTC (session.py), hour truncation
is pure integer arithmetic, so two cheaper shapes are candidates:

  A (current)   groupBy(date_trunc('hour', ts))           on loaded events
  B (sec-bucket) groupBy(timestamp_seconds((cast(ts as long) div 3600)*3600))
                — cast(timestamp as long) is epoch seconds (floor);
                  two int64 ops replace date_trunc
  C (ns-bucket)  bucket straight off the RAW ns column, before any
                 timestamp conversion:
                 timestamp_seconds((ts_ns div 3_600_000_000_000)*3600)
                — the loader conversion never happens for the grouping
                  key; only the ONE distinct bucket value per group is
                  materialized as a timestamp

All three are asserted to produce IDENTICAL result multisets before
timing.  Timing: one cold pass, then N warm runs per variant,
interleaved round-robin (A,B,C,A,B,C,...) so box drift hits all
variants equally; report per-variant medians.

Usage: python tools/ab_tumbling.py [sf_dir] [n_warm]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.functions.numeric import VALUE, exact_sum
from spark_streaming_join_example_spark.schemas import EVENTS_RAW
from spark_streaming_join_example_spark.sources.batch import (
    _events_ts_is_raw_nanos,
    load_table,
    table_path,
)

_NS_PER_HOUR = 3_600 * 1_000_000_000


def variant_a(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value", VALUE).alias("sum_value"),
    )


def variant_b(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.col("ts").cast("long") - (F.col("ts").cast("long") % 3600))
    )
    return e.groupBy(
        bucket.alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value", VALUE).alias("sum_value"),
    )


def variant_c(spark, sf_dir):
    path = table_path(sf_dir, "events")
    if not _events_ts_is_raw_nanos(path):
        return None  # fixture already µs-encoded; C degenerates to B
    raw = spark.read.schema(EVENTS_RAW).parquet(path)
    # integer-only path (ns values overflow double's 53-bit mantissa,
    # so `div`, never `/`): hour-aligned ns → epoch seconds.
    bucket = F.timestamp_seconds(
        F.expr(f"(ts - ts % {_NS_PER_HOUR}) div 1000000000")
    )
    return raw.groupBy(
        bucket.alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value", VALUE).alias("sum_value"),
    )


def variant_e(spark, sf_dir):
    """(r15) post-aggregation timestamp conversion: group on the BARE
    int64 bucket and materialize the timestamp once per GROUP in a
    final projection, instead of once per row inside the grouping
    key — the last per-row op the r13 rewrite left in place."""
    e = load_table(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("long")
    bucket = (ts_sec - F.pmod(ts_sec, F.lit(3600))).alias("__bkt")
    agg = e.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value", VALUE).alias("sum_value"),
    )
    return agg.select(
        F.timestamp_seconds("__bkt").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def fetch(df):
    t = time.perf_counter()
    df._jdf.collectToPython()  # same materialization bench.py uses
    return time.perf_counter() - t


def canon(df):
    rows = df.collect()
    return sorted(
        tuple(
            (str(v) if v is not None else None) for v in (
                r["window_start"], r["event_type"], r["n"],
                round(r["sum_value"], 6),
            )
        )
        for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark()

    variants = {
        "A_date_trunc": variant_a,
        "B_sec_bucket": variant_b,
        "E_postagg_convert": variant_e,
    }
    c = variant_c(spark, sf_dir)
    if c is not None:
        variants["C_ns_bucket"] = variant_c

    # equivalence gate first
    base = canon(variant_a(spark, sf_dir))
    for name, fn in variants.items():
        got = canon(fn(spark, sf_dir))
        assert got == base, f"{name} diverges from A ({len(got)} rows)"
    print(f"equivalence: {len(base)} identical rows across "
          f"{len(variants)} variants", flush=True)

    # cold pass
    for name, fn in variants.items():
        fetch(fn(spark, sf_dir))

    samples = {name: [] for name in variants}
    for _ in range(n_warm):
        for name, fn in variants.items():
            samples[name].append(fetch(fn(spark, sf_dir)))

    for name, xs in samples.items():
        print(f"{name}: median {statistics.median(xs):.4f}s  "
              f"min {min(xs):.4f}  max {max(xs):.4f}  "
              f"(n={len(xs)})")


if __name__ == "__main__":
    main()
