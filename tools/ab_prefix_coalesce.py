#!/usr/bin/env python3
"""Width A/B for q_prefix_shingle_join over the SHARED shingle memo.

The r15 scan fan-out checkpoints the shared (doc_id, toks) memo at
core-count partitions — a 2-3x win for the LSH/SimHash kernels
(tools/ab_shingle_shared.py) but a 1.37x interleaved REGRESSION for
the prefix-filter join, whose pipeline is exchange-bound (the df-order
frequency pass shuffles immediately), so map-side width beyond a few
partitions only adds scheduling overhead.  This probe times the shared
kernel over the 32-partition memo vs narrow coalesces of it (coalesce
over a materialized localCheckpoint merges partitions WITHOUT
re-running the shingle build), identity asserted.

Measured 2026-08-18 at sf0.1 (5 runs each, medians [min,max]):
  W32 1.776 s [1.720, 2.129]
  C2  1.198 s [1.094, 1.281]
  C8  1.198 s [1.140, 1.339]
-> adopted: coalesce(max(2, cores // 8)) in q_prefix_shingle_join's
shared branch (plans/extensions.py); C2 == C8, so the exact width is
uncritical between 2 and 8.

Usage: python tools/ab_prefix_coalesce.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_runs = int(args[1]) if len(args) > 1 else 5
    spark = get_spark("ab-prefix-coalesce")
    from spark_streaming_join_example_spark.operators import dedup
    from spark_streaming_join_example_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    os.environ["SPARK_GRAFT_SHARE_SHINGLES"] = "1"
    try:
        dedup._SHARED_TOKS_MEMO.clear()
        toks32 = dedup.corpus_shingle_toks(spark, sf_dir)
        toks32.count()

        def run(tk):
            out = prefix_filter_jaccard_pairs(
                None,
                threshold=0.9,
                shingle=3,
                toks=tk.filter(F.col("doc_id") < 2000),
            )
            return sorted(tuple(r) for r in out.collect())

        arms = {
            "W32": toks32,
            "C2": toks32.coalesce(2),
            "C8": toks32.coalesce(8),
        }
        base = run(arms["W32"])
        for n, a in arms.items():
            assert run(a) == base, n
        print("identity ok", len(base))
        t = {n: [] for n in arms}
        for _ in range(n_runs):
            for n, a in arms.items():
                t0 = time.perf_counter()
                run(a)
                t[n].append(time.perf_counter() - t0)
        for n in arms:
            print(
                f"{n} {statistics.median(t[n]):.3f}"
                f" [{min(t[n]):.3f},{max(t[n]):.3f}]"
            )
    finally:
        os.environ.pop("SPARK_GRAFT_SHARE_SHINGLES", None)
        dedup._SHARED_TOKS_MEMO.clear()


if __name__ == "__main__":
    main()
