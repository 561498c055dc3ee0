#!/usr/bin/env python3
"""Interleaved A/B of the r15 scan fan-out under the bench's
SHARED-shingle protocol (SPARK_GRAFT_SHARE_SHINGLES=1): per arm the
session memo is cleared, the shared (doc_id, toks) relation is rebuilt
and eagerly checkpointed (timed as `build`, mirroring bench.py's
`shingle_build`), then each shingle-tier kernel is timed over it with
no cache clearing — exactly how bench.py times these three entries.

  A — SPARK_GRAFT_NO_FANOUT=1 (pre-change: 1-2-partition memo)
  B — fan-out on (core-count memo partitions)

Usage: python tools/ab_shingle_shared.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark import get_spark

KERNELS = [
    "q_minhash_neardup",
    "q_prefix_shingle_join",
    "q_simhash_shingle_pairs",
]


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_rounds = int(args[1]) if len(args) > 1 else 4
    spark = get_spark("ab-shingle-shared")
    from spark_streaming_join_example_spark.operators import dedup
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    qd = queries_dict()
    os.environ["SPARK_GRAFT_SHARE_SHINGLES"] = "1"
    t = {a: {k: [] for k in ["build", *KERNELS]} for a in "AB"}
    rows = {a: {} for a in "AB"}
    try:
        for _ in range(n_rounds):
            for arm in "AB":
                if arm == "A":
                    os.environ["SPARK_GRAFT_NO_FANOUT"] = "1"
                else:
                    os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
                dedup._SHARED_TOKS_MEMO.clear()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                toks = dedup.corpus_shingle_toks(spark, sf_dir)
                toks.count()
                t[arm]["build"].append(time.perf_counter() - t0)
                for k in KERNELS:
                    t0 = time.perf_counter()
                    out = sorted(
                        tuple(r) for r in qd[k](spark, sf_dir).collect()
                    )
                    t[arm][k].append(time.perf_counter() - t0)
                    prev = rows[arm].setdefault(k, out)
                    assert prev == out, f"{k}: unstable output within arm"
        for k in KERNELS:
            assert rows["A"][k] == rows["B"][k], f"{k}: arms diverge"
            print(f"{k}: identity ok ({len(rows['A'][k])} rows)")
        for k in ["build", *KERNELS]:
            ma, mb = (statistics.median(t[a][k]) for a in "AB")
            print(
                f"{k}: A {ma:.3f}s [{min(t['A'][k]):.3f},{max(t['A'][k]):.3f}]"
                f"  B {mb:.3f}s [{min(t['B'][k]):.3f},{max(t['B'][k]):.3f}]"
                f"  B/A {mb/ma:.3f}"
            )
    finally:
        os.environ.pop("SPARK_GRAFT_SHARE_SHINGLES", None)
        os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
        dedup._SHARED_TOKS_MEMO.clear()


if __name__ == "__main__":
    main()
