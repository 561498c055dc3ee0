#!/usr/bin/env python3
"""Width A/B for q_simhash_shingle_pairs over the SHARED shingle memo.

Same question as tools/ab_prefix_coalesce.py for the SimHash kernel:
the r15 scan fan-out checkpoints the shared memo at core-count
partitions — a 0.44x interleaved win for the UNSHARED pipeline
(fingerprint kernel fused on the scan, tools/ab_fanout.py) — but the
shared kernel's chunk-pairing joins are exchange-bound, so full width
only adds task overhead there.

Measured 2026-08-18 at sf0.1 (5 runs each, medians [min,max],
identity asserted on the full pair set):
  W32 0.874 s [0.771, 1.092]
  C8  0.679 s [0.622, 0.899]
  C2  0.786 s [0.705, 0.876]
-> adopted: coalesce(max(2, cores // 4)) in the SHARED branch of
q_simhash_shingle_pairs (plans/round12.py); C8 beats both ends, i.e.
the kernel still wants SOME width (unlike the prefix join, where
C2 == C8).

Usage: python tools/ab_simhash_coalesce.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark import get_spark


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_runs = int(args[1]) if len(args) > 1 else 5
    spark = get_spark("ab-simhash-coalesce")
    from spark_streaming_join_example_spark.operators import dedup
    from spark_streaming_join_example_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    os.environ["SPARK_GRAFT_SHARE_SHINGLES"] = "1"
    try:
        dedup._SHARED_TOKS_MEMO.clear()
        toks32 = dedup.corpus_shingle_toks(spark, sf_dir)
        toks32.count()

        def run(tk):
            out = simhash_near_duplicates(
                None, max_hamming=3, shingle=3, toks=tk
            )
            return sorted(tuple(r) for r in out.collect())

        arms = {
            "W32": toks32,
            "C8": toks32.coalesce(8),
            "C2": toks32.coalesce(2),
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
