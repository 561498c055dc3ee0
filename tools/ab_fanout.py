#!/usr/bin/env python3
"""Interleaved A/B of the r15 scan/relation fan-out (guide §2.5/§2.6).

Arms per query, interleaved A,B,A,B,... with the DSL rebuilt inside
the timer (the bench heavy protocol, clearCache between runs):

  A — SPARK_GRAFT_NO_FANOUT=1: the pre-change single-task pipelines
      (tiny scans / AQE-coalesced relations feeding compute-heavy
      operators with no exchange to re-split);
  B — fan-out enabled (scan_fanout + _dup_edges' _fanout): one tiny
      round-robin exchange unlocks core-count parallelism.

Output identity is asserted on the FULL sorted rowset of each query,
A vs B, before any timing (fan-out is a physical-only change: same
rows, any partitioning).

Usage: python tools/ab_fanout.py [sf_dir] [n_runs] [q_name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark import get_spark

# Adoption record (sf0.1, 5 interleaved runs each, medians):
#   q_minhash_neardup       8.766 -> 2.543 s (B/A 0.290; quiet re-run
#                           6.465 -> 2.497, B/A 0.386)   ADOPTED
#   q_simhash_shingle_pairs 2.296 -> 1.004 s (B/A 0.437) ADOPTED
#   q_cross_doc_ngram_dup   2.358 -> 1.086 s (B/A 0.461) ADOPTED
#   q_prefix_shingle_join   B/A 1.08 / 1.20 (two windows) REJECTED —
#                           site reverted (exchange-bound pipeline;
#                           see plans/extensions.py + the shared-mode
#                           coalesce fix in tools/ab_prefix_coalesce.py)
#   q_dup_clusters          naive fan-out B/A 1.287 REJECTED (the CC
#                           loop's ~6 tiny jobs/invocation inherit 64
#                           near-empty partitions); a checkpoint+
#                           coalesce fan-in variant measured B/A 0.974
#                           = NULL, so _dup_edges stays unchanged.
# Third-window confirmation (post-adoption, freer box):
#   q_minhash_neardup 5.424 -> 2.060 (0.380), q_simhash_shingle_pairs
#   2.022 -> 1.092 (0.540), q_cross_doc_ngram_dup 2.882 -> 2.026
#   (0.703) — consistent across all three measurement windows.
# The two rejected names keep working here (their arms are now
# identical — the probe then measures pure run-to-run noise).
DEFAULT_QUERIES = [
    "q_minhash_neardup",
    "q_simhash_shingle_pairs",
    "q_cross_doc_ngram_dup",
]


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    n_runs = 5
    if args and args[0].isdigit():
        n_runs, args = int(args[0]), args[1:]
    names = args or DEFAULT_QUERIES

    spark = get_spark("ab-fanout")
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    qd = queries_dict()

    def rows(name):
        return sorted(tuple(r) for r in qd[name](spark, sf_dir).collect())

    for name in names:
        os.environ["SPARK_GRAFT_NO_FANOUT"] = "1"
        a_rows = rows(name)
        os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
        b_rows = rows(name)
        assert a_rows == b_rows, (
            f"{name}: fan-out changed the result "
            f"({len(a_rows)} vs {len(b_rows)} rows)"
        )
        print(f"{name}: identity ok ({len(a_rows)} rows)", flush=True)

        t = {"A": [], "B": []}
        for _ in range(n_runs):
            for arm in ("A", "B"):
                if arm == "A":
                    os.environ["SPARK_GRAFT_NO_FANOUT"] = "1"
                else:
                    os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qd[name](spark, sf_dir).toArrow()
                t[arm].append(time.perf_counter() - t0)
        os.environ.pop("SPARK_GRAFT_NO_FANOUT", None)
        ma, mb = statistics.median(t["A"]), statistics.median(t["B"])
        print(
            f"{name}: A_nofan {ma:.3f}s [{min(t['A']):.3f},{max(t['A']):.3f}]"
            f"  B_fanout {mb:.3f}s [{min(t['B']):.3f},{max(t['B']):.3f}]"
            f"  B/A {mb/ma:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
