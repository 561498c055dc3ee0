#!/usr/bin/env python3
"""Stage decomposition + A/B probes for q_pq_topk (r14 VERDICT item 3:
heavy-tier #3 at 2.62 s, sf0.1).

Stages (each rebuilt from the DSL per timed run — the r6 lesson):

  train      pq_codebooks: deterministic 4096-row sample
             (TakeOrderedAndProject job) + driver k-means over m
             subspaces (vectorized Lloyd, r8)
  encode     pq_encode mapInPandas over all vectors (opaque to
             Catalyst — count() must execute the kernel)
  candidates PQ SDC block-pair applyInPandas + dropDuplicates
  full       the registered query end-to-end (adds the exact re-rank
             join + global top-k)

A/B arms on the full pipeline, interleaved (A,B,A,B,...):

  A  registered settings (m=16, nbits=8, keep=500)
  B  keep=150 (3·k safety factor 15 — still far above the exact
     kernel's 3·k margin; tests pin recall, this probes how much of
     the wall is candidate volume)
  C  nbits=6 (64 centroids/subspace): quarter the k-means training
     flops and SDC table size; recall pinned by the same gate below.

Every arm's top-10 pair set is compared against arm A's (report-only:
PQ is approximate, arms are DIFFERENT quantizations — the registered
recall gate vs the exact kernel lives in tests/test_extensions.py).

Usage: python tools/ab_pq.py [sf_dir] [n_runs]
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

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.operators.similarity import (  # noqa: E402
    pq_codebooks,
    pq_encode,
    pq_topk_pairs,
)
from spark_streaming_join_example_spark.sources.batch import (  # noqa: E402
    load_table,
    parquet_num_rows,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-pq")
    n_rows = parquet_num_rows(sf_dir, "embeddings")
    out: dict = {"sf_dir": sf_dir, "n_rows": n_rows}

    def emb():
        return load_table(spark, sf_dir, "embeddings")

    # warm every code path once
    pq_topk_pairs(emb(), k=10, m=16, nbits=8, n_rows=n_rows).count()

    # ---- stage decomposition (3 runs each, medians) -----------------
    def timed(fn, n=3):
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return round(statistics.median(xs), 3), [round(x, 3) for x in xs]

    out["train"], out["train_samples"] = timed(
        lambda: pq_codebooks(emb(), m=16, nbits=8)
    )

    def run_encode():
        books, _ = pq_codebooks(emb(), m=16, nbits=8)
        pq_encode(emb(), books).count()

    out["train_encode"], out["train_encode_samples"] = timed(run_encode)
    out["full"], out["full_samples"] = timed(
        lambda: pq_topk_pairs(
            emb(), k=10, m=16, nbits=8, n_rows=n_rows
        ).count()
    )
    out["encode_share"] = round(
        (out["train_encode"] - out["train"]) / out["full"], 3
    )
    out["train_share"] = round(out["train"] / out["full"], 3)

    # ---- interleaved arms on the full pipeline ----------------------
    def arm(keep=None, nbits=8):
        return pq_topk_pairs(
            emb(), k=10, m=16, nbits=nbits, n_rows=n_rows, keep=keep
        )

    def pairs(df):
        return {(r.a_id, r.b_id) for r in df.select("a_id", "b_id").collect()}

    base_pairs = pairs(arm())
    arms = {
        "A_registered": lambda: arm().count(),
        "B_keep150": lambda: arm(keep=150).count(),
        "C_nbits6": lambda: arm(nbits=6).count(),
    }
    for name, fn in arms.items():
        fn()  # warm
    samples = {name: [] for name in arms}
    for _ in range(n_runs):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)
    for name in arms:
        out[name] = round(statistics.median(samples[name]), 3)
        out[f"{name}_samples"] = [round(x, 3) for x in samples[name]]
    out["B_topk_overlap_vs_A"] = len(pairs(arm(keep=150)) & base_pairs)
    out["C_topk_overlap_vs_A"] = len(pairs(arm(nbits=6)) & base_pairs)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
