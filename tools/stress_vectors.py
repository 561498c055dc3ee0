#!/usr/bin/env python3
"""Vector-kernel scale probe: replicate the sf0.1 embeddings K×
(shifted vec_ids) and time the exact block-pair kernel vs the ANN
(LSH) path at 1× and K×. The exact kernel is O(n²·d) flops by
definition — the probe shows the distributed block-pair layout absorbs
K× data with ~K²/cores compute and NO driver-bound step; the ANN path
shows the sub-quadratic alternative at the same recall target.

Usage: python tools/stress_vectors.py [K] [sf_dir]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.operators.similarity import (
    ann_topk_pairs,
    cosine_topk_pairs,
)
from spark_streaming_join_example_spark.sources.batch import load_table


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress-vectors")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    shift = n + 1
    big = None
    for i in range(k):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * shift))
        big = c if big is None else big.unionByName(c)
    big = big.localCheckpoint(eager=True)

    def best_of(f, runs=3):
        f()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        return round(min(ts), 3)

    res = {
        "n_base": n,
        "n_scaled": n * k,
        "exact_1x": best_of(lambda: cosine_topk_pairs(emb, k=10).collect()),
        "exact_kx": best_of(lambda: cosine_topk_pairs(big, k=10).collect()),
        "ann_1x": best_of(lambda: ann_topk_pairs(emb, k=10).collect()),
        "ann_kx": best_of(lambda: ann_topk_pairs(big, k=10).collect()),
    }
    res["exact_ratio"] = round(res["exact_kx"] / res["exact_1x"], 2)
    res["ann_ratio"] = round(res["ann_kx"] / res["ann_1x"], 2)

    # Skew probe: a near-duplicate pile-up — half the corpus becomes
    # copies of ONE vector (tiny per-copy jitter via vec_id so rows
    # stay distinct), which lands every copy in the same (band, bucket)
    # of every band.  Unsalted (max_bucket=inf) that is ONE
    # applyInPandas task doing O((n/2)²·d) flops; the default
    # max_bucket salts it into bounded sub-block tasks.
    first = emb.limit(1).select(F.col("embedding").alias("hot")).crossJoin(
        emb.limit(n // 2).select("vec_id")
    )
    hot = first.select(
        (F.col("vec_id") + F.lit(10 * shift)).alias("vec_id"),
        F.transform(
            "hot", lambda x: x + F.pmod(F.col("vec_id"), F.lit(997)) / 1e7
        ).alias("embedding"),
    )
    skewed = emb.select("vec_id", "embedding").unionByName(hot).localCheckpoint(
        eager=True
    )
    res["skew_n"] = skewed.count()
    res["skew_hot_rows"] = n // 2
    res["ann_skew_unsalted"] = best_of(
        lambda: ann_topk_pairs(skewed, k=10, max_bucket=10**9).collect()
    )
    # fixture pile (n/2 ≈ 1-4k rows) sits under the production default
    # max_bucket=4096, so force salting with a proportionally small cap
    # — same code path a 100k-row pile would hit at the default.
    res["ann_skew_salted"] = best_of(
        lambda: ann_topk_pairs(skewed, k=10, max_bucket=256).collect()
    )
    res["skew_speedup"] = round(
        res["ann_skew_unsalted"] / max(res["ann_skew_salted"], 1e-9), 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    raise SystemExit(main())
