#!/usr/bin/env python3
"""Vector-kernel scale probe: replicate the sf0.1 embeddings K×
(shifted vec_ids) and time the exact block-pair kernel vs the ANN
(LSH) path at 1× and K×. The exact kernel is O(n²·d) flops by
definition — the probe shows the distributed block-pair layout absorbs
K× data with ~K²/cores compute and NO driver-bound step; the ANN path
shows the sub-quadratic alternative at the same recall target.

A second section (STRESS_CAND_K, default 30) MEASURES the central
scale claim instead of arguing it: the number of candidate pairs the
banded-LSH (minhash_neardup) and IVF (knn_join_ivf) kernels actually
form at 1x and Kx corpus size, against the n(n-1)/2 all-pairs count a
quadratic method would touch.  The blow-ups keep the dup structure
honest — documents get per-replica token suffixes (cross-replica
Jaccard = 0: the corpus grows, the dup rate doesn't), embeddings get
deterministic per-replica jitter, and the IVF quantizer scales
n_cells with n (constant target cell size, standard IVF practice).

Usage: python tools/stress_vectors.py [K] [sf_dir]
Prints one JSON line.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.operators.dedup import (
    distinct_tokens,
    lsh_candidate_pairs,
    minhash_signatures,
    prefix_filter_candidates,
    shingles,
)
from spark_streaming_join_example_spark.operators.similarity import (
    _assign_cells,
    _deterministic_sample,
    _kmeans_centroids,
    ann_topk_pairs,
    cosine_topk_pairs,
    knn_join_ivf,
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
    res["candidates"] = candidate_probe(
        spark, sf_dir, int(os.environ.get("STRESS_CAND_K", "30"))
    )
    print(json.dumps(res))


def candidate_probe(
    spark,
    sf_dir: str,
    k: int,
    include: tuple[str, ...] = (
        "minhash_lsh",
        "prefix_filter",
        "prefix_shingle",
        "knn_join_ivf",
    ),
) -> dict:
    """Candidate-pair counts vs all-pairs at 1x and Kx corpus size for
    the bucketed kernels (see module docstring).  ``include`` selects
    sections — the K=100 confirmation runs (r8 VERDICT item 8) probe
    only the text paths, skipping the O(n²)-flop IVF timing arm."""

    def pairs(n: int) -> int:
        return n * (n - 1) // 2

    out: dict = {"k": k}

    # ---- banded MinHash LSH over documents --------------------------
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    shift = n_docs + 1

    def rep_doc(i: int) -> DataFrame:
        # per-replica token suffix: replicas share ZERO tokens, so the
        # Kx corpus has K independent copies of the 1x dup structure
        return docs.select(
            (F.col("doc_id") + F.lit(i * shift)).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(t, F.lit(f"_{i}")),
                ),
            ).alias("text"),
        )

    def mh_candidates(d: DataFrame) -> int:
        # the REGISTERED r8 parameterization: 3-gram shingles,
        # 128 hashes / 16 bands (see operators/dedup.py docstring)
        toks = d.select("doc_id", shingles("text", n=3).alias("toks"))
        sig = minhash_signatures(toks, "doc_id", F.col("toks"), 128)
        return lsh_candidate_pairs(sig, "doc_id", 128, 16).count()

    big_docs = functools.reduce(
        DataFrame.unionByName, [rep_doc(i) for i in range(k)]
    ).localCheckpoint(eager=True)
    if "minhash_lsh" in include:
        mh = {
            "n_1x": n_docs,
            "cand_1x": mh_candidates(docs),
            "allpairs_1x": pairs(n_docs),
            "n_kx": n_docs * k,
            "cand_kx": mh_candidates(big_docs),
            "allpairs_kx": pairs(n_docs * k),
        }
        mh["cand_growth"] = round(mh["cand_kx"] / max(mh["cand_1x"], 1), 2)
        mh["allpairs_growth"] = round(mh["allpairs_kx"] / mh["allpairs_1x"], 2)
        out["minhash_lsh"] = mh

    # ---- prefix-filter exact join over the same replicas ------------
    # replicas share zero tokens, so candidate growth measures how the
    # LOSSLESS blocker scales: within-replica candidates x K, never
    # cross-replica pairs.
    if "prefix_filter" in include:

        def pf_candidates(d: DataFrame) -> int:
            toks = d.select("doc_id", distinct_tokens("text").alias("toks"))
            return prefix_filter_candidates(toks, "doc_id", 0.95).count()

        pf = {
            "n_1x": n_docs,
            "cand_1x": pf_candidates(docs),
            "allpairs_1x": pairs(n_docs),
            "n_kx": n_docs * k,
            "cand_kx": pf_candidates(big_docs),
            "allpairs_kx": pairs(n_docs * k),
        }
        pf["cand_growth"] = round(pf["cand_kx"] / max(pf["cand_1x"], 1), 2)
        pf["allpairs_growth"] = round(pf["allpairs_kx"] / pf["allpairs_1x"], 2)
        out["prefix_filter"] = pf

    # ---- prefix-filter in SHINGLE mode (r9): the small-vocab escape
    # hatch q_prefix_shingle_join registers — same lossless blocker,
    # word-3-gram units, t=0.9 (the registered threshold) -------------
    if "prefix_shingle" in include:

        def ps_candidates(d: DataFrame) -> int:
            toks = d.select("doc_id", shingles("text", n=3).alias("toks"))
            return prefix_filter_candidates(toks, "doc_id", 0.9).count()

        ps = {
            "n_1x": n_docs,
            "cand_1x": ps_candidates(docs),
            "allpairs_1x": pairs(n_docs),
            "n_kx": n_docs * k,
            "cand_kx": ps_candidates(big_docs),
            "allpairs_kx": pairs(n_docs * k),
        }
        ps["cand_growth"] = round(ps["cand_kx"] / max(ps["cand_1x"], 1), 2)
        ps["allpairs_growth"] = round(ps["allpairs_kx"] / ps["allpairs_1x"], 2)
        out["prefix_shingle"] = ps
    big_docs.unpersist()
    if "knn_join_ivf" not in include:
        return out

    # ---- IVF kNN join over embeddings -------------------------------
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_emb = emb.count()
    vshift = n_emb + 1

    def rep_emb(i: int) -> DataFrame:
        # deterministic per-replica jitter so the Kx corpus fills the
        # vector space instead of stacking K identical piles
        return emb.select(
            (F.col("vec_id") + F.lit(i * vshift)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, j: (
                    x
                    + 0.08
                    * F.sin(
                        (F.pmod(F.col("vec_id"), F.lit(997)) + 1)
                        * (j + 1)
                        * (i + 1)
                    )
                ).cast("float"),
            ).alias("embedding"),
        )

    def ivf_comparisons(d: DataFrame, n_cells: int, n_probe: int = 2) -> int:
        """Sum over cells of |Q_cell|*|C_cell| — the exact number of
        query-corpus cosine evaluations knn_join_ivf(d, d) performs."""
        import numpy as np

        sample = _deterministic_sample(d, "embedding")
        mat = np.array([r[0] for r in sample], dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        bc = spark.sparkContext.broadcast(
            _kmeans_centroids(mat, n_cells, seed=42)
        )
        qn = _assign_cells(d, bc, n_probe).groupBy("cell").agg(
            F.count("*").alias("qn")
        )
        cn = _assign_cells(d, bc, 1).groupBy("cell").agg(
            F.count("*").alias("cn")
        )
        return qn.join(cn, "cell").agg(
            F.sum(F.col("qn") * F.col("cn"))
        ).collect()[0][0]

    big_emb = functools.reduce(
        DataFrame.unionByName, [rep_emb(i) for i in range(k)]
    ).localCheckpoint(eager=True)
    cells_1x = 16
    cells_kx = cells_1x * k  # n_cells scales with n: constant cell size
    t0 = time.time()
    knn_join_ivf(emb, emb, k=5, n_cells=cells_1x).collect()
    t_1x = round(time.time() - t0, 3)
    t0 = time.time()
    knn_join_ivf(big_emb, big_emb, k=5, n_cells=cells_kx).collect()
    t_kx = round(time.time() - t0, 3)
    ivf = {
        "n_1x": n_emb,
        "comparisons_1x": ivf_comparisons(emb, cells_1x),
        "allpairs_1x": n_emb * n_emb,
        "knn_join_s_1x": t_1x,
        "n_kx": n_emb * k,
        "comparisons_kx": ivf_comparisons(big_emb, cells_kx),
        "allpairs_kx": (n_emb * k) ** 2,
        "knn_join_s_kx": t_kx,
        "n_cells_1x": cells_1x,
        "n_cells_kx": cells_kx,
    }
    ivf["cand_growth"] = round(
        ivf["comparisons_kx"] / max(ivf["comparisons_1x"], 1), 2
    )
    ivf["allpairs_growth"] = round(ivf["allpairs_kx"] / ivf["allpairs_1x"], 2)
    big_emb.unpersist()
    out["knn_join_ivf"] = ivf
    return out


if __name__ == "__main__":
    raise SystemExit(main())
