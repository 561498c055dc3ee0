"""A/B probe for the q_minhash_neardup cost structure (r12 VERDICT
item 4: the heavy tier's top item at 4.99 s, sf0.1).

Three arms, each rebuilt from the DSL per timed run (the r6 timing
lesson — re-collecting a DataFrame reuses its shuffle map stages):

  A  registered pipeline: shingle → 128-hash signatures → 16-band LSH
     → exact verify (what the bench times today);
  B  the same pipeline reading a PRE-BUILT, localCheckpoint'd shingle
     relation (doc_id, toks) — isolates how much of A is the shingle
     pass vs the signature/join/verify stages, i.e. the ceiling of
     any share-the-shingles bench optimization;
  C  64 hashes / 16 bands (4 rows per band): half the signature
     flops; band containment P(cand|s) = 1-(1-s^4)^16 ≈ 1 at s=0.9,
     so the verified pair set should match A's — checked below, plus
     the candidate-count blow-up check (s^4 admits weaker pairs).
  D  (r15) the SAME 128/16 pipeline with the Arrow-batched signature
     kernel (minhash_signatures_arrow: JVM token hashing + one
     mapInPandas computing all 128 min-hashes in numpy) in place of
     the 128-aggregate-expression pass — INTERLEAVED with fresh A
     runs (A,D,A,D,...) so box drift hits both arms equally, with the
     verified pair set asserted identical.  A signature-pass-only
     interleave isolates the stage the r14 VERDICT fingered (46 % of
     the non-shared wall).

Output: one JSON line with per-arm medians, the A-vs-B shingle share,
C's candidate count vs A's, and C's pair-set agreement vs A at the
probe SF plus vs the EXACT all-pairs baseline at sf0.01 (the exact
baseline is quadratic — guarded to the small tier only).

Findings land in SCALE.md §Round-12 (A/B/C) and §Round-15 (D).
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

import pyspark.sql.functions as F  # noqa: E402

from spark_streaming_join_example_spark import get_spark  # noqa: E402
from spark_streaming_join_example_spark.operators.dedup import (  # noqa: E402
    banded_signatures,
    exact_jaccard_verify,
    jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_arrow,
    shingles,
)
from spark_streaming_join_example_spark.sources.batch import (  # noqa: E402
    load_table,
)


def _pairs(spark, sf_dir, num_hashes, bands, toks=None, arrow=False):
    if toks is None:
        d = load_table(spark, sf_dir, "documents")
        toks = d.select("doc_id", shingles("text", n=3).alias("toks"))
    # A arms pin impl="expr": since r15 the adopted default IS the
    # arrow kernel, so the bare call would measure D against itself
    sig = (
        minhash_signatures_arrow(toks, "doc_id", F.col("toks"), num_hashes)
        if arrow
        else minhash_signatures(
            toks, "doc_id", F.col("toks"), num_hashes, impl="expr"
        )
    )
    cand = lsh_candidate_pairs(sig, "doc_id", num_hashes, bands)
    return exact_jaccard_verify(cand, toks, "doc_id", 0.9)


def _timed(fn, n_runs=3):
    samples = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3), [
        round(s, 3) for s in samples
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-minhash")
    out: dict = {"sf_dir": sf_dir}

    # warm code paths once
    _pairs(spark, sf_dir, 128, 16).count()

    # ---- A: registered pipeline -------------------------------------
    out["A_128_16"], out["A_samples"] = _timed(
        lambda: _pairs(spark, sf_dir, 128, 16).count()
    )

    # ---- B: pre-built shingle relation ------------------------------
    d = load_table(spark, sf_dir, "documents")
    shared = (
        d.select("doc_id", shingles("text", n=3).alias("toks"))
        .localCheckpoint(eager=True)
    )
    out["B_shared_toks"], out["B_samples"] = _timed(
        lambda: _pairs(spark, sf_dir, 128, 16, toks=shared).count()
    )
    out["shingle_share_of_A"] = round(
        1 - out["B_shared_toks"] / out["A_128_16"], 3
    )

    # ---- C: 64 hashes / 16 bands ------------------------------------
    out["C_64_16"], out["C_samples"] = _timed(
        lambda: _pairs(spark, sf_dir, 64, 16).count()
    )

    # ---- D: Arrow signature kernel, INTERLEAVED with fresh A runs ----
    # (r13 lesson: back-to-back arms confound with box drift; alternate
    # so both arms sample the same load regime)
    _pairs(spark, sf_dir, 128, 16, arrow=True).count()  # warm D path
    a_il, d_il = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        _pairs(spark, sf_dir, 128, 16).count()
        a_il.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _pairs(spark, sf_dir, 128, 16, arrow=True).count()
        d_il.append(time.perf_counter() - t0)
    out["A_interleaved"] = round(statistics.median(a_il), 3)
    out["A_interleaved_samples"] = [round(s, 3) for s in a_il]
    out["D_arrow_128_16"] = round(statistics.median(d_il), 3)
    out["D_samples"] = [round(s, 3) for s in d_il]
    out["D_over_A"] = round(out["D_arrow_128_16"] / out["A_interleaved"], 3)

    # signature-pass-only interleave (the stage the kernel replaces):
    # force full signature materialization via first+last array slots
    # (count() would let Catalyst prune the 128 min aggregates)
    def _force_sig(arrow: bool):
        d0 = load_table(spark, sf_dir, "documents")
        t = d0.select("doc_id", shingles("text", n=3).alias("toks"))
        fn = minhash_signatures_arrow if arrow else minhash_signatures
        s = (
            fn(t, "doc_id", F.col("toks"), 128)
            if arrow
            else fn(t, "doc_id", F.col("toks"), 128, impl="expr")
        )
        # force via double sums: int64 sums of ±9e18 min-hash values
        # overflow under ANSI; doubles lose low bits but still force
        # every array slot's computation (element_at can't prune the
        # array construction)
        s.agg(
            F.sum(F.element_at("sig", 1).cast("double")),
            F.sum(F.element_at("sig", 128).cast("double")),
        ).collect()

    _force_sig(False), _force_sig(True)  # warm
    se_il, sa_il = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        _force_sig(False)
        se_il.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _force_sig(True)
        sa_il.append(time.perf_counter() - t0)
    out["sig_expr"] = round(statistics.median(se_il), 3)
    out["sig_expr_samples"] = [round(s, 3) for s in se_il]
    out["sig_arrow"] = round(statistics.median(sa_il), 3)
    out["sig_arrow_samples"] = [round(s, 3) for s in sa_il]

    # identical-output gate: the verified pair sets must agree exactly
    pd_ = {
        (r.a_id, r.b_id)
        for r in _pairs(spark, sf_dir, 128, 16, arrow=True)
        .select("a_id", "b_id")
        .collect()
    }
    pa_ = {
        (r.a_id, r.b_id)
        for r in _pairs(spark, sf_dir, 128, 16)
        .select("a_id", "b_id")
        .collect()
    }
    out["D_pairs_equal_A"] = pd_ == pa_
    assert pd_ == pa_, "arrow kernel changed the verified pair set"

    # candidate blow-up: s^4 bands admit weaker pairs
    d_full = load_table(spark, sf_dir, "documents")
    toks = d_full.select("doc_id", shingles("text", n=3).alias("toks"))
    sig128 = minhash_signatures(toks, "doc_id", F.col("toks"), 128)
    sig64 = minhash_signatures(toks, "doc_id", F.col("toks"), 64)
    out["cand_128_16"] = lsh_candidate_pairs(
        sig128, "doc_id", 128, 16
    ).count()
    out["cand_64_16"] = lsh_candidate_pairs(sig64, "doc_id", 64, 16).count()

    # pair-set agreement at the probe SF (both verified exactly, so
    # any diff is band recall)
    pa = {
        (r.a_id, r.b_id)
        for r in _pairs(spark, sf_dir, 128, 16).select("a_id", "b_id").collect()
    }
    pc = {
        (r.a_id, r.b_id)
        for r in _pairs(spark, sf_dir, 64, 16).select("a_id", "b_id").collect()
    }
    out["pairs_128_16"] = len(pa)
    out["pairs_64_16"] = len(pc)
    out["C_minus_A"] = len(pc - pa)
    out["A_minus_C"] = len(pa - pc)

    # exact-baseline recall at the SMALL tier only (quadratic)
    small = "/root/testdata/sf0.01"
    if os.path.isdir(small):
        t = load_table(spark, small, "documents").select(
            "doc_id", shingles("text", n=3).alias("toks")
        )
        a = t.select(
            F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks")
        )
        b = t.select(
            F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks")
        )
        exact = {
            (r.a_id, r.b_id)
            for r in a.join(b, F.col("a_id") < F.col("b_id"))
            .filter(jaccard(F.col("a_toks"), F.col("b_toks")) >= 0.9)
            .select("a_id", "b_id")
            .collect()
        }
        got64 = {
            (r.a_id, r.b_id)
            for r in _pairs(spark, small, 64, 16)
            .select("a_id", "b_id")
            .collect()
        }
        out["sf001_exact_pairs"] = len(exact)
        out["sf001_recall_64_16"] = round(
            len(got64 & exact) / len(exact), 4
        ) if exact else None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
