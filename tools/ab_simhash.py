#!/usr/bin/env python3
"""A/B the SimHash fingerprint kernel and unit scheme (round 10).

Reproduces the two measured claims in SCALE.md §Round-10:

1. **One-pass kernel win**: the pre-r10 simhash63 ran 63 SEPARATE
   array aggregates (one per bit), re-hashing every token 63 times
   (63·L string hashes + 63·L adds per doc).  The shipped one-pass
   form carries a 63-counter array through ONE aggregate, binds each
   token's xxhash64 once, and tests bits against precomputed mask
   literals (L hashes + 63·L adds).  This tool re-times the legacy
   form (kept ONLY here, as the A/B baseline) against the shipped
   kernel and re-verifies bit-identity doc-for-doc.

2. **Unit-scheme candidate collapse**: token-unit fingerprints of the
   small-vocabulary fixture concentrate, so the r=3 pigeonhole chunk
   join admits a constant fraction of all-pairs; shingle units spread
   them.  This tool counts pre-verify candidates under both units.

Usage: python tools/ab_simhash.py [sf_dir]
Prints one JSON line per measurement + a summary line; writes nothing.
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import Column

import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_streaming_join_example_spark import get_spark, load_table
from spark_streaming_join_example_spark.operators.dedup import (
    distinct_tokens,
    shingles,
    simhash63,
    simhash_chunks,
)


def simhash63_legacy(tokens: Column, n_bits: int = 63) -> Column:
    """The pre-r10 per-bit form — the A/B baseline (63 aggregates,
    each re-hashing every token).  Bit-identical to the shipped
    kernel by construction; kept only for this measurement."""

    def bit_sum(b: int) -> Column:
        return F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(n_bits):
        out = out + F.when(
            bit_sum(b) > 0, F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "ab-simhash", master="local[32]", shuffle_partitions=8
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    allpairs = n * (n - 1) // 2

    units = {
        "token": distinct_tokens("text"),
        "shingle3": shingles("text", n=3),
    }

    # 1. kernel A/B: bit-identity then wall-clock (fresh plan per run;
    # bit_count keeps the checksum action overflow-safe under ANSI)
    for uname, unit in units.items():
        mism = (
            docs.select(
                (simhash63(unit) == simhash63_legacy(unit)).alias("eq")
            )
            .filter("NOT eq")
            .count()
        )
        row = {"check": "bit_identity", "unit": uname, "mismatches": mism}
        print(json.dumps(row))
        assert mism == 0, row
        for kname, fn in (("legacy", simhash63_legacy), ("one_pass", simhash63)):
            t0 = time.time()
            docs.select(fn(unit).alias("fp")).agg(
                F.sum(F.bit_count("fp"))
            ).collect()
            print(
                json.dumps(
                    {
                        "bench": "fingerprint_pass",
                        "unit": uname,
                        "kernel": kname,
                        "sec": round(time.time() - t0, 2),
                        "n_docs": n,
                    }
                )
            )

    # 1b. (r15) Arrow-kernel arm, INTERLEAVED with the shipped
    # one-pass expression form (E,K,E,K,... so box drift hits both):
    # same protocol as tools/ab_minhash.py arm D — bit-identity
    # asserted first, then 4 interleaved timed runs per unit.
    import statistics

    from spark_streaming_join_example_spark.operators.dedup import (
        simhash_fingerprints_arrow,
    )

    for uname, unit in units.items():
        src = docs.select("doc_id", unit.alias("toks"))
        expr_fp = {
            r.doc_id: r.fp
            for r in src.select(
                "doc_id", simhash63(F.col("toks")).alias("fp")
            ).collect()
        }
        arrow_fp = {
            r.doc_id: r.fp
            for r in simhash_fingerprints_arrow(
                src, "doc_id", F.col("toks")
            ).collect()
        }
        assert expr_fp == arrow_fp, f"arrow kernel diverges on {uname}"

        def run_expr():
            docs.select("doc_id", unit.alias("toks")).select(
                "doc_id", simhash63(F.col("toks")).alias("fp")
            ).agg(F.sum(F.bit_count("fp"))).collect()

        def run_arrow():
            simhash_fingerprints_arrow(
                docs.select("doc_id", unit.alias("toks")),
                "doc_id",
                F.col("toks"),
            ).agg(F.sum(F.bit_count("fp"))).collect()

        run_expr(), run_arrow()  # warm
        es, ks = [], []
        for _ in range(4):
            t0 = time.time()
            run_expr()
            es.append(time.time() - t0)
            t0 = time.time()
            run_arrow()
            ks.append(time.time() - t0)
        print(
            json.dumps(
                {
                    "bench": "fingerprint_arrow_ab",
                    "unit": uname,
                    "expr_median": round(statistics.median(es), 3),
                    "expr_samples": [round(x, 3) for x in es],
                    "arrow_median": round(statistics.median(ks), 3),
                    "arrow_samples": [round(x, 3) for x in ks],
                    "arrow_over_expr": round(
                        statistics.median(ks) / statistics.median(es), 3
                    ),
                }
            )
        )

    # 2. unit-scheme candidate collapse at the frozen r=3 layout
    for uname, unit in units.items():
        fp = docs.select(
            "doc_id", simhash63(unit).alias("fp")
        ).localCheckpoint(eager=True)
        ch = fp.select(
            "doc_id",
            F.explode(simhash_chunks(F.col("fp"), 63, 3)).alias("c"),
        ).select("doc_id", "c.ci", "c.cv")
        a = ch.select(F.col("doc_id").alias("a_id"), "ci", "cv")
        b = ch.select(F.col("doc_id").alias("b_id"), "ci", "cv")
        cand = (
            a.join(b, ["ci", "cv"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
            .count()
        )
        print(
            json.dumps(
                {
                    "bench": "chunk_join_candidates",
                    "unit": uname,
                    "candidates": cand,
                    "all_pairs": allpairs,
                    "pct_of_all_pairs": round(100.0 * cand / allpairs, 4),
                }
            )
        )


if __name__ == "__main__":
    main()
