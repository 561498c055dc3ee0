#!/usr/bin/env python3
"""Scale probe for the repeated-span dedup path (plans/round15.py):
measures, at each fixture size, the gram-posting volume the explode
emits, the duplicated-gram fraction the semi-join key set carries,
and the hit-span row count the per-document window pass sorts —
the three quantities that decide whether q_repeated_grams /
q_span_coverage stay linear at 100 TB.

The claim under test: postings grow with TOKEN COUNT (linear in
corpus bytes), while the duplicated-gram key set is boilerplate-sized
(a corpus property, not a scale property) — so the only shuffle is a
hash groupBy on the gram key plus an output-sized semi-join, and the
window partition stays bounded by a single document's length.

Usage: python3 tools/ab_spans.py [K ...]   # replica factors, default 1 2 4
Builds K-replica corpora from sf0.01 documents (disjoint doc_id
ranges, texts rotated so replicas are not byte-identical documents,
preserving realistic cross-document duplication).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from spark_streaming_join_example_spark import get_spark, load_table  # noqa: E402
from spark_streaming_join_example_spark.plans import round15  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def replicate(docs, k: int):
    """K disjoint-id copies; copy j rotates each text by j tokens so
    replicas share grams without being identical strings."""
    parts = []
    n = 100_000
    for j in range(k):
        w = F.split("text", " ")
        rot = F.concat(
            F.array_join(F.slice(w, F.lit(j + 1), F.size(w)), " "),
            F.when(F.lit(j) > 0, F.concat(F.lit(" "), F.array_join(F.slice(w, 1, j), " "))).otherwise(F.lit("")),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + j * n).alias("doc_id"),
                rot.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe(spark, docs_df, tmp: str):
    docs_df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    t0 = time.time()
    g = round15._grams(spark, tmp).persist()
    postings = g.count()
    dup_keys = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .count()
    )
    distinct_keys = g.select("gram").distinct().count()
    cov = round15.q_span_coverage(spark, tmp)
    hit_docs = cov.count()
    wall = time.time() - t0
    g.unpersist()
    return {
        "postings": postings,
        "distinct_grams": distinct_keys,
        "dup_grams": dup_keys,
        "dup_fraction": round(dup_keys / max(1, distinct_keys), 4),
        "docs_with_dup_spans": hit_docs,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("ab-spans", master="local[8]", shuffle_partitions=16)
    out = {}
    # natural growth: the real fixtures (duplication is a corpus
    # property — the dup-gram fraction should stay roughly flat)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        docs = load_table(spark, d, "documents").select("doc_id", "text")
        out[sf] = probe(spark, docs, f"/tmp/ab_spans_{sf}")
        print(json.dumps({sf: out[sf]}))
    # adversarial: K rotated replicas — EVERY gram duplicated (the
    # full-duplication worst case); work must still scale with K
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for k in ks:
        tmp = f"/tmp/ab_spans_k{k}"
        out[f"k={k}"] = probe(spark, replicate(base, k), tmp)
        print(json.dumps({f"k={k}": out[f"k={k}"]}))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
