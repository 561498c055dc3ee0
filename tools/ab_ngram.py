#!/usr/bin/env python3
"""A/B q_cross_doc_ngram_dup's r15 exchange-sharing rewrite (guide
§2.4): the (doc, shingle) dedup and the corpus-count window are both
clustered by the shingle, so an explicit ``repartition("s")`` lets ONE
exchange serve both — versus the pre-r15 two full shuffles of the
exploded relation (Exchange(doc_id, s) for the distinct, Exchange(s)
for the window).

Trade-off being measured: the old distinct did map-side partial dedup
before its exchange; the new single exchange carries the raw exploded
rows.  Within-scan-partition 5-gram duplication is rare on real text,
so one raw shuffle beats two deduped ones — this probe is the record.

Arms interleaved per run, plans rebuilt from the DSL, noop-sink
materialization, identity asserted on the first run.

Usage: python tools/ab_ngram.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from spark_streaming_join_example_spark import get_spark, load_table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark()

    def build(form: str):
        docs = load_table(spark, sf_dir, "documents")
        words = F.split("text", " ")
        n = F.size(words)
        shingles = F.when(
            n >= 5,
            F.transform(
                F.sequence(F.lit(1), n - 4),
                lambda i: F.concat_ws(" ", F.slice(words, i, 5)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        sh = docs.select("doc_id", F.explode(shingles).alias("s"))
        sh = sh.repartition("s").distinct() if form == "new" else sh.distinct()
        tagged = sh.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("s"))
        )
        return (
            tagged.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
                .cast("long")
                .alias("n_dup"),
            )
            .select(
                "doc_id", "n_shingles", "n_dup",
                F.round(F.col("n_dup") / F.col("n_shingles"), 6).alias(
                    "dup_frac"
                ),
            )
            .orderBy("doc_id")
        )

    a = [tuple(r) for r in build("old").collect()]
    b = [tuple(r) for r in build("new").collect()]
    assert a == b, f"arms diverge ({len(a)} vs {len(b)} rows)"
    print(f"identity ok: {len(a)} rows")

    t: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(n_runs):
        for form in ("old", "new"):
            t0 = time.perf_counter()
            build(form).write.format("noop").mode("overwrite").save()
            t[form].append(time.perf_counter() - t0)
    med = statistics.median
    for form, xs in t.items():
        print(
            f"{form} median {med(xs):.3f}s  [{min(xs):.3f}, {max(xs):.3f}]"
        )
    print(f"new/old = {med(t['new']) / med(t['old']):.3f}")


if __name__ == "__main__":
    main()
