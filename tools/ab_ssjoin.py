#!/usr/bin/env python3
"""A/B the stream-stream join's two knobs (r8 VERDICT item 4):
state-store provider (HDFS-backed memory vs RocksDB) × shuffle
partition count for the streaming checkpoint.

Why these two: the symmetric-hash stream-stream join keeps FOUR state
stores per shuffle partition (keyToNumValues / keyWithIndexToValue on
each side), and every micro-batch pays a per-store load/commit.  At
local[32]'s default 32 shuffle partitions that is 128 store commits a
batch for a 100k-row fixture — pure fixed overhead at this scale.
RocksDB swaps the in-memory map for an embedded LSM: worse constants
on tiny state, the right choice only when state outgrows executor
memory.

Usage: python tools/ab_ssjoin.py [sf_dir] [n_chunks]
Prints one JSON line per config + a summary; nothing outside /tmp.
Each config uses a FRESH checkpoint dir (shuffle partitions freeze
into a streaming checkpoint at first start — the documented T5
footgun).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from spark_streaming_join_example_spark import get_spark, load_table
from spark_streaming_join_example_spark.streaming import (
    chunk_events,
    jobs,
    read_event_stream,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def run_config(
    spark, replay: str, work: str, tag: str, shuffle: int, provider: str | None
) -> float:
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    stream = read_event_stream(spark, replay)
    clicks = stream.filter(F.col("event_type") == "click")
    buys = stream.filter(F.col("event_type") == "purchase")
    ck = os.path.join(work, f"ck_{tag}")
    t0 = time.perf_counter()
    q = (
        jobs.stream_stream_join(clicks, buys)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("ab-ssjoin")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ab_ssjoin_")
    replay = os.path.join(work, "replay")
    chunk_events(spark, sf_dir, replay, n_chunks=n_chunks)
    n_rows = load_table(spark, sf_dir, "events").count()
    default_shuffle = spark.conf.get("spark.sql.shuffle.partitions")

    configs = [
        ("hdfs_32", 32, None),
        ("hdfs_8", 8, None),
        ("hdfs_4", 4, None),
        ("hdfs_2", 2, None),
        ("rocksdb_32", 32, ROCKSDB),
        ("rocksdb_8", 8, ROCKSDB),
    ]
    out = {}
    try:
        for tag, shuffle, provider in configs:
            # one throwaway warm + two measured drains, keep the median-ish min
            samples = []
            for i in range(3):
                s = run_config(
                    spark, replay, work, f"{tag}_{i}", shuffle, provider
                )
                samples.append(s)
            best = min(samples[1:])  # drop the cold first drain
            out[tag] = {
                "s": round(best, 3),
                "rows_per_s": int(n_rows / best),
                "all_s": [round(x, 3) for x in samples],
            }
            print(json.dumps({tag: out[tag]}), flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default_shuffle)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"rows": n_rows, "n_chunks": n_chunks, "configs": out}))


if __name__ == "__main__":
    main()
