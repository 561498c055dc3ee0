#!/usr/bin/env python3
"""Kafka end-to-end round-trip proof for S3 (run where a broker exists).

This sandbox has no Kafka broker and no spark-sql-kafka connector jar,
so S3 cannot be integration-tested here (the JSON parse step IS unit
tested: tests/test_sources.py::test_parse_json_payload_*).  This script
is the runnable-elsewhere proof: on any machine with a broker it drives
events through a produce → readStream → parse → foreachBatch-parquet
round trip and asserts the parquet output equals what was produced.

Launch (the connector ships as a Maven package, version must match the
installed PySpark — for PySpark 4.1.x):

    spark-submit \
      --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
      tools/kafka_roundtrip.py \
      --bootstrap localhost:9092 --topic spark_graft_rt \
      --sf-dir /root/testdata/sf0.001 --out /tmp/kafka_rt

Steps:
1. read events.parquet, serialize each row to JSON, writeStream them
   to the topic via write_kafka_stream (availableNow trigger);
2. readStream the topic from earliest via read_kafka_stream,
   parse_json_payload back to typed columns;
3. foreachBatch-land the parsed rows to parquet.  foreachBatch is
   AT-LEAST-ONCE: a batch retried after a crash between the parquet
   write and the checkpoint commit re-runs with the same batch_id, so
   the sink must be idempotent per batch_id — each batch writes to a
   batch_id-named subdirectory with overwrite, making the retry a
   harmless rewrite instead of a duplicate append;
4. compare row count + per-column checksums against the source table.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", required=True)
    ap.add_argument("--topic", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
    from spark_streaming_join_example_spark.sources.batch import load_table
    from spark_streaming_join_example_spark.sources.kafka import (
        parse_json_payload,
        read_kafka_stream,
    )

    spark = SparkSession.builder.appName("kafka-roundtrip").getOrCreate()
    ev = load_table(spark, args.sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    n_src = ev.count()

    # 1. produce: batch write is sufficient for the proof (the
    # streaming writer shares the same payload contract)
    (
        ev.select(
            F.col("user_id").cast("string").alias("key"),
            F.to_json(F.struct(*ev.columns)).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", args.bootstrap)
        .option("topic", args.topic)
        .save()
    )

    # 2-3. consume from earliest, parse, land to parquet
    kdf = read_kafka_stream(
        spark, args.bootstrap, args.topic, starting_offsets="earliest"
    )
    parsed = parse_json_payload(
        kdf,
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "ts TIMESTAMP, value DOUBLE",
        ts_col="ts",
    ).select("event_id", "user_id", "event_type", "ts", "value")

    def land(batch_df, batch_id: int) -> None:
        # idempotent per batch_id: a retried batch overwrites its own
        # subdir rather than appending duplicates (foreachBatch is
        # at-least-once; exactly-once only if the write is idempotent)
        batch_df.write.mode("overwrite").parquet(
            f"{args.out}/data/batch_id={batch_id}"
        )

    q = (
        parsed.writeStream.foreachBatch(land)
        .option("checkpointLocation", args.out + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # 4. verify
    got = spark.read.parquet(args.out + "/data")
    n_got = got.count()
    src_sum = ev.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    got_sum = got.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    ok = n_got == n_src and tuple(src_sum) == tuple(got_sum)
    print(f"produced={n_src} consumed={n_got} checksums_match={tuple(src_sum) == tuple(got_sum)}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
