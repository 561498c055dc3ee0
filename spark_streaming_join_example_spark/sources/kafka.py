"""Kafka source/sink (SURVEY.md §2.1 S3) — the reference's canonical
transport for streaming joins.

This sandbox has no Kafka broker (and no spark-sql-kafka connector
jar), so these builders are the documented production path: they
construct the exact readStream/writeStream plans a cluster deployment
uses, and raise a clear error here if actually started. Everything
downstream of the source (from_json parse, watermark, joins, aggs) is
identical to the file-source path the tests exercise — that is the
point of Structured Streaming's unified source abstraction: swap S2
for S3 and no query changes.

Scale notes (100 TB / high-throughput topics):
- parallelism = topic partitions; size them >= 2-3x executor cores.
  ``minPartitions`` can split fat Kafka partitions into more Spark
  tasks without re-partitioning the topic.
- ``maxOffsetsPerTrigger`` bounds per-micro-batch intake so state
  stores and sinks see steady load (backpressure).
- offsets live in the checkpoint WAL, NOT in Kafka consumer groups —
  a restarted query resumes exactly where the checkpoint says.
- the value payload stays ``binary`` until ``parse_json_payload``;
  schema evolution is handled there (permissive mode → corrupt-record
  column), never by the source.

Integration recipe (run where a broker exists): the connector is a
Maven package whose version must match the installed PySpark —

    spark-submit \\
      --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \\
      tools/kafka_roundtrip.py --bootstrap <host:9092> \\
      --topic spark_graft_rt --out /tmp/kafka_rt

``tools/kafka_roundtrip.py`` drives events.parquet through produce →
readStream → parse_json_payload → foreachBatch parquet and asserts
count + checksum equality against the source table — the end-to-end
proof this sandbox cannot run.  The parse path itself is unit-tested
offline (tests/test_sources.py::test_parse_json_payload_*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import StringType, StructType


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """readStream from Kafka: rows are (key binary, value binary,
    topic, partition, offset, timestamp, timestampType)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        r = r.option("minPartitions", str(min_partitions))
    return r.load()


def parse_json_payload(
    kafka_df: DataFrame,
    schema: StructType | str,
    ts_col: str | None = None,
) -> DataFrame:
    """The canonical Kafka decode step: value binary → string →
    from_json(schema) → flattened columns (+ optional event-time cast).

    Malformed payloads land in ``_corrupt`` (PERMISSIVE mode) instead
    of failing the query — at 100 TB there is always a bad record.
    from_json only routes bad records to columnNameOfCorruptRecord when
    that field EXISTS in the schema, so this helper appends a
    ``_corrupt STRING`` field when the caller's schema lacks one
    (otherwise bad payloads would silently become all-NULL structs).
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if "_corrupt" not in schema.fieldNames():
        # copy first: StructType.add mutates self, and the schema
        # object belongs to the caller
        schema = StructType(list(schema.fields)).add("_corrupt", StringType())
    parsed = kafka_df.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(
            F.col("value").cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j"),
        F.col("timestamp").alias("_kafka_ts"),
    ).select("_key", "j.*", "_kafka_ts")
    if ts_col is not None:
        parsed = parsed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return parsed


def write_kafka_stream(
    sdf: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """writeStream to Kafka: payload = to_json(struct(*)), optional
    key column for partition affinity (same key → same topic
    partition → per-key ordering downstream)."""
    cols = [F.to_json(F.struct(*sdf.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return (
        sdf.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
