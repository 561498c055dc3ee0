"""Incrementally-maintained materialized view (S8/T-family).

The production pattern for keeping a queryable aggregate table fresh
from a stream without ever recomputing it from raw history:

  stream → windowless groupBy agg (UPDATE mode: each micro-batch emits
  only the groups whose values CHANGED) → foreachBatch → dynamic
  partition overwrite of exactly those groups' partitions.

Scale properties (the reason this shape survives 100 TB):
- state is one row per group (the agg), not raw history;
- each batch rewrites only touched partitions — write amplification
  tracks the CHANGE rate, not the table size;
- `partitionOverwriteMode=dynamic` makes the rewrite atomic per
  partition and idempotent: replaying a batch after a crash rewrites
  the same partitions with the same content (overwrite, not append),
  so the sink is exactly-once for this aggregate even though
  foreachBatch itself is at-least-once.

The view column doubles as the partition column, so readers prune to
the groups they ask for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def maintain_counts_view(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
):
    """Start the maintenance query: per-group count + exact value sum,
    materialized to `out_dir` partitioned by the group column."""
    agg = events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
            "sum_value_e6"
        ),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # per-write option, NOT the session conf: a session-level
        # toggle would leak dynamic-overwrite semantics into
        # concurrent writers in the same SparkSession
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(group_col)
            .parquet(out_dir)
        )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_counts_view(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)
