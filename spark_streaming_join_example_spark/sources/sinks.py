"""Streaming sinks (SURVEY.md §2.1 S5-S8).

Thin wrappers that standardize checkpointing — exactly-once on the
file sink comes from the checkpoint WAL (offsets logged before
execution) + idempotent file commits; tests/test_streaming.py proves
re-running a drained checkpoint emits nothing new.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def to_console(sdf: DataFrame, output_mode: str = "append") -> StreamingQuery:
    return sdf.writeStream.format("console").outputMode(output_mode).start()


def to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def to_foreach_batch(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch escape hatch (upserts, similarity-index refresh,
    multi-sink fan-out). ``fn(batch_df, batch_id)`` must be idempotent
    per batch_id for exactly-once."""
    w = sdf.writeStream.foreachBatch(fn).option("checkpointLocation", checkpoint_dir)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def to_foreach_rows(
    sdf: DataFrame,
    process_row: Callable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Per-row foreach sink (push each result row to an external
    system, e.g. a feature store or alert bus).

    ``process_row(row)`` runs ON THE EXECUTORS, once per output row per
    partition attempt — it must be idempotent (at-least-once per row;
    exactly-once needs a keyed upsert on the receiving side).  Prefer
    ``to_foreach_batch`` at scale: per-row Python calls serialize every
    row through the Python worker, while foreachBatch keeps the batch
    as a JVM DataFrame."""
    w = (
        sdf.writeStream.foreach(process_row)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
