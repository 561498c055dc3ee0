"""Streaming replay harness (SURVEY.md §5.3, §2.1 S2/S6/S9).

Structured Streaming's published correctness property is prefix
integrity (SIGMOD'18 "Structured Streaming"): a streaming query's
output equals the batch query over the prefix consumed.  This harness
makes that testable offline:

- ``chunk_events``: split the events fixture into K chronological
  parquet files (stand-in for a Kafka topic — no broker in this
  sandbox) with increasing mtimes so ``maxFilesPerTrigger=1`` replays
  them in order, one micro-batch each;
- ``read_event_stream``: the streaming source with the same explicit
  µs-timestamp schema the batch loader normalizes to (streaming
  sources never infer schemas);
- ``run_to_memory``: drain with ``trigger(availableNow=True)`` into a
  memory sink and hand back the result table.
"""

from __future__ import annotations

import os
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..schemas import EVENTS
from ..session import ensure_runtime_confs
from ..sources.batch import load_table


def chunk_events(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 8,
    reorder: dict[int, int] | None = None,
) -> list[str]:
    """Split events into chronological chunk files under ``out_dir``.

    ``reorder`` maps replay position → chronological chunk index
    (0-based): {1: 2, 2: 1} plays the 3rd chunk in the 2nd slot and
    the 2nd chunk in the 3rd slot, crafting out-of-order/late-data
    replays — the file written later carries a later mtime, so the
    file source delivers it in a later micro-batch even though its
    event times are older. The permutation is built in one pass
    (positions absent from the mapping keep their chunk), so mutually
    inverse entries like {1: 2, 2: 1} express the swap directly rather
    than cancelling out as sequential in-place swaps would.
    """
    ensure_runtime_confs(spark)
    # load_table normalizes ts to TimestampType(µs) whatever the
    # fixture's physical encoding; chunks are re-written as
    # timestamp[us] so the streaming reader needs no conversion.
    raw = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    chunked = raw.withColumn("__chunk", F.ntile(n_chunks).over(w))
    reorder = reorder or {}
    order = [reorder.get(pos, pos) + 1 for pos in range(n_chunks)]
    if sorted(order) != list(range(1, n_chunks + 1)):
        raise ValueError(f"reorder is not a permutation: {reorder}")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for pos, chunk_id in enumerate(order):
        part = chunked.filter(F.col("__chunk") == chunk_id).drop("__chunk")
        pdf = part.toPandas()
        path = os.path.join(out_dir, f"chunk_{pos:03d}.parquet")
        # pandas holds ts as datetime64[ns]; coerce back to µs so the
        # chunk schema matches EVENTS exactly (values are already
        # µs-truncated by the loader — no information is lost).
        pdf.to_parquet(
            path,
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        # strictly increasing mtimes → deterministic replay order
        mtime = time.time() - (len(order) - pos)
        os.utime(path, (mtime, mtime))
        paths.append(path)
    return paths


def read_event_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """Streaming events source over a replay directory (explicit
    schema; chunks are written as timestamp[us] by ``chunk_events``,
    so no further normalization is needed)."""
    ensure_runtime_confs(spark)
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(dir_path)


def run_to_memory(
    sdf: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
    name: str | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame into a memory sink (availableNow)
    and return the collected table."""
    spark = sdf.sparkSession
    qname = name or f"mem_{uuid.uuid4().hex[:12]}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(qname)
