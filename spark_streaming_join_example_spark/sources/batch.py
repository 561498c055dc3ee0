"""Batch parquet source (SURVEY.md §2.1 S1).

``load_table`` is the single entry point every query uses: it repairs
runtime confs on whatever session it's given (the verify driver builds
its own), applies the explicit schema (no footer-inference job), and
normalizes ``events.ts`` to TimestampType (µs) whatever the fixture's
physical encoding.

The fixture generator has shipped ``events.ts`` two ways across
refreshes: raw int64 / parquet TIMESTAMP(NANOS) nanoseconds (read as
LongType via ``nanosAsLong``), and plain parquet ``timestamp[us]``.
``_events_ts_is_raw_nanos`` sniffs ONE footer per path (driver-side,
cached — at 100 TB this is a single metadata read, not a scan) and the
loader branches:

- nanos: explicit LongType schema, then ``timestamp_micros(ts div
  1000)``.  Integer division, NOT float division, which loses precision
  at 2^62-scale nanosecond values and can shift the microsecond by ±1
  vs the DuckDB oracle's truncating cast.
- timestamp[us/ms]: explicit TimestampType schema, no conversion.
  Session TZ is pinned UTC, so NTZ-stored values collect identically to
  the DuckDB oracle's naive timestamps.
"""

from __future__ import annotations

import functools
import glob
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import EVENTS, EVENTS_RAW, RAW_SCHEMAS
from ..session import ensure_runtime_confs


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


@functools.lru_cache(maxsize=64)
def _events_ts_is_raw_nanos(path: str) -> bool | None:
    """Sniff the parquet footer: is ``ts`` stored as nanoseconds?

    True  → int64 or TIMESTAMP(NANOS) (Spark reads LongType under
            ``nanosAsLong``; loader must divide by 1000).
    False → TIMESTAMP(MICROS/MILLIS) (Spark reads TimestampType).
    None  → footer unreadable here; caller falls back to Spark schema
            inference.
    """
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        candidates = [path]
        if os.path.isdir(path):
            candidates = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not candidates:
                return None
        t = pq.read_schema(candidates[0]).field("ts").type
        if pa.types.is_timestamp(t):
            return t.unit == "ns"
        return True  # plain integer column = raw nanos convention
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table with its canonical logical schema."""
    ensure_runtime_confs(spark)
    path = table_path(sf_dir, name)
    if name == "events":
        raw_nanos = _events_ts_is_raw_nanos(path)
        if raw_nanos is None:
            # pyarrow couldn't read the footer — one driver-side
            # inference pass (still metadata-only for parquet).
            from pyspark.sql.types import LongType

            inferred = spark.read.parquet(path).schema["ts"].dataType
            raw_nanos = isinstance(inferred, LongType)
        if raw_nanos:
            df = spark.read.schema(EVENTS_RAW).parquet(path)
            # raw int64 ns → µs (exact integer division) → TimestampType.
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return spark.read.schema(EVENTS).parquet(path)
    schema = RAW_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
