"""Batch parquet source (SURVEY.md §2.1 S1).

``load_table`` is the single entry point every query uses: it repairs
runtime confs on whatever session it's given (the verify driver builds
its own), applies the explicit schema (no footer-inference job), and
normalizes ``events.ts`` from raw int64 nanoseconds to TimestampType.

ns→µs uses integer division (``ts div 1000``) — NOT float division,
which loses precision at 2^62-scale nanosecond values and can shift the
microsecond by ±1 vs the DuckDB oracle's truncating cast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_SCHEMAS
from ..session import ensure_runtime_confs


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table with its canonical logical schema."""
    ensure_runtime_confs(spark)
    schema = RAW_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(table_path(sf_dir, name))
    if name == "events":
        # raw int64 ns → µs (exact integer division) → TimestampType.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
