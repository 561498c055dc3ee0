"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in
``spark_streaming_join_example_spark/plans/`` — one named query per
operator row of SURVEY.md §2, each with a DuckDB oracle twin where the
semantics are SQL-expressible (approximate/seeded operators are
rows-only by design and exactness-tested in tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_join_example_spark.plans.registry import (
    oracle_sql_dict,
    queries_dict,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the 3-way revenue join (scan → broadcast dim join →
    fact join → agg), exercising the whole batch stack end-to-end.
    """
    return queries_dict()["q_revenue_join3"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return oracle_sql_dict()
