"""Join operators Spark lacks as single primitives (SURVEY.md §2.3 J8).

The as-of join here is NOT the naive `join + row_number` (which
materializes every (left, right-before) pair — quadratic per key and
hopeless at 100 TB).  It's the sort-merge formulation: union both
sides, one shuffle on the key, one ordered window pass, `last(right,
ignorenulls)` carries the most recent right row forward to each left
row.  O(n log n) per key, no pair explosion, and the single shuffle is
on the same key a downstream group-by would reuse.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (``direction="backward"``,
    the default), or the EARLIEST right row with ``right.ts >=
    left.ts`` (``direction="forward"``).

    Column names must not collide between ``left`` and ``right``
    (rename before calling).  ``how`` is ``left`` (keep unmatched left
    rows, right columns null) or ``inner``.  ``tolerance`` (an interval
    Column, e.g. ``F.expr("INTERVAL 1 HOUR")``) drops matches older
    than ``left.ts - tolerance``.

    If several right rows share the maximum timestamp for a key the
    surviving payload among them is unspecified (same as DuckDB's ASOF
    JOIN) — add a unique column to ``right_ts`` ordering upstream if
    that matters.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be left|inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be backward|forward, got {direction!r}"
        )

    lcols, rcols = left.columns, right.columns
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"asof_join: overlapping column names {sorted(overlap)}")

    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*rcols).alias("__rpay"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias(
            "__lpay"
        ),
    )
    l = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(F.struct(*rcols)).schema[0].dataType).alias(
            "__rpay"
        ),
        F.struct(*lcols).alias("__lpay"),
    )
    if direction == "backward":
        # right rows sort before left rows at equal ts → `<=` semantics;
        # carry the last right payload seen so far.
        w = (
            Window.partitionBy("__key")
            .orderBy("__ts", "__side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__rpay", ignorenulls=True).over(w)
    else:
        # forward: left rows sort before right rows at equal ts →
        # `>=` semantics; take the first right payload still to come.
        w = (
            Window.partitionBy("__key")
            .orderBy("__ts", F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__rpay", ignorenulls=True).over(w)
    merged = (
        r.unionByName(l)
        .withColumn("__match", carry)
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        bound_ok = (
            F.col(f"__match.{right_ts}") >= F.col("__ts") - tolerance
            if direction == "backward"
            else F.col(f"__match.{right_ts}") <= F.col("__ts") + tolerance
        )
        merged = merged.withColumn(
            "__match", F.when(bound_ok, F.col("__match"))
        )
    if how == "inner":
        merged = merged.filter(F.col("__match").isNotNull())
    out = merged.select(
        *[F.col(f"__lpay.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in rcols],
    )
    return out
