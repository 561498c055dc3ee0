"""Cross-engine-exact numeric aggregates.

Floating-point SUM is order-dependent; Spark's partial-agg combine
order differs from DuckDB's morsel order, so ``sum(double)`` is not
reproducible bit-for-bit across engines (or across partitionings of the
same engine!).  The fixtures' numeric columns are fixed-point in
disguise (quantities: 2dp, prices: 2dp, discounts/tax: 4dp,
events.value: 6dp — profiled in FIXTURES.md), so we sum exactly:

    sum(x)  ≡  CAST(SUM(CAST(ROUND(x*scale) AS BIGINT)) AS DOUBLE)/scale

Integer sums are associative → order-independent → identical in any
engine at any partitioning.  The final double division is a single IEEE
op on both sides.  This also makes results *stable at 100 TB*: the
answer doesn't change when the partition count does.

Each helper has an ``oracle_*`` twin emitting the equivalent DuckDB SQL
so query authors can't drift the two formulations apart.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

#: scales chosen so scale*|x|*rows stays far below 2^63 at sf0.1 and
#: beyond (price ~1e5 → 1e11 at scale 1e6; 6e8 rows at 100× sf0.1 would
#: still need partitioned decimal — documented limit, fine for fixtures).
MONEY = 100  # 2-decimal columns: prices, quantity, acctbal
RATE = 10_000  # 4-decimal columns: discount, tax
VALUE = 1_000_000  # 6-decimal columns: events.value, price*(1-disc)


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def exact_sum(col: Column | str, scale: int = MONEY) -> Column:
    """Order-independent sum of a fixed-point-in-double column."""
    c = _as_col(col)
    scaled = F.round(c * F.lit(float(scale))).cast("long")
    return F.sum(scaled).cast("double") / F.lit(float(scale))


def oracle_exact_sum(expr: str, scale: int = MONEY) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {float(scale)}) AS BIGINT)) AS DOUBLE)"
        f" / {float(scale)}"
    )


def exact_avg(col: Column | str, scale: int = MONEY) -> Column:
    """Order-independent mean: exact integer sum, then two IEEE divides."""
    c = _as_col(col)
    scaled = F.round(c * F.lit(float(scale))).cast("long")
    return (
        F.sum(scaled).cast("double")
        / F.count(F.lit(1)).cast("double")
        / F.lit(float(scale))
    )


def oracle_exact_avg(expr: str, scale: int = MONEY) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {float(scale)}) AS BIGINT)) AS DOUBLE)"
        f" / CAST(COUNT(*) AS DOUBLE) / {float(scale)}"
    )
