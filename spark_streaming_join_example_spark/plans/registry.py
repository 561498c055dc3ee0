"""Query registry — the driver contract's backbone.

Every operator from SURVEY.md §2 ships as a named query over the
fixture tables with (a) a DataFrame formulation and (b), where
SQL-expressible, an equivalent DuckDB oracle.  ``__spark_entry__.py``
exposes this registry to the verification driver.

Determinism rules (FIXTURES.md harness notes): alias every computed
column identically in both formulations; break every top-k/limit tie
with a unique key; use functions.numeric exact aggregates for
double sums/means.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    tags: tuple[str, ...] = ()  # SURVEY.md §2 row ids, e.g. ("A1", "P2")
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco


def _load_all_plans() -> None:
    # import for side effect: populates REGISTRY
    from . import relational  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import extensions  # noqa: F401
    from . import udf_queries  # noqa: F401
    from . import advanced  # noqa: F401
    from . import analytics  # noqa: F401
    from . import round5  # noqa: F401
    from . import round5b  # noqa: F401
    from . import mleval  # noqa: F401


def queries_dict() -> dict[str, QueryFn]:
    _load_all_plans()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_dict() -> dict[str, str]:
    _load_all_plans()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
