"""Input-size guards for documented quadratic baselines.

Some registered queries are deliberately O(n²): they exist as
oracle-checkable exact baselines for the sub-quadratic production
paths (LSH near-dup, IVF/PQ vector search).  Each is bounded on the
fixture (doc_id < 2000, dimension-sized eval samples), but nothing in
the DataFrame API stops a user from pointing one at a 100× corpus —
at which point the all-pairs join is a cluster-killer, not a slow
query.  ``assert_allpairs_bounded`` mirrors ``knn_join``'s
``max_queries`` raise-guard (operators/similarity.py): fail fast with
a pointer to the scale path instead of running the join.

LAZY since r9 (advisor request): the r8 version ran ``df.count()`` at
plan-BUILD time, so merely constructing a guarded plan launched Spark
jobs — tools that build every registered plan (plan audits, schema
reports, ``explain`` sweeps) paid a job per guarded query and plan
construction could fail on data errors.  The check now rides the plan
itself: a 1-row count aggregate of the guarded input is filtered
through ``assert_true`` and cross-joined (broadcast, so it plans as a
BroadcastNestedLoopJoin build of exactly one row) onto the input.
Construction is action-free; the FIRST execution evaluates the guard
relation before the quadratic join can stream, and an oversized input
fails the job with :class:`AllPairsBoundExceeded`'s message instead of
launching n² work.  The check is a filter, not a projected column, so
Catalyst cannot prune it away.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class AllPairsBoundExceeded(ValueError):
    """An all-pairs baseline was invoked above its documented bound.

    EXCEPTION-TYPE CONTRACT (r10, advisor request): with the lazy
    guard the violation surfaces at EXECUTION time as Spark's
    ``SparkRuntimeException`` (from ``assert_true``) whose message
    CONTAINS this class's name and full text — a bare
    ``except AllPairsBoundExceeded`` around ``.collect()`` will NOT
    catch it.  Catch broadly and classify with
    :func:`is_allpairs_bound_error`, or use :func:`check_now` when you
    want a real Python-side ``AllPairsBoundExceeded`` at build time.
    The class itself is raised only by ``check_now`` and kept as the
    greppable contract."""


def is_allpairs_bound_error(exc: BaseException) -> bool:
    """True if ``exc`` is an all-pairs bound violation in EITHER form:
    the eager ``AllPairsBoundExceeded`` from :func:`check_now`, or the
    execution-time ``SparkRuntimeException`` the lazy guard's
    ``assert_true`` raises (identified by the class name embedded in
    the guard message).  This is the supported way to catch the lazy
    guard — see :class:`AllPairsBoundExceeded`'s contract note."""
    return isinstance(exc, AllPairsBoundExceeded) or (
        "AllPairsBoundExceeded" in str(exc)
    )


def assert_allpairs_bounded(
    df: DataFrame, max_rows: int, what: str, scale_path: str
) -> DataFrame:
    """Return ``df`` with an embedded row-count bound check.

    Plan construction stays action-free.  At execution, if ``df`` holds
    more than ``max_rows`` rows the job fails with a message naming the
    sub-quadratic alternative (``scale_path``) before the downstream
    all-pairs join runs; otherwise the guard is one broadcast row and
    the output is value-identical to ``df``.

    COST NOTE (advisor, r10): the guard's count aggregate is a SECOND
    subtree over ``df``, so every action on the returned frame scans
    the guarded input twice (the count side is map-side-partial — one
    long per task — but the scan itself is not shared).  That is the
    deliberate price of an unprunable in-plan check on an ORACLE
    baseline whose input is bounded by construction; if the input is
    expensive to produce, persist/localCheckpoint it BEFORE guarding so
    both subtrees read the materialized form, or use :func:`check_now`
    which scans once, eagerly.  Violations surface as
    ``SparkRuntimeException`` — classify with
    :func:`is_allpairs_bound_error` (see the class docstring)."""
    msg = F.concat(
        F.lit(
            f"AllPairsBoundExceeded: {what}: input has "
        ),
        F.col("__n").cast("string"),
        F.lit(
            f" rows, above the documented all-pairs bound of {max_rows} "
            f"(O(n²) join). This query is an exact ORACLE baseline; at "
            f"this size use the sub-quadratic path instead: {scale_path}"
        ),
    )
    guard = (
        df.groupBy()
        .agg(F.count(F.lit(1)).alias("__n"))
        # a FILTER containing assert_true cannot be column-pruned away
        # (it decides row existence); assert_true returns null when the
        # bound holds and raises otherwise
        .filter(F.assert_true(F.col("__n") <= max_rows, msg).isNull())
        .select(F.lit(1).alias("__allpairs_bound_ok"))
    )
    return df.crossJoin(F.broadcast(guard)).drop("__allpairs_bound_ok")


def check_now(
    df: DataFrame, max_rows: int, what: str, scale_path: str
) -> DataFrame:
    """Eager variant of :func:`assert_allpairs_bounded` — runs the
    count immediately and raises :class:`AllPairsBoundExceeded` from
    Python.  For interactive use where failing at build time is the
    point."""
    n = df.count()
    if n > max_rows:
        raise AllPairsBoundExceeded(
            f"{what}: input has {n} rows, above the documented all-pairs "
            f"bound of {max_rows} (O(n²) join ≈ {n * (n - 1) // 2:,} "
            f"pairs). This query is an exact ORACLE baseline; at this "
            f"size use the sub-quadratic path instead: {scale_path}"
        )
    return df
