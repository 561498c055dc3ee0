"""Input-size guards for documented quadratic baselines.

Some registered queries are deliberately O(n²): they exist as
oracle-checkable exact baselines for the sub-quadratic production
paths (LSH near-dup, IVF/PQ vector search).  Each is bounded on the
fixture (doc_id < 2000, dimension-sized eval samples), but nothing in
the DataFrame API stops a user from pointing one at a 100× corpus —
at which point the all-pairs join is a cluster-killer, not a slow
query.  ``assert_allpairs_bounded`` mirrors ``knn_join``'s
``max_queries`` raise-guard (operators/similarity.py): fail fast with
a pointer to the scale path instead of launching the join.

The count() this runs is one extra cheap job over the (already
filtered, column-pruned) input — a driver-side scalar, the same class
as the iterative kernels' convergence probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class AllPairsBoundExceeded(ValueError):
    """An all-pairs baseline was invoked above its documented bound."""


def assert_allpairs_bounded(
    df: DataFrame, max_rows: int, what: str, scale_path: str
) -> DataFrame:
    """Return ``df`` unchanged if it holds at most ``max_rows`` rows;
    raise :class:`AllPairsBoundExceeded` (naming the sub-quadratic
    alternative) otherwise."""
    n = df.count()
    if n > max_rows:
        raise AllPairsBoundExceeded(
            f"{what}: input has {n} rows, above the documented all-pairs "
            f"bound of {max_rows} (O(n²) join ≈ {n * (n - 1) // 2:,} "
            f"pairs). This query is an exact ORACLE baseline; at this "
            f"size use the sub-quadratic path instead: {scale_path}"
        )
    return df
