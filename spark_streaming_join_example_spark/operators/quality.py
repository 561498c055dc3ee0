"""Single-pass data-quality observation — `df.observe()` wrappers.

At 100 TB a separate validation query doubles the scan bill; Spark's
Observation API rides aggregates on the SAME pass: metrics are
accumulated by the executors while the real query runs and surface on
the driver after the action, costing zero extra jobs.  Streaming
queries attach named `observe()` metrics that arrive per micro-batch
in `QueryProgressEvent.observedMetrics` — the hook monitoring/alerting
stacks consume.

Design notes:
- every metric must be an aggregate expression (Spark enforces this);
- observation names must be unique per DataFrame chain;
- for streaming, read metrics from the listener/`lastProgress`, not an
  `Observation` handle (handles only resolve for batch actions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


def observe_quality(
    df: DataFrame, name: str, checks: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``checks`` to ``df``'s next action.

    Returns the instrumented DataFrame (use IT downstream — metrics
    accumulate only through this node) and the `Observation` whose
    ``.get`` blocks until the first action completes.
    """
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(k) for k, c in checks.items()])
    return out, obs


def null_and_range_checks(
    required: list[str], bounds: dict[str, tuple[float, float]] | None = None
) -> dict[str, Column]:
    """Canned check set: row count, per-column null counts, and
    out-of-bounds counts for numeric columns."""
    checks: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for col in required:
        checks[f"null_{col}"] = F.count_if(F.col(col).isNull())
    for col, (lo, hi) in (bounds or {}).items():
        checks[f"oob_{col}"] = F.count_if(
            F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
        )
    return checks


def observe_stream(df: DataFrame, name: str, checks: dict[str, Column]) -> DataFrame:
    """Streaming variant: metrics surface per micro-batch in
    ``query.lastProgress['observedMetrics'][name]`` (and in listener
    ``QueryProgressEvent``s) — there is no Observation handle to wait
    on for unbounded queries."""
    return df.observe(name, *[c.alias(k) for k, c in checks.items()])
