"""Streaming temporal (point-in-time) join — SURVEY.md §2 T4/J8:
enrich each event with the LATEST version of a changing dimension as
of the event's own timestamp (Flink temporal-table join / Kafka
Streams KTable join semantics), which Spark's built-in stream-stream
join cannot express: its join conditions bound a time RANGE, but
"the most recent version ≤ my timestamp" needs per-key ORDER, i.e.
state + custom merge logic.

Implementation: both inputs are tagged and unioned into ONE keyed
stream (the standard two-input encoding for a single-input stateful
operator), then ``applyInPandasWithState`` per join key holds

- a version buffer  (ts, seq, value) — the dimension's history,
- an event buffer   (ts, id, value)  — events not yet safe to emit,

and on every micro-batch (and on event-time timer wakeups):

1. append the batch's rows to the buffers;
2. emit every buffered event with ``ts < watermark`` (strictly: Spark
   treats rows AT the watermark as on-time, so a same-timestamp
   version could still arrive): versions with ``v_ts <= e_ts`` are
   then all present, so the as-of match — max (v_ts, v_seq) with
   v_ts ≤ e_ts — is FINAL;
3. prune versions: among those strictly before the watermark only the
   latest can ever match a future (≥ watermark) event, so exactly one
   survives;
4. arm an event-time timer at the earliest still-buffered event so
   emission needs no further input for this key.

Determinism: ties on version ts break by ``seq`` (the version's
unique id), making the operator a pure function of the input SET —
the batch twin is ``operators.joins.asof_join`` over tie-deduped
versions, and tests/test_streaming.py proves output equality under
in-order replay, out-of-order replay, and checkpoint restart.

Scale: state per key is one dimension version + the ≤ watermark-delay
window of events — the same bound a built-in stream-stream join's
symmetric hash state carries; keyed state shards with the shuffle
partitioning, and the watermark bounds both memory and latency.
RocksDB state store recommended beyond ~10⁷ active keys.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import ensure_runtime_confs

_US = 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, "
    "dim_ts timestamp, dim_value double"
)
#: what the state kernel itself emits (r16, guide §4.1): epoch-µs
#: longs instead of timestamps — the µs→timestamp conversion happens
#: ONCE, JVM-side and vectorized, in the select over the operator's
#: output, instead of two pd.to_datetime calls inside every per-key
#: kernel invocation (~|keys| of them per micro-batch).
_KERNEL_SCHEMA = (
    "user_id long, event_id long, ts_us long, value double, "
    "dim_ts_us long, dim_value double"
)
STATE_SCHEMA = (
    "v_ts array<long>, v_seq array<long>, v_val array<double>, "
    "e_ts array<long>, e_id array<long>, e_val array<double>"
)


def temporal_join(
    versions: DataFrame,
    events: DataFrame,
    watermark: str = "10 minutes",
    tolerance: str | None = None,
) -> DataFrame:
    """Point-in-time enrich ``events`` against the ``versions`` change
    stream, per ``user_id``.

    ``versions``: columns (user_id, ts, seq, dim_value) — ``seq`` is a
    unique version id used only to break same-timestamp ties.
    ``events``: columns (user_id, ts, event_id, value).

    Returns an append-mode stream of OUTPUT_SCHEMA rows: one row per
    event whose emission the watermark has finalized; ``dim_ts`` /
    ``dim_value`` are NULL when no version existed at or before the
    event (left as-of semantics).

    ``tolerance`` (e.g. ``"1 hour"``, same contract as
    ``operators.joins.asof_join``): a version older than
    ``event.ts - tolerance`` is considered stale and does NOT match —
    the event emits null-enriched instead.  Bonus at scale: with a
    tolerance the kept-version state needs no indefinite retention
    beyond the staleness horizon.
    """
    tol_us: int | None = None
    if tolerance is not None:
        per_us = {
            "second": _US, "seconds": _US,
            "minute": 60 * _US, "minutes": 60 * _US,
            "hour": 3600 * _US, "hours": 3600 * _US,
            "day": 86400 * _US, "days": 86400 * _US,
        }
        # one error surface for every malformed shape: "1h" (no
        # space), "1.5 hours" (non-int), "1 fortnight" (bad unit)
        try:
            n, unit = tolerance.split()
            tol_us = int(n) * per_us[unit.lower()]
        except (KeyError, ValueError):
            raise ValueError(
                f"temporal_join: tolerance {tolerance!r} must be "
                f"'<int> <unit>' with unit one of {sorted(set(per_us))}"
            ) from None
    # the update fn reads pandas wall-clock timestamps as UTC epoch µs
    # and compares them against the (true-epoch) watermark; pin the
    # session to UTC like every loader does, so the operator is correct
    # on sessions the engine did not create
    ensure_runtime_confs(versions.sparkSession)
    tagged_v = versions.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("seq").alias("tag_id"),
        F.col("dim_value").alias("payload"),
    )
    tagged_e = events.select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("tag_id"),
        F.col("value").alias("payload"),
    )
    # r16 (guide §4.1): compute epoch-µs ONCE, JVM-side and vectorized,
    # instead of a pd.to_datetime per key-group inside the kernel —
    # with ~|keys| kernel invocations per micro-batch the per-group
    # pandas conversions were the dominant Python-boundary cost.  The
    # watermark stays attached to the original ts column.
    both = (
        tagged_v.unionByName(tagged_e)
        .withWatermark("ts", watermark)
        .withColumn("ts_us", F.unix_micros("ts"))
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            v_ts, v_seq, v_val, e_ts, e_id, e_val = (list(x) for x in state.get)
        else:
            v_ts, v_seq, v_val, e_ts, e_id, e_val = [], [], [], [], [], []

        if not state.hasTimedOut:
            for pdf in pdfs:
                # mask-split the batch by side in four vectorized ops
                # (r15, guide §4.2) instead of a Python loop per row;
                # ts_us arrives precomputed from the JVM (r16, §4.1)
                ts_us = pdf["ts_us"]
                vm = (pdf["side"] == 0).to_numpy()
                tid = pdf["tag_id"].astype("int64")
                pay = pdf["payload"].astype("float64")
                v_ts.extend(ts_us[vm].tolist())
                v_seq.extend(tid[vm].tolist())
                v_val.extend(pay[vm].tolist())
                v_mask = ~vm
                e_ts.extend(ts_us[v_mask].tolist())
                e_id.extend(tid[v_mask].tolist())
                e_val.extend(pay[v_mask].tolist())

        wm_us = state.getCurrentWatermarkMs() * 1000

        # 2. emit finalized events (STRICTLY behind the watermark:
        # Spark admits rows AT the watermark as on-time, so a version
        # with v_ts == wm == e_ts could still arrive in a later batch
        # — only ts < wm is closed), as-of matched
        versions_sorted = sorted(zip(v_ts, v_seq, v_val))
        sorted_ts = [x[0] for x in versions_sorted]
        out_rows: list[tuple] = []
        still_e: list[tuple[int, int, float]] = []
        for t, eid, val in zip(e_ts, e_id, e_val):
            if t >= wm_us:
                still_e.append((t, eid, val))
                continue
            # rightmost version with v_ts <= t is max (ts, seq) — the
            # as-of match; bisect replaces the r14 linear scan (r15)
            i = bisect_right(sorted_ts, t)
            match = None
            if i:
                vt, _, vv = versions_sorted[i - 1]
                match = (vt, vv)
            if match is not None and tol_us is not None and match[0] < t - tol_us:
                match = None  # latest version is stale beyond tolerance
            out_rows.append((eid, t, val) + (match or (None, None)))

        # 3. prune versions: keep all at-or-beyond the watermark plus
        #    the single latest strictly before it (the only one a
        #    future — necessarily ≥ wm — event can still match)
        keep = [x for x in versions_sorted if x[0] >= wm_us]
        last_before = None
        for x in versions_sorted:
            if x[0] < wm_us:
                last_before = x
        if last_before is not None:
            keep.insert(0, last_before)

        if not still_e and not keep:
            state.remove()
        else:
            state.update(
                (
                    [x[0] for x in keep],
                    [x[1] for x in keep],
                    [x[2] for x in keep],
                    [x[0] for x in still_e],
                    [x[1] for x in still_e],
                    [x[2] for x in still_e],
                )
            )
            if still_e:
                # 4. wake when the watermark passes the earliest
                # pending event; the max() guards the sub-millisecond
                # case where µs-floor would land ON the watermark
                # (timers must be strictly beyond it)
                state.setTimeoutTimestamp(
                    max(
                        min(t for t, _, _ in still_e) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )

        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_rows),
                    "event_id": [r[0] for r in out_rows],
                    # r16 (guide §4.1): emit epoch-µs longs; the
                    # µs→timestamp conversion happens once, JVM-side,
                    # in the select below instead of two pd.to_datetime
                    # calls per key-group
                    "ts_us": [r[1] for r in out_rows],
                    "value": [r[2] for r in out_rows],
                    # object dtype keeps missing as None → Arrow NULL
                    # (a numeric column would smuggle NaN instead)
                    "dim_ts_us": pd.Series(
                        [r[3] for r in out_rows], dtype="object"
                    ),
                    "dim_value": pd.Series(
                        [r[4] for r in out_rows], dtype="object"
                    ),
                }
            )

    raw = both.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_KERNEL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    # one vectorized JVM conversion for every key's output; NULL
    # dim_ts_us stays NULL through timestamp_micros
    return raw.select(
        "user_id",
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        "value",
        F.timestamp_micros("dim_ts_us").alias("dim_ts"),
        "dim_value",
    )


def temporal_join_events(
    stream: DataFrame,
    watermark: str = "10 minutes",
    tolerance: str | None = None,
) -> DataFrame:
    """The fixture framing of ``temporal_join``: 'view' events are
    profile-score updates (the changing dimension), 'click' events get
    enriched with the profile score as of their click time."""
    versions = stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("seq"), F.col("value").alias("dim_value")
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return temporal_join(
        versions, clicks, watermark=watermark, tolerance=tolerance
    )
