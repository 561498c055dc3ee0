"""Arbitrary stateful streaming operator (SURVEY.md §2.9 T4):
sessionization with applyInPandasWithState — the escape hatch for
semantics session_window can't express (per-key custom merge logic,
timers, TTL).

State model per user_id: (session_start_us, last_event_us, n_events).
Micro-batch handling:
- merge the batch's (time-sorted) events into the open session,
  emitting every session that closes (gap ≥ `gap`);
- park the still-open session in state and arm an event-time timer at
  last_event + gap: when the watermark passes it, the timeout branch
  emits the session and clears state.

Scale: state is one tiny tuple per active key (not per event), keyed
state shards with the shuffle partitioning, and the watermark bounds
both memory and emission latency. RocksDB state store recommended
beyond ~10⁷ active keys.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def sessionize_with_state(
    events: DataFrame, gap_minutes: int = 5, watermark: str = "10 minutes"
) -> DataFrame:
    """Gap-based sessions per user via explicit keyed state + event-time
    timeout. Output rows are CLOSED sessions only (same contract as
    session_window in append mode)."""
    gap_us = gap_minutes * 60 * _US

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_us, last_us, n)

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] >= gap_us:
                    closed.append(tuple(cur))
                    cur = [t, t, 1]
                else:
                    cur[1] = t
                    cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # event-time timer: fire when watermark passes last+gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(l + gap_us, unit="us") for _, l, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user cumulative event counter via transformWithStateInPandas
    (Spark 4.x StatefulProcessor API — typed state handles, timers,
    initial-state support; supersedes applyInPandasWithState).

    Emits (user_id, n_events) with the cumulative count after each
    micro-batch that touched the key — the streaming-upsert shape
    (outputMode=update) a feature-store pipeline uses.

    Scale: one ValueState[long] per key, sharded by the groupBy
    partitioning; RocksDB provider keeps the working set off-heap
    (transformWithStateInPandas REQUIRES
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider — set it before ``start()``).

    Environment note: the TWS state-server protocol needs
    ``google.protobuf`` in the Python env. This container lacks it, so
    the operator raises a clear error here and is covered by a skipped
    test; ``sessionize_with_state`` (applyInPandasWithState) is the
    exercised T4 path.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(its Python<->JVM state server speaks protobuf); not "
            "installed in this environment"
        ) from exc
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            total = prev + n
            self._count.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=CountProcessor(),
            outputStructType="user_id long, n_events long",
            outputMode="update",
            timeMode="none",
        )
    )


EWMA_OUTPUT_SCHEMA = "user_id long, event_id long, ewma_e6 long"
EWMA_STATE_SCHEMA = "vals array<double>"


def ewma_with_state(
    events: DataFrame, w: float = 0.6, depth: int = 8
) -> DataFrame:
    """Streaming twin of plans/analytics.q_ewma: bounded-depth EWMA of
    purchase values per user via explicit keyed state.

    State per user is just the last ``depth-1`` values (newest first) —
    O(depth) per key, the property that makes the BOUNDED smoother
    streamable; the unbounded-recursion EWMA would need exact replay.
    Each micro-batch processes its rows in (ts, event_id) order,
    computes the weighted mean over the weights present, emits one row
    per event, and parks the updated tail back in state.

    Determinism contract: the weighted sum accumulates in the same
    k-ascending IEEE order as the batch query's expression chain, so a
    chronological replay reproduces the batch output bit-for-bit
    (proven in tests/test_streaming.py).  No timers: state is a fixed
    ring per key, so there is nothing to expire (at production scale
    you would still arm a TTL timer to reap dormant keys).
    """
    weights = [w**k for k in range(depth)]

    def update(key, pdfs, state):
        (user_id,) = key
        import math
        import pandas as pd  # local import keeps the worker pickle lean

        if state.exists:
            (prev,) = state.get
            tail = list(prev)
        else:
            tail = []
        rows = []
        # Concatenate ALL Arrow chunks for the key before sorting:
        # applyInPandasWithState splits a large group into multiple
        # chunks (arrow maxRecordsPerBatch, default 10k) in no
        # particular order — sorting each chunk independently would
        # process a >10k-row key out of (ts, event_id) order and break
        # the documented batch-parity contract at production scale.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                lags = [float(val)] + tail
                num = 0.0
                den = 0.0
                for k, wk in enumerate(weights):
                    if k < len(lags):
                        num = num + lags[k] * wk
                        den = den + wk
                ewma = num / den
                # HALF_UP (round half AWAY FROM ZERO) in micro-units,
                # matching Spark round() / DuckDB for negative values
                # too — floor(x+0.5) alone would round -2.5e-6 up.
                e6 = math.copysign(
                    math.floor(abs(ewma * 1000000.0) + 0.5), ewma
                )
                rows.append((int(user_id), int(eid), int(e6)))
                tail = ([float(val)] + tail)[: depth - 1]
        state.update((tail,))
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "event_id", "ewma_e6"])

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=_GST.NoTimeout,
        )
    )


CROSSINGS_OUTPUT_SCHEMA = (
    "user_id long, n_crossings long, first_crossing_id long"
)
CROSSINGS_STATE_SCHEMA = "last_value double, n long, first_id long"


def threshold_crossings_with_state(
    events: DataFrame, threshold: float = 3.0
) -> DataFrame:
    """Streaming twin of plans/round18.q_threshold_crossings: per-user
    upward threshold-crossing counter via explicit keyed state.

    State per user is THREE scalars — the last seen value, the
    crossing count, and the MINIMUM crossing event_id (−1 until set;
    the batch twin reports MIN(event_id) over crossings, and event
    ids are NOT time-ordered in the fixture, so "first" means
    lowest-id, maintained as a running min) — the smallest possible
    arbitrary-stateful shape, and the one the batch twin's docstring
    promises ("one float + one flag per key").
    The last value genuinely crosses micro-batch boundaries: a batch
    ending at value ≤ threshold followed by a batch opening above it
    must count exactly one crossing, which no per-batch window can
    express.

    Each micro-batch processes its rows in (ts, event_id) order
    (chunks concatenated first — the >10k-row-group Arrow-chunk
    lesson from ewma_with_state applies verbatim) and emits the
    user's UPDATED (n_crossings, first_crossing_id) row only when a
    new crossing occurred in the batch, so a full drain's final row
    per user equals the batch query exactly (pinned in
    tests/test_streaming.py; n_crossings is monotone, so "final" is
    the max).  Strict float comparisons match the batch twin:
    prev ≤ threshold < current on identical stored doubles."""

    def update(key, pdfs, state):
        (user_id,) = key
        import pandas as pd  # local import keeps the worker pickle lean

        if state.exists:
            last, n, first_id = state.get
        else:
            last, n, first_id = None, 0, -1
        changed = False
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                v = float(val)
                if last is not None and last <= threshold < v:
                    n += 1
                    if first_id < 0 or int(eid) < first_id:
                        first_id = int(eid)
                    changed = True
                last = v
        if last is not None:
            # `last` stays None only when the key arrives with zero
            # non-empty chunks and no prior state (possible if a
            # timeout conf is ever added); storing float(None) would
            # TypeError in the executor, and there is nothing to
            # record — skip the update and keep state untouched.
            state.update((float(last), int(n), int(first_id)))
        if changed:
            yield pd.DataFrame(
                [(int(user_id), int(n), int(first_id))],
                columns=["user_id", "n_crossings", "first_crossing_id"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CROSSINGS_OUTPUT_SCHEMA,
        stateStructType=CROSSINGS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_GST.NoTimeout,
    )


BURSTS_OUTPUT_SCHEMA = (
    "user_id long, n_errors long, n_chained long, first_chained_id long"
)
BURSTS_STATE_SCHEMA = (
    "last_error_us long, n_errors long, n_chained long, first_id long"
)


def error_bursts_with_state(
    events: DataFrame, gap_us: int = 43_200_000_000
) -> DataFrame:
    """Streaming twin of plans/round21.q_error_bursts: per-user
    chained-error detector (an error arriving within ``gap_us`` of the
    SAME user's previous error) via explicit keyed state.

    State per user is FOUR scalars — the last error's epoch-µs, the
    total error count, the chained count, and the MINIMUM chained
    event_id (−1 until set; the batch twin reports MIN(event_id) over
    chained rows and fixture ids are not time-ordered, so "first"
    means lowest-id, kept as a running min).  The last-error register
    genuinely crosses micro-batch boundaries: a batch ending with an
    error followed by a batch opening with one inside the gap must
    count exactly one chained pair — the same boundary argument as
    threshold_crossings_with_state, with a TIME register instead of a
    value register.

    Each micro-batch processes its rows in (ts, event_id) order
    (chunks concatenated first) and emits the user's updated row only
    when the batch contained at least one error for the key, so
    n_errors strictly increases across a user's emissions and the
    final (max-n_errors) row per user equals the batch query exactly
    (pinned in tests/test_streaming.py)."""

    def update(key, pdfs, state):
        (user_id,) = key
        import pandas as pd  # local import keeps the worker pickle lean

        if state.exists:
            last_us, n_err, n_chained, first_id = state.get
        else:
            last_us, n_err, n_chained, first_id = -1, 0, 0, -1
        changed = False
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for eid, ts in zip(pdf["event_id"], pdf["ts"]):
                t_us = int(ts.value) // 1000  # pandas ns → µs
                if last_us >= 0 and t_us - last_us <= gap_us:
                    n_chained += 1
                    if first_id < 0 or int(eid) < first_id:
                        first_id = int(eid)
                last_us = t_us
                n_err += 1
                changed = True
        if changed:
            state.update(
                (int(last_us), int(n_err), int(n_chained), int(first_id))
            )
            yield pd.DataFrame(
                [(int(user_id), int(n_err), int(n_chained), int(first_id))],
                columns=[
                    "user_id",
                    "n_errors",
                    "n_chained",
                    "first_chained_id",
                ],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=BURSTS_OUTPUT_SCHEMA,
            stateStructType=BURSTS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=_GST.NoTimeout,
        )
    )


LOCF_OUTPUT_SCHEMA = "user_id long, event_id long, locf_value double"
LOCF_STATE_SCHEMA = "has_value boolean, val double"


def locf_with_state(events: DataFrame) -> DataFrame:
    """Streaming twin of plans/round21.q_locf_value's carry: every
    event emitted with the SAME user's most recent STRICTLY-PRIOR
    purchase value (LOCF imputation) via one (flag, double) of keyed
    state.

    Unlike the counter-shaped twins (crossings, bursts), this operator
    is a per-row ENRICHMENT — output rows == input rows, each row
    annotated from state BEFORE the row itself updates it (a purchase
    sees the PREVIOUS purchase, the batch window's exclusive frame
    end).  The carry genuinely crosses micro-batch boundaries: a
    purchase closing one batch must impute the clicks opening the
    next.

    Each micro-batch processes its rows in (ts, event_id) order
    (chunks concatenated first); rows with no prior purchase emit
    NULL, exactly like the batch window before the first match."""

    def update(key, pdfs, state):
        (user_id,) = key
        import pandas as pd  # local import keeps the worker pickle lean

        if state.exists:
            has, val = state.get
        else:
            has, val = False, 0.0
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for eid, etype, v in zip(
                pdf["event_id"], pdf["event_type"], pdf["value"]
            ):
                rows.append(
                    (int(user_id), int(eid), float(val) if has else None)
                )
                if etype == "purchase":
                    has, val = True, float(v)
            state.update((bool(has), float(val)))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "locf_value"]
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=LOCF_OUTPUT_SCHEMA,
        stateStructType=LOCF_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_GST.NoTimeout,
    )


PSESS_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, closed_by string"
)
PSESS_STATE_SCHEMA = "start_us long, last_us long, n long"


def purchase_sessions_with_state(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "45 minutes"
) -> DataFrame:
    """Streaming twin of plans/round20.q_purchase_session_stats'
    per-session relation: 30-minute-gap sessions over the PURCHASE
    slice, one row per CLOSED session (append semantics), with a
    `closed_by` provenance column that records WHICH path emitted it —
    'event' (a later same-user purchase arrived with gap >= 30 min)
    or 'timer' (the event-time timeout fired when the watermark passed
    last_event + gap with nothing newer buffered).

    The column exists for the test pins: the other stateful twins
    (crossings, bursts, LOCF) never register a timer, so the
    setTimeoutTimestamp -> hasTimedOut emission path had no twin
    coverage; asserting BOTH markers appear in a replay proves the
    timeout API actually fired rather than every session happening to
    close by a successor event.  Batch comparisons drop the column
    (micro-batch composition decides which path closes a given
    session; the session VALUES are path-independent).

    Scale: state is one (start, last, n) triple per user with an open
    purchase session — not per event; the pre-filter prunes ~80 % of
    the stream before the keyed shuffle; timers bound both state
    memory and emission latency by the watermark delay."""
    gap_us = gap_minutes * 60 * _US

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, str]] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n, "timer"))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
                )
            ts_us.sort()
            cur = list(state.get) if state.exists else None
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] >= gap_us:
                    closed.append((cur[0], cur[1], cur[2], "event"))
                    cur = [t, t, 1]
                else:
                    # Late events the watermark admits may precede the
                    # open session's bounds: extend via min/max so a
                    # straggler never shrinks session_end (which would
                    # enable a spurious split against the true last
                    # event) and session_start reaches back to the true
                    # earliest member — matching the batch
                    # session_window's arrival-order-independent merge.
                    # Residual (documented) gap vs batch: an event
                    # older than start - gap is merged here rather than
                    # opened as its own earlier session; the 45-minute
                    # watermark bounds how stale such an event can be.
                    cur[0] = min(cur[0], t)
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(l + gap_us, unit="us")
                        for _, l, _, _ in closed
                    ],
                    "n_events": [n for _, _, n, _ in closed],
                    "closed_by": [c for _, _, _, c in closed],
                }
            )

    return (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=PSESS_OUTPUT_SCHEMA,
            stateStructType=PSESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


RUNS_OUTPUT_SCHEMA = (
    "user_id long, longest_run long, n_runs long, n_events long"
)
RUNS_STATE_SCHEMA = (
    "cur_type string, cur_len long, best long, n_runs long, n_events long"
)


def type_runs_with_state(events: DataFrame) -> DataFrame:
    """Streaming twin of plans/round20.q_longest_type_run: per-user
    longest consecutive SAME-EVENT-TYPE run (categorical equality
    chain) via explicit keyed state — the fifth stateful-twin shape.
    The counter twins carry numeric registers (value, time); this one
    carries a CATEGORICAL register (the open run's type) plus its
    length, so the state machine's transition test is string equality
    rather than an arithmetic comparison.

    The open run genuinely crosses micro-batch boundaries: a run whose
    first half closes one batch and second half opens the next must
    count as ONE run (cur_type + cur_len survive in state), which a
    per-batch recomputation cannot get right.

    Each micro-batch processes its rows in (ts, event_id) order and
    emits the user's updated (longest_run, n_runs, n_events) row when
    the batch contained events for the key; n_events strictly
    increases across a user's emissions, so the final (max-n_events)
    row per user equals the batch query exactly (pinned in
    tests/test_streaming.py)."""

    def update(key, pdfs, state):
        (user_id,) = key
        import pandas as pd  # local import keeps the worker pickle lean

        if state.exists:
            cur_type, cur_len, best, n_runs, n_events = state.get
        else:
            cur_type, cur_len, best, n_runs, n_events = None, 0, 0, 0, 0
        changed = False
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for etype in pdf["event_type"]:
                if etype == cur_type:
                    cur_len += 1
                else:
                    cur_type = etype
                    cur_len = 1
                    n_runs += 1
                if cur_len > best:
                    best = cur_len
                n_events += 1
                changed = True
        if changed:
            state.update(
                (
                    cur_type,
                    int(cur_len),
                    int(best),
                    int(n_runs),
                    int(n_events),
                )
            )
            yield pd.DataFrame(
                [(int(user_id), int(best), int(n_runs), int(n_events))],
                columns=["user_id", "longest_run", "n_runs", "n_events"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNS_OUTPUT_SCHEMA,
        stateStructType=RUNS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_GST.NoTimeout,
    )


RL_OUTPUT_SCHEMA = "user_id long, event_id long, kept boolean"
RL_STATE_SCHEMA = "bkts array<long>, ns array<long>"
_RL_WINDOW_US = 10 * 60 * _US
_RL_QUOTA = 3
_RL_KEEP = 8  # trailing buckets retained per key (bounded state)


def rate_limit_with_state(
    events: DataFrame,
    window_us: int = _RL_WINDOW_US,
    quota: int = _RL_QUOTA,
) -> DataFrame:
    """Streaming twin of plans/round14.q_rate_limit: the fixed-window
    THROTTLE — at most `quota` events per user per `window_us` bucket
    are admitted; later arrivals in the bucket are suppressed.  Keyed
    state is a small MAP of recent buckets (parallel arrays: bucket id
    -> admitted count, the `_RL_KEEP` most recent retained) — the
    per-bucket counter starts fresh on each new bucket, the cyclic
    transition no other twin exercises, and a LATE event from an
    already-seen earlier bucket charges THAT bucket's counter instead
    of resetting the open one (the r14-ADVICE hazard: a single-bucket
    register would zero the open quota on any out-of-order arrival and
    then re-zero it again on return).

    Emits the per-event VERDICT (user_id, event_id, kept) — output
    rows == input rows, the enrichment contract — so the batch
    comparison is row-for-row, not a fold.  The quota genuinely
    crosses micro-batch boundaries: a user admitted 3 times late in
    one batch must have the same bucket's 4th event SUPPRESSED when it
    arrives in the next batch, which per-batch recomputation would
    admit.

    Semantics under disorder (documented, bounded): admission within a
    bucket is by ARRIVAL order, which equals the batch row_number
    (ts, event_id) definition whenever arrival is time-ordered per key
    — the replay/restart pins' path.  Under cross-batch disorder exact
    row_number equivalence is unattainable in an emit-once stream (an
    admitted verdict cannot be retracted when an earlier-timestamped
    straggler lands), so the twin guarantees the throttle's contract —
    never more than `quota` admitted per bucket — and an event older
    than the retained horizon (`_RL_KEEP` windows behind the newest
    seen) is conservatively SUPPRESSED, the safe direction for a rate
    limiter, without touching state."""

    def update(key, pdfs, state):
        (user_id,) = key
        import pandas as pd  # local import keeps the worker pickle lean

        if state.exists:
            bkts, ns = state.get
            counts = dict(zip(bkts, ns))
        else:
            counts = {}
        rows = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for eid, ts in zip(pdf["event_id"], pdf["ts"]):
                b = (int(ts.value) // 1000) // window_us
                if b not in counts and len(counts) >= _RL_KEEP and b < min(
                    counts
                ):
                    # Older than the retained horizon: conservatively
                    # suppress; its bucket's true count is forgotten.
                    rows.append((int(user_id), int(eid), False))
                    continue
                n = counts.get(b, 0)
                rows.append((int(user_id), int(eid), bool(n < quota)))
                counts[b] = n + 1
            if len(counts) > _RL_KEEP:  # trim to the newest _RL_KEEP
                for stale in sorted(counts)[: len(counts) - _RL_KEEP]:
                    del counts[stale]
            keys = sorted(counts)
            state.update(
                ([int(k) for k in keys], [int(counts[k]) for k in keys])
            )
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "kept"]
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _GST

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RL_OUTPUT_SCHEMA,
        stateStructType=RL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=_GST.NoTimeout,
    )
