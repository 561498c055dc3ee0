#!/usr/bin/env python3
"""A/B the r15 vectorization of the streaming temporal join's state
function (streaming/temporal.py) against the r14 row-at-a-time form,
INTERLEAVED drain-for-drain so box load hits both arms equally.

Arm A (old, inlined below): per-row Python loop over each batch
(Timestamp object per row, per-row side split), linear as-of scan per
event, per-row Timestamp construction in the output frame.
Arm B (new): the shipped operator — mask-split batch ingestion,
bisect as-of, whole-column µs->timestamp conversion (guide §4.2).

Both drain the same chunked events fixture under trigger(availableNow)
into a noop sink at shuffle=8 (the stress_stream probe protocol; fresh
checkpoint per drain).  Output equality is asserted once via
run_to_memory on the first drain pair.

Usage: python tools/ab_temporal.py [sf_dir] [n_pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time
from typing import Any, Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_streaming_join_example_spark import get_spark, load_table
from spark_streaming_join_example_spark.streaming.replay import (
    read_event_stream,
)
from spark_streaming_join_example_spark.streaming.temporal import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    temporal_join_events,
)
from tools.stress_stream import chunk_events


def _old_temporal_join_events(stream):
    """The r14 operator body, verbatim (row-at-a-time), kept here as
    the A arm of the probe."""
    versions = stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("seq"),
        F.col("value").alias("dim_value"),
    )
    events = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    tagged_v = versions.select(
        "user_id", "ts", F.lit(0).alias("side"),
        F.col("seq").alias("tag_id"), F.col("dim_value").alias("payload"),
    )
    tagged_e = events.select(
        "user_id", "ts", F.lit(1).alias("side"),
        F.col("event_id").alias("tag_id"), F.col("value").alias("payload"),
    )
    both = tagged_v.unionByName(tagged_e).withWatermark("ts", "10 minutes")

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            v_ts, v_seq, v_val, e_ts, e_id, e_val = (
                list(x) for x in state.get
            )
        else:
            v_ts, v_seq, v_val, e_ts, e_id, e_val = [], [], [], [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = [int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])]
                for t, side, tid, pay in zip(
                    ts_us, pdf["side"], pdf["tag_id"], pdf["payload"]
                ):
                    if side == 0:
                        v_ts.append(t); v_seq.append(int(tid)); v_val.append(float(pay))
                    else:
                        e_ts.append(t); e_id.append(int(tid)); e_val.append(float(pay))
        wm_us = state.getCurrentWatermarkMs() * 1000
        versions_sorted = sorted(zip(v_ts, v_seq, v_val))
        out_rows, still_e = [], []
        for t, eid, val in zip(e_ts, e_id, e_val):
            if t >= wm_us:
                still_e.append((t, eid, val)); continue
            match = None
            for vt, vs, vv in versions_sorted:
                if vt <= t: match = (vt, vv)
                else: break
            out_rows.append((eid, t, val) + (match or (None, None)))
        keep = [x for x in versions_sorted if x[0] >= wm_us]
        last_before = None
        for x in versions_sorted:
            if x[0] < wm_us: last_before = x
        if last_before is not None:
            keep.insert(0, last_before)
        if not still_e and not keep:
            state.remove()
        else:
            state.update((
                [x[0] for x in keep], [x[1] for x in keep], [x[2] for x in keep],
                [x[0] for x in still_e], [x[1] for x in still_e], [x[2] for x in still_e],
            ))
            if still_e:
                state.setTimeoutTimestamp(max(
                    min(t for t, _, _ in still_e) // 1000,
                    state.getCurrentWatermarkMs() + 1,
                ))
        if out_rows:
            yield pd.DataFrame({
                "user_id": [user_id] * len(out_rows),
                "event_id": [r[0] for r in out_rows],
                "ts": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                "value": [r[2] for r in out_rows],
                "dim_ts": [
                    pd.Timestamp(r[3], unit="us") if r[3] is not None else pd.NaT
                    for r in out_rows
                ],
                "dim_value": pd.Series([r[4] for r in out_rows], dtype="object"),
            })

    return both.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    work = tempfile.mkdtemp(prefix="ab_temporal_")
    replay = os.path.join(work, "replay")
    chunk_events(spark, sf_dir, replay, n_chunks=8)
    n = load_table(spark, sf_dir, "events").count()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    arms = {"A_old": _old_temporal_join_events, "B_new": temporal_join_events}

    # ---- output identity (memory sink, one drain per arm) -------------
    rows = {}
    for name, op in arms.items():
        stream = read_event_stream(spark, replay, max_files_per_trigger=None)
        q = (
            op(stream).writeStream.format("memory")
            .queryName(f"abt_{name}")
            .option("checkpointLocation", os.path.join(work, f"ckm_{name}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        rows[name] = sorted(
            map(tuple, spark.table(f"abt_{name}").collect())
        )
    assert rows["A_old"] == rows["B_new"], (
        f"arms diverge ({len(rows['A_old'])} vs {len(rows['B_new'])} rows)"
    )
    print(f"identity ok: {len(rows['A_old'])} emitted rows")

    t: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(n_pairs):
        for name, op in arms.items():
            stream = read_event_stream(
                spark, replay, max_files_per_trigger=None
            )
            ck = os.path.join(work, f"ck_{name}_{i}")
            t0 = time.perf_counter()
            q = (
                op(stream).writeStream.format("noop")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()
            t[name].append(time.perf_counter() - t0)
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    med = statistics.median
    for name, xs in t.items():
        print(
            f"{name} median {med(xs):.3f}s ({int(n / med(xs))} rows/s)  "
            f"[{min(xs):.3f}, {max(xs):.3f}]"
        )
    print(f"B/A = {med(t['B_new']) / med(t['A_old']):.3f}")


if __name__ == "__main__":
    main()
