#!/usr/bin/env python3
"""A/B the r16 JVM-side µs conversion of the streaming temporal join
(streaming/temporal.py) against the r15 in-kernel-pandas form,
INTERLEAVED drain-for-drain (the ab_temporal protocol).

Arm A (old, inlined below — the r15 shipped operator): the state
kernel converts ts→µs with pd.to_datetime per KEY-GROUP invocation
and builds its output timestamps with two pd.to_datetime calls per
key-group; with ~|keys| kernel invocations per micro-batch those
per-group conversions are the dominant Python-boundary cost.
Arm B (new): epoch-µs computed ONCE, JVM-side (unix_micros) before
the groupBy; the kernel reads/emits plain longs; one vectorized
timestamp_micros select converts every key's output at once
(guide §4.1 — do conversions outside the per-group function).

Both drain the same chunked events fixture under trigger(availableNow)
into a noop sink at shuffle=8 (the stress_stream probe protocol; fresh
checkpoint per drain).  Output equality is asserted once via the
memory sink on the first drain pair.

Usage: python tools/ab_temporal2.py [sf_dir] [n_pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time
from bisect import bisect_right
from typing import Any, Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.streaming.replay import (
    read_event_stream,
)
from spark_streaming_join_example_spark.streaming.temporal import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    temporal_join_events,
)
from tools.stress_stream import chunk_events

_US = 1_000_000


def _old_temporal_join_events(stream):
    """The r15 operator body, verbatim (in-kernel pandas
    conversions), kept here as the A arm of the probe."""
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

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            v_ts, v_seq, v_val, e_ts, e_id, e_val = (
                list(x) for x in state.get
            )
        else:
            v_ts, v_seq, v_val, e_ts, e_id, e_val = [], [], [], [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
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
        versions_sorted = sorted(zip(v_ts, v_seq, v_val))
        sorted_ts = [x[0] for x in versions_sorted]
        out_rows: list[tuple] = []
        still_e: list[tuple[int, int, float]] = []
        for t, eid, val in zip(e_ts, e_id, e_val):
            if t >= wm_us:
                still_e.append((t, eid, val))
                continue
            i = bisect_right(sorted_ts, t)
            match = None
            if i:
                vt, _, vv = versions_sorted[i - 1]
                match = (vt, vv)
            out_rows.append((eid, t, val) + (match or (None, None)))
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
            state.update((
                [x[0] for x in keep], [x[1] for x in keep],
                [x[2] for x in keep], [x[0] for x in still_e],
                [x[1] for x in still_e], [x[2] for x in still_e],
            ))
            if still_e:
                state.setTimeoutTimestamp(
                    max(
                        min(t for t, _, _ in still_e) // 1000,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        if out_rows:
            yield pd.DataFrame({
                "user_id": [user_id] * len(out_rows),
                "event_id": [r[0] for r in out_rows],
                "ts": pd.to_datetime(
                    pd.Series([r[1] for r in out_rows]), unit="us"
                ),
                "value": [r[2] for r in out_rows],
                "dim_ts": pd.to_datetime(
                    pd.Series([r[3] for r in out_rows], dtype="object"),
                    unit="us",
                ),
                "dim_value": pd.Series(
                    [r[4] for r in out_rows], dtype="object"
                ),
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
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ab_temporal2_")
    replay = os.path.join(work, "replay")
    chunk_events(spark, sf_dir, replay, n_chunks=8)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def drain(builder, tag, sink="noop", table=None):
        stream = read_event_stream(spark, replay, max_files_per_trigger=None)
        ck = os.path.join(work, f"ck_{tag}")
        t0 = time.perf_counter()
        w = builder(stream).writeStream.format(sink).option(
            "checkpointLocation", ck
        )
        if table:
            w = w.queryName(table)
        q = w.trigger(availableNow=True).start()
        q.awaitTermination()
        return time.perf_counter() - t0

    # identity: both arms through the memory sink once
    drain(_old_temporal_join_events, "idA", sink="memory", table="ab2_a")
    drain(temporal_join_events, "idB", sink="memory", table="ab2_b")
    a = sorted(map(str, spark.table("ab2_a").collect()))
    b = sorted(map(str, spark.table("ab2_b").collect()))
    assert a == b, f"outputs differ: {len(a)} vs {len(b)} rows"
    print(f"identity OK ({len(a)} rows)", flush=True)

    A, B = [], []
    try:
        for i in range(n_pairs):
            arms = [("A", _old_temporal_join_events),
                    ("B", temporal_join_events)]
            if i % 2:
                arms.reverse()
            for name, builder in arms:
                dt = drain(builder, f"{name}{i}")
                (A if name == "A" else B).append(dt)
            print(f"pair {i}: A {A[-1]:.2f}s  B {B[-1]:.2f}s", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        import shutil
        shutil.rmtree(work, ignore_errors=True)
    ma, mb = statistics.median(A), statistics.median(B)
    print(f"A(old r15) med {ma:.3f}s {sorted(round(x, 2) for x in A)}")
    print(f"B(new r16) med {mb:.3f}s {sorted(round(x, 2) for x in B)}")
    print(f"ratio {mb / ma:.3f}")


if __name__ == "__main__":
    main()
