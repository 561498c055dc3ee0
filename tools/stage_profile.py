#!/usr/bin/env python3
"""Per-stage task-count/runtime profile for registered queries — the
round-15 underparallelism audit (guide §1.1/§2.5).

Runs each named query once (DSL build + full toArrow fetch, the bench
protocol) and dumps every stage the run submitted, via the local Spark
UI REST API: stage name, numTasks, executorRunTime, input/shuffle
volumes.  A stage whose executorRunTime dominates the query while
numTasks ≪ cores is compute serialized on too few partitions — the
AQE-coalescing blind spot where a relation is tiny in BYTES but feeds
superlinear or per-row-heavy COMPUTE (O(n²) verifies, mapInPandas
kernels, iterative joins), so bytes-based coalescing starves it of
cores.

Usage: python tools/stage_profile.py [sf_dir] q_name [q_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark import get_spark


def stages(ui: str, app: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        return json.load(r)


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    # the engine session disables the UI; this probe needs its REST API
    from spark_streaming_join_example_spark import session as _sess

    _sess.BUILD_CONFS = {**_sess.BUILD_CONFS, "spark.ui.enabled": "true"}
    spark = get_spark("stage-profile")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app = sc.applicationId
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    qd = queries_dict()
    for name in args:
        seen = {s["stageId"] for s in stages(ui, app)}
        spark.catalog.clearCache()
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        qd[name](spark, sf_dir).toArrow()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        time.sleep(0.5)  # let the UI ingest the final stage events
        new = [s for s in stages(ui, app) if s["stageId"] not in seen]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} stages ===")
        tot = sum(s.get("executorRunTime", 0) for s in new)
        for s in new[:14]:
            rt = s.get("executorRunTime", 0)
            print(
                f"  run {rt/1000:7.3f}s ({(100*rt/max(tot,1)):4.1f}%)"
                f" tasks {s['numTasks']:4d}"
                f"  in {s.get('inputBytes',0)>>20:5d}M"
                f" sh_r {s.get('shuffleReadBytes',0)>>20:4d}M"
                f" sh_w {s.get('shuffleWriteBytes',0)>>20:4d}M"
                f"  {s.get('name','')[:70]}"
            )
        print(f"  total executorRunTime {tot/1000:.3f}s")


if __name__ == "__main__":
    main()
