#!/usr/bin/env python3
"""A/B of spark.sql.adaptive.coalescePartitions.minPartitionSize
(guide §2.2/§2.5 + the r15 underparallelism audit).

With coalescePartitions.parallelismFirst=true (the default), AQE's
post-shuffle target size is max(totalBytes / defaultParallelism,
minPartitionSize).  On KB-to-MB fixture shuffles the 1 MB default
floor dominates, so compute-heavy reduce stages (count windows over
exploded shingles, pair-expansion aggregates, ranking kernels) run at
bytes/1MB ≈ 2-6 tasks on a 32-core session.  Lowering the floor only
changes behavior when bytes-per-core < 1 MB — at production scale
totalBytes/parallelism dominates and the setting is inert.

Build-time conf ⇒ arms cannot share a session: each sample is a fresh
subprocess (one session, 3 timed DSL+fetch runs per query, in-child
median), and arms ALTERNATE A,B,A,B so box noise lands on both.

VERDICT (2026-08-18, three probe rounds at sf0.1): REJECTED — signs
flip round to round (headline totals B/A 0.88 / 0.98 / 0.95;
q_rfm_segments 0.71 then 1.07/1.08; q_equi_depth_histogram 0.58 then
0.98/0.93; q_cross_doc_ngram_dup 1.35 / 0.93 / 1.19), i.e. the true
effect is below this box's episodic-steal noise, with regression risk
concentrated on the heavy tier.  session.py keeps the stock 1 MB
floor; this file stays as the rejection record and the re-measurement
harness for a quieter box.

VERDICT r16 (2026-08-18, fourth probe round on the r16 box — the
quiet-box retry VERDICT r15 item 9 asked for): PERMANENTLY CLOSED as
rejected.  Headline total B/A 0.944 (sub-scheduling-floor queries —
noise), but the per-query signs STILL flip vs earlier rounds
(q_distinct_users 1.259 this round) and the one consistent LOSER
across rounds is a real heavy query: q_cross_doc_ngram_dup 1.35 /
0.93 / 1.19 / 1.234 (its count-window reduce stage wants FEWER,
larger post-shuffle partitions, not more).  The one consistent winner
(q_equi_depth_histogram 0.58/0.98/0.93/0.785) does not outweigh it,
and at production scale the setting is inert (bytes/core >> 1 MB).
The stock 1 MB floor stays.

Usage: python tools/ab_minpartsize.py [sf_dir] [n_rounds]
       python tools/ab_minpartsize.py --child <conf_value> <sf_dir> q...
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

PANEL = [
    "q_cross_doc_ngram_dup",
    "q_collab_filter",
    "q_dup_clusters",
    "q_rfm_segments",
    "q_equi_depth_histogram",
    "q_auc_ranksum",
]
HEADLINE = [
    "q_pricing_summary",
    "q_revenue_join3",
    "q_window_rank",
    "q_events_tumbling",
    "q_stream_static_join",
    "q_distinct_users",
    "q_text_tokens",
    "q_cosine_topk",
]


def child(conf_value: str, sf_dir: str, names: list[str]) -> None:
    from spark_streaming_join_example_spark import session as _sess

    # "default" = Spark's stock 1 MB floor, set explicitly so the A arm
    # stays pinned even if session.py ever changes the shipped value
    _sess.BUILD_CONFS = {
        **_sess.BUILD_CONFS,
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": (
            "1m" if conf_value == "default" else conf_value
        ),
    }
    from spark_streaming_join_example_spark import get_spark
    from spark_streaming_join_example_spark.plans.registry import queries_dict

    spark = get_spark("ab-minpartsize")
    qd = queries_dict()
    # global warmup (bench protocol)
    for n in names:
        qd[n](spark, sf_dir).toArrow()
    out = {}
    for n in names:
        samples = []
        for _ in range(3):  # in-child median: blunts steal spikes
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qd[n](spark, sf_dir).toArrow()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[n] = samples[1]
    print("RESULT " + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4:])
        return
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_rounds = int(args[1]) if len(args) > 1 else 3
    names = PANEL + HEADLINE
    arms = {"A_1m_default": "default", "B_128k": "128k"}
    t: dict[str, dict[str, list[float]]] = {
        a: {n: [] for n in names} for a in arms
    }
    for _ in range(n_rounds):
        for arm, conf in arms.items():
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 conf, sf_dir, *names],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
            assert line, f"{arm}: child failed\n{r.stderr[-2000:]}"
            for n, s in json.loads(line[0][7:]).items():
                t[arm][n].append(s)
    a, b = t["A_1m_default"], t["B_128k"]
    for n in names:
        ma, mb = statistics.median(a[n]), statistics.median(b[n])
        print(
            f"{n}: A {ma:.3f}s [{min(a[n]):.3f},{max(a[n]):.3f}]"
            f"  B {mb:.3f}s [{min(b[n]):.3f},{max(b[n]):.3f}]"
            f"  B/A {mb/ma:.3f}"
        )
    ha = sum(statistics.median(a[n]) for n in HEADLINE)
    hb = sum(statistics.median(b[n]) for n in HEADLINE)
    print(f"headline_total: A {ha:.4f}s  B {hb:.4f}s  B/A {hb/ha:.3f}")


if __name__ == "__main__":
    main()
