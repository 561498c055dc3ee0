#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Artifact size contract (round-8 fix): the driver records only the last
~2000 characters of stdout, and r7's enlarged JSON (streaming +
heavy_spread sections) overflowed that window — BENCH_r07.json has
"parsed": null and the per-query detail was lost.  The FINAL stdout
line is therefore a COMPACT summary (total, per-headline-query,
vs_baseline, drift, worst-5 heavy, streaming rows/s — asserted
< 1900 chars); the full payload goes to BENCH_FULL.json next to this
script (file only — a long stdout line would leave a truncated JSON
fragment inside the driver's tail window).

Method mirrors BASELINE.md: one shared SparkSession (Spark's per-query
fixed overhead dominates at this scale); each query's DataFrame is
built once, then executed once cold — warming code paths, file
listings and the JIT — and five more times warm; the reported
per-query number is the MEDIAN of the five warm runs (robust to a
single scheduler hiccup, unlike min which under-reports or mean which
over-reports). Per-query min/max across the warm runs go out in
"spread" so a reader can tell a real regression from machine noise.
Timing the execution of an analyzed plan (rather than re-running the
Python DSL each time) isolates engine throughput from the ~0.3 s
driver-side Py4J/Catalyst analysis constant, which is amortized noise
in any long-lived deployment. `value` is the sum of warm medians.

Materialization is `df.toArrow()` — a FULL driver-side result fetch
over Spark's Arrow path, the production materialization for any
Python consumer.  The old `collect()` decoded every row through Py4J
pickling, which at 3-15k result rows measured the bridge (~25-140 ms)
instead of the engine; the DuckDB baseline's fetch is a native
columnar read that never pays an equivalent cost, so Arrow is the
apples-to-apples fetch (A/B at sf0.1: q_events_tumbling 0.104 →
0.060 s, q_window_rank 0.226 → 0.086 s; aggregation-only timings are
unchanged).

Section order (round-12 fix, VERDICT r11 item 2): headline →
STREAMING → heavy.  r11-and-earlier artifacts ran the streaming
drains LAST, after ~38 s of heavy-tier GC pressure, which turned the
rows/s numbers into a box-condition band (identical code spanned
9.8–18.5k rows/s on the temporal drain across five same-night
probes).  The probe now runs before the heavy tier and TWICE
(SPARK_GRAFT_STREAM_PROBES, default 2): the canonical ``streaming``
section is the second, warm probe; the first probe plus per-job
probe1/probe2 agreement ratios land in ``streaming_probe1``.
Streaming rows/s are NOT comparable to r11-and-earlier artifacts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_streaming_join_example_spark import get_spark
from spark_streaming_join_example_spark.plans.registry import (
    REGISTRY,
    queries_dict,
)


#: DuckDB-oracle WARM seconds at sf0.1 from BASELINE.md's table (the
#: 2× bar the driver grades against); embedded so the artifact
#: self-reports its ratio instead of making the reader cross-reference.
BASELINE_WARM_SF01 = {
    "q_pricing_summary": 0.238,
    "q_revenue_join3": 0.255,
    "q_window_rank": 0.325,
    "q_events_tumbling": 0.037,
    "q_stream_static_join": 0.055,
    "q_distinct_users": 0.066,
    "q_text_tokens": 0.108,
    "q_cosine_topk": 0.185,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("spark-graft-bench")
    qd = queries_dict()
    names = [n for n, s in sorted(REGISTRY.items()) if s.bench]

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    # Global warmup pass FIRST: JVM JIT of the shuffle/codegen/Arrow
    # machinery is shared across queries, so per-query-local warmup
    # makes the alphabetically-first query pay the whole JIT bill
    # (q_cosine_topk measured 0.28-0.42s for an identical plan
    # depending on session warmth). One cold pass over every query,
    # then the timed runs, removes the run-order dependence.
    dfs = {name: qd[name](spark, sf_dir) for name in names}

    def fetch(df):
        # full driver materialization over the Arrow path (see module
        # docstring); collect() fallback only when the method is truly
        # absent (old PySpark) — a try/except would silently eat
        # AttributeErrors raised INSIDE toArrow and fall back to the
        # bridge-dominated path with no signal
        if hasattr(df, "toArrow"):
            df.toArrow()
        else:
            df.collect()

    for df in dfs.values():
        fetch(df)

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        df = dfs[name]
        samples = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fetch(df)
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)
        spread[name] = [round(min(samples), 4), round(max(samples), 4)]

    # ------------------------------------------------------------------
    # Streaming throughput: end-to-end rows/s for the five core
    # streaming jobs (enrich, stream-stream join, tumbling agg, dedup,
    # temporal join) draining the chunked events fixture under
    # trigger(availableNow) into a noop sink — batched mode only here
    # (~25 s/probe; the chunked sustained-latency mode stays in
    # tools/stress_stream.py).
    #
    # SECTION ORDER (r12, VERDICT r11 item 2): this section runs
    # BEFORE the heavy tier.  r11's artifact ran it last, after ~38 s
    # of heavy-tier GC pressure, and five same-night probes of
    # identical code spanned 9.8–18.5k rows/s on the temporal drain —
    # the number was a box-condition band, not a signal.  Probing
    # first (and twice — the second, warm probe is the canonical
    # ``streaming`` section; the first is kept under
    # ``streaming_probe1`` with per-job agreement ratios) makes the
    # rows/s comparable round-over-round.  NOT comparable to
    # r11-and-earlier streaming numbers, which paid the heavy tier's
    # GC bill first.
    # ------------------------------------------------------------------
    streaming = None
    streaming_probe1 = None
    n_stream_probes = max(
        1, int(os.environ.get("SPARK_GRAFT_STREAM_PROBES", "3"))
    )
    if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
        try:
            from tools.stress_stream import probe as stream_probe

            # Three probes since r13 (VERDICT r12 item 6): on the r12
            # driver box the probe1/probe2 ratio hit 0.633 on enrich —
            # probe1 still carries first-drain warmup (checkpoint dir
            # creation, state-store class loading, sink codegen), so a
            # 2-probe scheme conflates warmup with reproducibility.
            # Probe1 is now a DECLARED warmup; the canonical number is
            # the LAST probe and `agreement` compares the two WARMEST
            # probes (probe2/probe3), which is the actual in-session
            # reproducibility claim.  The cold-warm gap stays visible
            # as `agreement_cold` (probe1/probeN).
            probes = [
                stream_probe(spark, sf_dir, modes=("batched",))
                for _ in range(n_stream_probes)
            ]
            streaming = probes[-1]
            if len(probes) > 1:
                # job payload shape: {job: {mode: {"s":…, "rows_per_s":…}}}
                def _rps(probe):
                    flat = {}
                    for job, modes in (probe.get("jobs") or {}).items():
                        if isinstance(modes, dict):
                            for payload in modes.values():
                                if isinstance(payload, dict) and payload.get(
                                    "rows_per_s"
                                ):
                                    flat[job] = payload["rows_per_s"]
                                    break
                    return flat

                rn = _rps(streaming)
                r_prev = _rps(probes[-2])
                r_cold = _rps(probes[0])
                streaming_probe1 = {
                    "jobs": probes[0].get("jobs"),
                    # warmest-pair rows-per-sec ratio per job: a value
                    # near 1.0 means the number is reproducible in-session
                    "agreement": {
                        k: round(r_prev[k] / rn[k], 3)
                        for k in r_prev
                        if rn.get(k)
                    },
                    # first-drain warmup gap (probe1 / canonical)
                    "agreement_cold": {
                        k: round(r_cold[k] / rn[k], 3)
                        for k in r_cold
                        if rn.get(k)
                    },
                }
        except Exception as e:  # never let the probe sink the artifact
            streaming = {"error": f"{type(e).__name__}: {e}"}

    # ------------------------------------------------------------------
    # Heavy kernels: the expensive distributed paths (graph joins,
    # connected components, O(n²) vector top-k) whose regressions the
    # cheap headline set cannot see.  Reported separately — NOT added
    # to `value`, keeping the headline metric comparable across rounds.
    # These queries persist loop-invariant relations, so each timed run
    # rebuilds the DataFrame from the DSL after clearing the cache:
    # what's measured is the full session-warm kernel, not a cache hit.
    # ------------------------------------------------------------------
    heavy_names = [
        n
        for n in (
            "q_pagerank",
            "q_triangle_count",
            "q_dup_clusters",
            "q_cosine_topk",
            "q_bfs_hops",
            "q_kcore",
            "q_collab_filter",
            "q_assortativity",
            # the round-6 two-phase global-window reworks (ntile/rank/
            # cumsum via operators/ranking): locally these pay fixed
            # multi-stage overhead vs the old single-partition sort —
            # tracked here so the scale-safe plans have recorded,
            # comparable numbers every round
            "q_equi_depth_histogram",
            "q_rrf_fusion",
            "q_shard_assign",
            "q_rfm_segments",
            "q_auc_ranksum",
            "q_calibration_bins",
            "q_pr_curve",
            "q_ks_statistic",
            # round-6 TPC-H gap shapes that build the derived
            # partsupp catalog (a |lineitem| groupBy) per run
            "q_min_cost_supplier",
            "q_important_stock",
            # round-7 additions: corpus-wide shingle dup (token-linear
            # shuffle + count window) and PQ candidate+rerank
            "q_cross_doc_ngram_dup",
            "q_pq_topk",
            # round-8: the retuned shingled MinHash LSH (was the
            # slowest registered query at 52 s pre-retune; watch it)
            "q_minhash_neardup",
            # round-9: the exact shingle-unit prefix-filter join (the
            # provably-complete dedup scale path; new operator mode)
            "q_prefix_shingle_join",
            # round-10: shingle-unit SimHash pairs (the scale mode of
            # the third dedup blocker; one-pass fingerprint kernel)
            "q_simhash_shingle_pairs",
        )
        if n in qd
    ]
    n_heavy_runs = int(os.environ.get("SPARK_GRAFT_HEAVY_RUNS", "3"))
    heavy: dict[str, float] = {}
    heavy_spread: dict[str, list[float]] = {}
    # The co-purchase graph kernels all run over the SAME edge relation
    # (plans/copurchase.py); since r9 the bench times them the way a
    # deployment runs them — one shared, persisted edge build (its cost
    # reported separately as graph_edge_build) and the kernels over the
    # cached relation, NO clearCache between their runs.  Everything
    # else keeps the clear-cache-per-run discipline.  Results are
    # value-identical either way (the correctness driver runs with
    # sharing OFF).
    graph_shared = {
        "q_pagerank",
        "q_triangle_count",
        "q_bfs_hops",
        "q_kcore",
        "q_assortativity",
    }

    def time_heavy(name: str, clear_between: bool) -> None:
        if clear_between:
            spark.catalog.clearCache()
        fetch(qd[name](spark, sf_dir))  # warm code paths once
        samples = []
        for _ in range(n_heavy_runs):
            if clear_between:
                spark.catalog.clearCache()
            # the DSL build is INSIDE the timer: iterative kernels
            # (connected components, k-core, PageRank) run their
            # driver loop — with eager localCheckpoint materialization
            # — at build time, so timing only the final fetch recorded
            # fake-low numbers for exactly the queries this section
            # exists to watch (q_dup_clusters showed 0.03 s while the
            # real kernel cost ~20 s).  r7+ heavy numbers are
            # therefore HIGHER and honest vs r6-and-earlier artifacts.
            t0 = time.perf_counter()
            fetch(qd[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        heavy[name] = round(statistics.median(samples), 4)
        heavy_spread[name] = [round(min(samples), 4), round(max(samples), 4)]

    # The three shingle-unit dedup pipelines recompute the SAME corpus
    # (doc_id, toks) relation — measured at 54 % of q_minhash_neardup's
    # wall time at sf0.1 (tools/ab_minhash.py, r12).  Since r12 the
    # bench times them the deployment way, mirroring the graph tier:
    # one shared localCheckpoint'd shingle build (cost reported as
    # `shingle_build`), kernels timed over it, entries tagged
    # "shared_shingles" in heavy_spread.  NOT comparable to r11-and-
    # earlier numbers for these three names.  Correctness paths run
    # with sharing OFF; results are pytest-pinned identical.
    shingle_shared = {
        "q_minhash_neardup",
        "q_prefix_shingle_join",
        "q_simhash_shingle_pairs",
    }

    for name in heavy_names:
        if name not in graph_shared and name not in shingle_shared:
            time_heavy(name, clear_between=True)

    shingle_names = [n for n in heavy_names if n in shingle_shared]
    shingle_build = None
    if shingle_names:
        from spark_streaming_join_example_spark.operators import dedup

        dedup._SHARED_TOKS_MEMO.clear()
        os.environ["SPARK_GRAFT_SHARE_SHINGLES"] = "1"
        try:
            t0 = time.perf_counter()
            toks = dedup.corpus_shingle_toks(spark, sf_dir)
            toks.count()  # materialize the shared checkpoint once
            shingle_build = round(time.perf_counter() - t0, 4)
            for name in shingle_names:
                time_heavy(name, clear_between=False)
                heavy_spread[name] = heavy_spread[name] + ["shared_shingles"]
        finally:
            os.environ.pop("SPARK_GRAFT_SHARE_SHINGLES", None)
            dedup._SHARED_TOKS_MEMO.clear()

    shared_names = [n for n in heavy_names if n in graph_shared]
    graph_edge_build = None
    if shared_names:
        from spark_streaming_join_example_spark.plans import copurchase

        spark.catalog.clearCache()
        copurchase._MEMO.clear()
        os.environ["SPARK_GRAFT_SHARE_EDGES"] = "1"
        try:
            t0 = time.perf_counter()
            edges = copurchase.copurchase_edges(spark, sf_dir)
            edges.count()  # materialize the shared persist once
            # r10 advisor fix: reported under its OWN top-level key,
            # not as a pseudo-entry inside the per-query heavy map —
            # it is a build step, not a query, and must not occupy a
            # heavy_worst5 slot.  Shared-mode kernels are tagged in
            # heavy_spread (third element "shared_edges") so naive
            # cross-round heavy diffs can't silently compare a
            # pre-cached-edge number against a cold one (≤ r8).
            graph_edge_build = round(time.perf_counter() - t0, 4)
            for name in shared_names:
                time_heavy(name, clear_between=False)
                heavy_spread[name] = heavy_spread[name] + ["shared_edges"]
        finally:
            os.environ.pop("SPARK_GRAFT_SHARE_EDGES", None)
            copurchase._MEMO.clear()
    spark.catalog.clearCache()

    value = round(sum(times.values()), 4)
    out = {
        "metric": "warm_total_headline_queries",
        "value": value,
        "unit": "sec",
        "queries": times,
        "spread": spread,
        "runs": n_runs,
        "heavy": heavy,
        "heavy_spread": heavy_spread,
        "heavy_runs": n_heavy_runs,
        "graph_shared_edges": sorted(shared_names),
        "graph_edge_build": graph_edge_build,
        "shingle_shared": sorted(shingle_names),
        "shingle_build": shingle_build,
        "streaming": streaming,
        "streaming_probe1": streaming_probe1,
        # r12+: streaming probes run BEFORE the heavy tier; r13+: probe1
        # is declared warmup, canonical is the LAST probe and
        # `agreement` compares the two warmest — see section comment.
        # Built from the actual probe count so an override via
        # SPARK_GRAFT_STREAM_PROBES is recorded faithfully (at n<3 the
        # warmup/agreement split collapses: agreement == agreement_cold
        # at n=2; neither exists at n=1).
        "streaming_method": (
            f"pre-heavy, canonical=probe{n_stream_probes}-of-"
            f"{n_stream_probes}, "
            + (
                f"agreement=probe{n_stream_probes - 1}/probe"
                f"{n_stream_probes}, probe1=warmup"
                + (
                    " (n<3: warmup/agreement split collapses)"
                    if n_stream_probes < 3
                    else ""
                )
                if n_stream_probes > 1
                else "single probe (no agreement)"
            )
        ),
        "sf": sf,
    }
    if sf == 0.1 and set(BASELINE_WARM_SF01) <= set(times):
        base_total = round(sum(BASELINE_WARM_SF01.values()), 4)
        out["baseline_total"] = base_total
        out["vs_baseline"] = round(value / base_total, 3)
        out["vs_baseline_per_query"] = {
            q: round(times[q] / b, 3) for q, b in BASELINE_WARM_SF01.items()
        }

    # ------------------------------------------------------------------
    # Round-over-round drift guard (the r6 lesson: a uniform +28%
    # environmental drift shipped unexplained).  Compare this total
    # against the newest BENCH_r*.json artifact; always RECORD the
    # ratio + any named cause in the artifact so drift can never ship
    # silently, and fail hard only under the builder's own gate
    # (SPARK_GRAFT_BENCH_GUARD=1) — the driver's recording run must
    # still produce an artifact on a noisy box.
    # ------------------------------------------------------------------
    recents, skipped = _recorded_totals()
    if skipped:
        # artifacts we could not recover a total from, recorded so a
        # round-over-round comparison can never silently lose a round
        # again (the r8 lesson: r7's artifact was skipped without trace
        # and r8's drift quietly compared to r6)
        out["skipped_unparseable"] = skipped
    if recents:
        prev_name, prev_total = recents[0]
        out["prev_artifact"] = prev_name
        out["prev_total"] = prev_total
        out["drift_vs_prev"] = round(value / prev_total, 3)
        if len(recents) > 1:
            # the two rounds before prev, when recoverable — enough
            # context to spot shared-box noise vs a real trend
            out["recent_totals"] = dict(recents[1:])
        cause = os.environ.get("SPARK_GRAFT_DRIFT_CAUSE")
        if cause:
            out["drift_cause"] = cause
        if out["drift_vs_prev"] > 1.5 and not cause:
            msg = (
                f"BENCH GUARD: headline total {value}s is "
                f"{out['drift_vs_prev']}x {prev_name}'s {prev_total}s "
                "(>1.5x) with no named cause — re-run on a quiet box or "
                "set SPARK_GRAFT_DRIFT_CAUSE to record an explanation"
            )
            print(msg, file=sys.stderr)
            if os.environ.get("SPARK_GRAFT_BENCH_GUARD") == "1":
                _emit(out)
                sys.exit(3)
    _emit(out)


def _heavy_comparability(heavy: dict, prev_name, here: str) -> dict:
    """``heavy_total_comparable``: the subset of this run's heavy tier
    that the PREVIOUS artifact's heavy_total could also contain, so a
    cross-round heavy drift read needs no manual subtraction (the r10
    lesson: q_simhash_shingle_pairs landed mid-round and r10's
    heavy_total was silently not comparable to r9's).

    A name ledger (BENCH_HEAVY_NAMES.json, committed) records, per
    heavy query, the newest BENCH_r*.json that existed when the name
    FIRST appeared.  A name whose first-seen artifact IS the current
    prev artifact was added after prev was recorded, so prev's total
    cannot include it — exclude it from the comparable sum and list it
    under ``heavy_new``.  Names present in the ledger (and in prev's
    total) but absent from this run are listed under ``heavy_dropped``
    and trimmed, so a later re-add is treated as new again."""
    path = os.path.join(here, "BENCH_HEAVY_NAMES.json")
    try:
        with open(path) as f:
            ledger = json.load(f)
        if not isinstance(ledger, dict):
            ledger = {}
    except Exception:
        ledger = {}
    marker = prev_name or ""
    for name in heavy:
        ledger.setdefault(name, marker)
    new = sorted(n for n in heavy if marker and ledger[n] == marker)
    dropped = sorted(
        n for n in ledger if n not in heavy and ledger[n] != marker
    )
    ledger = {n: v for n, v in ledger.items() if n in heavy}
    try:
        with open(path, "w") as f:
            json.dump(ledger, f, indent=0, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: comparability is still emitted
    res = {
        "heavy_total_comparable": round(
            sum(v for n, v in heavy.items() if n not in set(new)), 3
        )
    }
    if new:
        res["heavy_new"] = new
    if dropped:
        res["heavy_dropped"] = dropped
    return res


def _emit(out: dict) -> None:
    """Write the full payload to BENCH_FULL.json (file ONLY — a long
    stdout line would leave a truncated fragment in the driver's tail
    window), then print the compact summary as the FINAL stdout line
    (driver keeps ~2000 chars of tail; see module docstring)."""
    here = os.path.dirname(os.path.abspath(__file__))
    out.update(
        _heavy_comparability(
            out.get("heavy") or {}, out.get("prev_artifact"), here
        )
    )
    full = json.dumps(out)
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        f.write(full + "\n")
    # full JSON goes ONLY to the file: a >2000-char stdout line would
    # leave a truncated JSON fragment inside the driver's tail window
    # right above the compact line

    heavy = out.get("heavy") or {}
    worst5 = dict(
        sorted(heavy.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    streaming = out.get("streaming")
    stream_compact = None
    if isinstance(streaming, dict):
        # probe shape: {"rows": N, "n_chunks": K,
        #               "jobs": {job: {mode: {"rows_per_s": N, ...}}}}
        stream_compact = {}
        for job, modes in (streaming.get("jobs") or {}).items():
            if isinstance(modes, dict):
                for payload in modes.values():
                    if isinstance(payload, dict) and "rows_per_s" in payload:
                        stream_compact[job] = round(payload["rows_per_s"])
                        break
        if not stream_compact:  # probe errored or shape changed
            stream_compact = {"note": str(streaming)[:120]}
    compact = {
        k: out[k]
        for k in (
            "metric",
            "value",
            "unit",
            "queries",
            "runs",
            "sf",
            "baseline_total",
            "vs_baseline",
            "vs_baseline_per_query",
            "prev_artifact",
            "prev_total",
            "drift_vs_prev",
            "drift_cause",
            "recent_totals",
            "skipped_unparseable",
            "graph_edge_build",
            "shingle_build",
            "heavy_total_comparable",
            "heavy_new",
            "heavy_dropped",
        )
        if k in out
    }
    compact["heavy_total"] = round(sum(heavy.values()), 3)
    compact["heavy_worst5"] = worst5
    compact["streaming_rows_s"] = stream_compact
    compact["full"] = "BENCH_FULL.json"
    line = json.dumps(compact)
    # hard guarantee the artifact window: drop payload in priority
    # order rather than ship another unparseable round — and if the
    # always-kept maps ever outgrow the window anyway (a larger
    # headline panel), fall back to a minimal parseable line instead
    # of crashing a bench whose measurements all succeeded
    for victim in (
        "vs_baseline_per_query",
        "streaming_rows_s",
        "heavy_worst5",
        "heavy_new",
        "heavy_dropped",
        "recent_totals",
        "skipped_unparseable",
        "spread",
    ):
        if len(line) <= 1900:
            break
        compact.pop(victim, None)
        line = json.dumps(compact)
    if len(line) > 1900:
        line = json.dumps(
            {
                "metric": out["metric"],
                "value": out["value"],
                "unit": out["unit"],
                "sf": out["sf"],
                "vs_baseline": out.get("vs_baseline"),
                "full": "BENCH_FULL.json",
            }
        )
    print(line)


def _total_from_artifact(path: str) -> float | None:
    """Headline total recovered from one BENCH_r*.json artifact.

    The driver wraps bench.py's JSON line in its own artifact (the line
    lands inside a "tail" field, keeping only the LAST ~2000 chars with
    progress-bar noise around it), so accept, in order:
      1. the plain format ({"value": ...} at top level);
      2. a complete {"metric"...} object inside "tail";
      3. a HEAD-TRUNCATED tail (the r7 case: "value" near the start of
         the line was cut off, but the trailing fields survive) —
         reconstruct value = baseline_total × vs_baseline."""
    import re

    dec = json.JSONDecoder()
    try:
        with open(path) as f:
            raw = json.load(f)
    except Exception:
        return None
    if "value" in raw:
        try:
            return float(raw["value"])
        except (TypeError, ValueError):
            return None
    tail = raw.get("tail", "")
    best = None
    for m in re.finditer(r'\{"metric"', tail):
        try:
            obj, _ = dec.raw_decode(tail, m.start())
            if "value" in obj:
                best = obj
        except ValueError:
            continue
    if best:
        return float(best["value"])
    m1 = re.search(r'"baseline_total": ([0-9.]+)', tail)
    m2 = re.search(r'"vs_baseline": ([0-9.]+)', tail)
    if m1 and m2:
        return round(float(m1.group(1)) * float(m2.group(1)), 4)
    return None


def _recorded_totals(max_n: int = 3) -> tuple[list, list]:
    """(recovered, skipped) over the BENCH_r*.json artifacts, newest
    first: ``recovered`` is up to ``max_n`` (name, total) pairs;
    ``skipped`` names artifacts between them that yielded no total (so
    a skipped round is recorded, never silently lost — r8 compared
    itself to r6 because r7's truncated artifact was dropped without
    trace)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    arts = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    recovered: list = []
    skipped: list = []
    for path in reversed(arts):
        total = _total_from_artifact(path)
        if total is None:
            skipped.append(os.path.basename(path))
        else:
            recovered.append((os.path.basename(path), total))
            if len(recovered) >= max_n:
                break
    return recovered, skipped


if __name__ == "__main__":
    main()
