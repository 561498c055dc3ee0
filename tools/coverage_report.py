#!/usr/bin/env python3
"""Generate COVERAGE.md: SURVEY.md §2 inventory row → registry queries
(oracle-checked vs rows-only) → pytest evidence. Run after adding
operators; commit the refreshed file.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_streaming_join_example_spark.plans.registry import (
    REGISTRY,
    queries_dict,
)

# SURVEY §2 rows: tag → short label (and rows covered purely by
# pytest/modules, listed at the bottom).
ROWS: dict[str, str] = {
    "S1": "batch parquet scan",
    "S2": "streaming file source (parquet/json)",
    "S3": "Kafka source/sink",
    "S4": "rate source",
    "S5": "console sink",
    "S6": "memory sink",
    "S7": "file sink + checkpoint (exactly-once)",
    "S8": "foreachBatch sink",
    "S9": "trigger control (availableNow/processingTime)",
    "P1": "projection", "P2": "filter/predicate", "P3": "JSON parse",
    "P4": "casts", "P5": "conditional",
    "J1": "stream-static join", "J2": "stream-stream join (time-range)",
    "J3": "broadcast hash join", "J4": "sort-merge/shuffle join",
    "J5": "multi-way equi-join", "J6": "theta join", "J7": "range join",
    "J8": "as-of join", "J9": "semi/anti join", "J10": "outer joins",
    "J11": "cross join",
    "A1": "hash aggregate", "A2": "distinct", "A3": "approx aggregates",
    "A4": "rollup/cube/grouping sets", "A5": "tumbling window",
    "A6": "sliding window", "A7": "session window",
    "A8": "streaming agg + watermark + output modes", "A9": "pivot",
    "W1": "ranking", "W2": "analytic (lag/lead/first/last/nth)",
    "W3": "frame specs (rows/range)", "W4": "top-k per group",
    "O1": "global sort", "O2": "limit/top-k", "O3": "sortWithinPartitions",
    "U1": "union all", "U2": "intersect", "U3": "except",
    "FN-string": "string functions", "FN-datetime": "date/time functions",
    "FN-math": "math functions", "FN-array": "array functions + HOFs",
    "FN-map": "map functions",
    "T1": "watermark", "T2": "streaming dedup", "T3": "late-data handling",
    "T4": "arbitrary stateful op", "T5": "stream repartition / state sharding",
    "F1": "scalar Python UDF", "F2": "pandas UDF", "F3": "grouped-agg UDAF",
    "F4": "applyInPandas", "F5": "mapInPandas / mapInArrow", "F6": "UDTF",
    "X1": "exact dedup", "X2": "near-dup (MinHash-LSH/SimHash/Jaccard/embedding)",
    "X3": "vector similarity (exact/LSH/IVF/kNN)",
    "X4": "multimodal columns", "X5": "text analysis",
}

PYTEST_ONLY: dict[str, str] = {
    "S2": "tests/test_streaming.py (replay), tests/test_sources.py (json); custom Python DataSource batch+stream reader (sources/pydatasource.py, tests/test_sources.py::test_python_datasource_*)",
    "S3": "sources/kafka.py (no broker offline; parse step tested in tests/test_sources.py; end-to-end proof script tools/kafka_roundtrip.py + exact spark-submit packages line in the module docstring)",
    "S4": "tests/test_streaming.py::test_rate_source_smoke",
    "S5": "sources/sinks.py::to_console",
    "S6": "every streaming equivalence test (run_to_memory)",
    "S7": "tests/test_streaming.py::test_restart_exactly_once / test_agg_state_survives_restart; mid-batch crash + mid-stream stop chaos tests (::test_midbatch_crash_exactly_once, ::test_stop_midstream_file_sink_exactly_once)",
    "S8": "tests/test_streaming.py::test_foreach_batch_sink; custom two-phase-commit writer, batch+streaming (sources/audit_sink.py, tests/test_sources.py::test_audit_sink_*); streaming IVF index maintenance (streaming/vector_index.py); streaming MinHash near-dup signature index (streaming/neardup_index.py, tests/test_neardup_index.py); streaming EXACT prefix-filter dedup index, frozen hash order (streaming/prefix_index.py, tests/test_prefix_index.py)",
    "S9": "replay harness (availableNow), rate test (processingTime)",
    "J1": "tests/test_streaming.py (inner + left-outer equivalence)",
    "J2": "tests/test_streaming.py (inner/outer/semi equivalence, plan audit)",
    "A8": "tests/test_streaming.py (append + update modes; chained stateful window rollup via window_time, test_chained_window_agg_equivalence; per-batch observe() metrics, tests/test_operators.py)",
    "T1": "all watermarked streaming tests",
    "T2": "tests/test_streaming.py::test_dedup_stream_equivalence",
    "T3": "tests/test_streaming.py::test_late_rows_dropped",
    "T4": "tests/test_streaming.py (applyInPandasWithState sessionize + streaming/temporal.py point-in-time join w/ out-of-order + restart equivalence; TWS gated on protobuf)",
    "J8": "streaming/temporal.py (streaming point-in-time join ≡ batch asof_join, tests/test_streaming.py::test_temporal_join_*)",
    "T5": "SCALE.md streaming notes; q_salted_agg",
    "S1": "all loaders (sources/batch.py)",
    "X4": "real-file ingestion via Spark's binaryFile source → (doc_id, payload, meta{sha256, mime, path}) corpus shape with listing-level glob pruning (operators/multimodal.py::binary_file_corpus, tests/test_multimodal.py::test_binary_file_corpus_end_to_end); decode/resize/frame-sample Arrow-batched stages (fake-decode env gate documented)",
}


def main() -> None:
    queries_dict()  # load plans
    by_tag: dict[str, list[tuple[str, bool]]] = {}
    for name, ent in sorted(REGISTRY.items()):
        for t in ent.tags:
            by_tag.setdefault(t, []).append((name, bool(ent.oracle)))

    lines = [
        "# COVERAGE — SURVEY.md §2 inventory → implementation evidence",
        "",
        "Generated by `tools/coverage_report.py`. `oracle` = DuckDB",
        "differential hash check at sf0.01; `rows-only` = driver counts",
        "rows, exactness proven in pytest instead (approximate/seeded or",
        "streaming-only semantics).",
        "",
        "| §2 row | operator | queries (oracle ✓ / rows-only ◦) | further pytest/module evidence |",
        "|---|---|---|---|",
    ]
    for tag, label in ROWS.items():
        qs = by_tag.get(tag, [])
        qcell = ", ".join(
            f"`{n}` {'✓' if has_oracle else '◦'}" for n, has_oracle in qs
        ) or "—"
        extra = PYTEST_ONLY.get(tag, "")
        lines.append(f"| {tag} | {label} | {qcell} | {extra} |")

    n_oracle = sum(1 for e in REGISTRY.values() if e.oracle)
    lines += [
        "",
        f"Totals: **{len(REGISTRY)} registered queries**, "
        f"{n_oracle} oracle-checked, {len(REGISTRY) - n_oracle} rows-only.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(ROWS)} rows, {len(REGISTRY)} queries")

    missing = [t for t in ROWS if t not in by_tag and t not in PYTEST_ONLY]
    if missing:
        print("ROWS WITHOUT ANY EVIDENCE:", missing)
        sys.exit(1)


if __name__ == "__main__":
    main()
