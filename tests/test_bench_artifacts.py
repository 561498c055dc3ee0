"""bench.py artifact-contract tests (no Spark session needed).

The r8 lesson: BENCH_r07.json's compact line was head-truncated inside
the driver's ~2000-char tail window, bench.py silently skipped it, and
r8's drift quietly compared to r6.  These pin the r9 fixes: truncated
artifacts RECOVER (value = baseline_total × vs_baseline), skipped ones
are NAMED, and the compact emitter can never crash a bench whose
measurements succeeded.
"""

from __future__ import annotations

import contextlib
import io
import json
import pathlib

import pytest

import bench

REPO = pathlib.Path(bench.__file__).parent


def test_recovers_plain_and_truncated_artifacts():
    recovered, skipped = bench._recorded_totals()
    names = dict(recovered)
    # the newest artifact (plain driver format) recovers directly
    newest = sorted(REPO.glob("BENCH_r*.json"))[-1].name
    assert recovered[0][0] == newest
    # r7's head-truncated tail reconstructs value = baseline × ratio
    # (its "value" field was cut off; the trailing fields survive)
    r7 = bench._total_from_artifact(str(REPO / "BENCH_r07.json"))
    assert r7 == pytest.approx(1.269 * 0.26, abs=0.01)
    assert "BENCH_r07.json" in names or len(recovered) < 2
    # nothing in the committed artifact set is unrecoverable
    assert skipped == []


def test_total_from_artifact_handles_garbage(tmp_path):
    p = tmp_path / "BENCH_rXX.json"
    p.write_text("not json at all")
    assert bench._total_from_artifact(str(p)) is None
    p.write_text(json.dumps({"tail": "progress noise only"}))
    assert bench._total_from_artifact(str(p)) is None
    p.write_text(json.dumps({"value": "n/a"}))
    assert bench._total_from_artifact(str(p)) is None


def _emit_line(out: dict) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(dict(out))
    return buf.getvalue().strip().splitlines()[-1]


def test_emit_compact_line_fits_and_parses(tmp_path, monkeypatch):
    # keep the real BENCH_FULL.json out of harm's way: _emit writes
    # next to bench.__file__
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    base = {
        "metric": "warm_total_headline_queries",
        "value": 1.23,
        "unit": "sec",
        "queries": {f"q_{i}": 0.1 for i in range(8)},
        "runs": 5,
        "sf": 0.1,
        "heavy": {f"h_{i}": float(i) for i in range(20)},
        "streaming": None,
    }
    line = _emit_line(base)
    assert len(line) <= 1900
    assert json.loads(line)["value"] == 1.23

    # adversarial payload: maps the priority-dropper never removes,
    # grown past the window — must FALL BACK, not assert (r9 ADVICE)
    big = dict(base)
    big["queries"] = {f"q_very_long_query_name_{i:04d}": 0.1234 for i in range(200)}
    line = _emit_line(big)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == 1.23
    assert parsed["full"] == "BENCH_FULL.json"
