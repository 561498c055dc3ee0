"""Fixture-encoding canary (VERDICT r4 #8).

The r3→r4 driver data refresh silently flipped ``events.ts`` from raw
int64/TIMESTAMP(NANOS) nanoseconds to plain ``timestamp[us]`` and cost
a round of mysterious differential mismatches before the cause was
found.  This test snapshots the physical parquet type of EVERY fixture
column; a future refresh that changes any encoding now produces one
loudly-named failure with the expected-vs-found diff, instead of three
unexplained value mismatches downstream.

If this fails after a data refresh: update EXPECTED below to the new
encoding AND check the places that depend on physical encodings —
``sources/batch.py`` (ts-encoding sniff; it self-invalidates on file
mtime/size, but the EVENTS/EVENTS_RAW schema split must still cover
the new type) and ``FIXTURES.md``.

Runs against every sf dir present, not just the session fixture —
refreshes have not always landed in all dirs at once.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_ROOT = "/root/testdata"

EXPECTED: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", "timestamp[us]"),  # was int64 raw-nanos before round 4!
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


def _sf_dirs() -> list[str]:
    return sorted(glob.glob(os.path.join(SF_ROOT, "sf*")))


@pytest.mark.parametrize("sf_dir_path", _sf_dirs())
def test_fixture_physical_types_unchanged(sf_dir_path):
    diffs = []
    for table, expected in EXPECTED.items():
        path = os.path.join(sf_dir_path, f"{table}.parquet")
        if not os.path.exists(path):
            diffs.append(f"{table}: fixture file MISSING at {path}")
            continue
        schema = pq.read_schema(path)
        found = [(n, str(t)) for n, t in zip(schema.names, schema.types)]
        if found != expected:
            exp_d, fnd_d = dict(expected), dict(found)
            for col in sorted(set(exp_d) | set(fnd_d)):
                if exp_d.get(col) != fnd_d.get(col):
                    diffs.append(
                        f"{table}.{col}: expected {exp_d.get(col, '<absent>')}, "
                        f"found {fnd_d.get(col, '<absent>')}"
                    )
    assert not diffs, (
        "FIXTURE ENCODING CHANGED (driver data refresh?) — downstream "
        "differential mismatches will follow from exactly this:\n  "
        + "\n  ".join(diffs)
        + "\nSee tests/test_fixture_canary.py docstring for what to update."
    )
