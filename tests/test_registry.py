"""Registry-contract gates (no Spark session needed).

The verification driver hash-checks the FIRST 50 entries of
``queries()`` in insertion order, so the curated slice in
plans/registry.py is a load-bearing contract: it must exist, stay
exactly 50 long, resolve against the registry, and span every
SQL-expressible SURVEY.md §2 family.  These tests freeze that.
"""

from __future__ import annotations

from spark_streaming_join_example_spark.plans.registry import (
    CURATED_FIRST,
    REGISTRY,
    _load_all_plans,
    oracle_sql_dict,
    queries_dict,
)

#: §2 families the driver's DuckDB differential CAN see (streaming-only
#: rows S2/S4-S9, T1/T3/T4, A8 are pytest-verified instead).
_DRIVER_VISIBLE_FAMILIES = {
    "P1", "P2", "P3", "P4", "P5",
    "J1", "J2", "J3", "J4", "J5", "J6", "J7", "J8", "J9", "J10", "J11",
    "A1", "A2", "A3", "A4", "A5", "A6", "A7", "A9",
    "W1", "W2", "W3", "W4",
    "O1", "O2", "O3",
    "U1", "U2", "U3",
    "FN-string", "FN-datetime", "FN-math", "FN-array", "FN-map",
    "T2", "T5",
    "F1", "F2", "F3", "F4", "F5", "F6",
    "X1", "X2", "X3", "X4", "X5",
}


def test_curated_slice_is_exactly_50_and_resolves():
    _load_all_plans()
    assert len(CURATED_FIRST) == 50
    assert len(set(CURATED_FIRST)) == 50, "duplicate name in curation"
    missing = [n for n in CURATED_FIRST if n not in REGISTRY]
    assert not missing, f"curated names not registered: {missing}"


def test_queries_dict_leads_with_curated_slice():
    names = list(queries_dict())
    assert tuple(names[:50]) == CURATED_FIRST
    # nothing lost in the reorder: same total key set as the registry
    assert set(names) == set(REGISTRY)


def test_curated_slice_spans_every_driver_visible_family():
    _load_all_plans()
    covered = set()
    for n in CURATED_FIRST:
        covered.update(REGISTRY[n].tags)
    gaps = _DRIVER_VISIBLE_FAMILIES - covered
    assert not gaps, f"§2 families with no curated CORRECTNESS row: {sorted(gaps)}"


#: The r7 VERDICT's panel-rotation item explicitly asked for the
#: sketch family's rows-only members to earn official driver rows
#: (their ε/exactness proofs live in pytest, not DuckDB — KLL and
#: theta sketch internals are engine-specific by nature); they earned
#: rows every round r7-r10 and rotated OFF the r11 panel to free two
#: hash-check slots.  q_minhash_incoming is the r11 rows-only slot:
#: the streaming-index lookup API gets its first official driver row
#: under the weaker rows-only check (its precision/recall pins vs the
#: exact incremental join live in pytest).  Only names in this set may
#: appear in the curated slice without an oracle, and at most 2 at a
#: time (tools/rotation_report.py --check enforces the count).
_CURATED_ROWS_ONLY_ALLOWED = {
    "q_kll_quantiles",
    "q_theta_setops",
    "q_minhash_incoming",
    "q_embedding_neardup_lsh",  # r12 rows-only slot: embedding-LSH scale path
    "q_semdedup_lsh",  # r13 rows-only slot: SemDeDup-LSH scale path
    "q_ivf_topk",  # r14 rows-only slot: IVF partial-probe production path
    "q_semdedup_kmeans",  # r15 rows-only slot: cell-local semantic-dedup path
}


def test_every_curated_query_has_an_oracle():
    """The whole point of curation is official hash-checked rows —
    an undocumented rows-only entry in the first 50 would waste a
    driver slot (the two sketch entries above are deliberate)."""
    oracles = oracle_sql_dict()
    missing = [
        n
        for n in CURATED_FIRST
        if n not in oracles and n not in _CURATED_ROWS_ONLY_ALLOWED
    ]
    assert not missing, f"curated queries without DuckDB oracle: {missing}"
