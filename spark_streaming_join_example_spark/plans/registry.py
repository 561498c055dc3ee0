"""Query registry — the driver contract's backbone.

Every operator from SURVEY.md §2 ships as a named query over the
fixture tables with (a) a DataFrame formulation and (b), where
SQL-expressible, an equivalent DuckDB oracle.  ``__spark_entry__.py``
exposes this registry to the verification driver.

Determinism rules (FIXTURES.md harness notes): alias every computed
column identically in both formulations; break every top-k/limit tie
with a unique key; use functions.numeric exact aggregates for
double sums/means.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    tags: tuple[str, ...] = ()  # SURVEY.md §2 row ids, e.g. ("A1", "P2")
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco


def _load_all_plans() -> None:
    # import for side effect: populates REGISTRY
    from . import relational  # noqa: F401
    from . import events_queries  # noqa: F401
    from . import extensions  # noqa: F401
    from . import udf_queries  # noqa: F401
    from . import advanced  # noqa: F401
    from . import analytics  # noqa: F401
    from . import round5  # noqa: F401
    from . import round5b  # noqa: F401
    from . import mleval  # noqa: F401
    from . import round6  # noqa: F401
    from . import tpch_gaps  # noqa: F401
    from . import round7  # noqa: F401
    from . import round10  # noqa: F401
    from . import round11  # noqa: F401
    from . import round12  # noqa: F401
    from . import round13  # noqa: F401
    from . import round14  # noqa: F401
    from . import round15  # noqa: F401
    from . import round16  # noqa: F401


#: The 50 queries exposed FIRST to the verification driver.  The
#: driver hash-checks the first 50 entries of ``queries()`` in
#: insertion order, so this slice is curated to span every
#: SQL-expressible SURVEY.md §2 family — relational (P/J/A/W/O/U),
#: function batteries (FN-*), salting (T5), streaming twins
#: (J1/J2/A5-A7/T2), the full UDF ladder (F1-F6), and the
#: LLM-pipeline extensions (X1-X5 + graph + distributed ranking).
#: Rows S2/S4-S9, T1/T3/T4, A8 are streaming-only semantics with no
#: single-statement SQL twin; they are pytest-verified
#: (tests/test_streaming.py) and cannot appear in a DuckDB
#: differential by nature.  Everything NOT in this tuple follows in
#: registration order and is still verified by the full local
#: differential (tools/verify_local.py).
#:
#: ROTATION (round 7+): a fixed panel means the long tail of oracle
#: queries never earns an official driver CORRECTNESS row.  Each
#: round, the non-anchor slots rotate to DIFFERENT queries covering
#: the SAME §2 families (the swapped-out names stay green in the full
#: local differential).  Swaps are marked "rN: was <name>" below.  The
#: r11 rotation pushes 42 FIRST-TIME names — the 28-name pre-validated
#: shortlist from NOTES_r10.md, 6 multi-family gap fillers, and 8
#: breadth picks — by shrinking the anchor section to the bench set
#: plus the one family (A3) with no never-checked oracle member: the
#: two rows-only sketch anchors (q_kll_quantiles, q_theta_setops)
#: earned driver rows in r7-r10 and rotate off, freeing their slots
#: for hash-checked names.  Family coverage proven lossless at swap
#: time (old-panel tag-union ⊆ new-panel tag-union, checked
#: programmatically) and every incoming name verified green in the
#: sf0.01 differential immediately before the swap.
CURATED_FIRST: tuple[str, ...] = (
    # ---- anchors: the bench set (always hash-checked on the round's
    # artifact) + the A3 keeper (no never-checked oracle member left;
    # the two rows-only sketch anchors rotated OFF this round after
    # earning rows in r7-r10, freeing two hash-check slots) ----
    "q_pricing_summary",      # A1 P1 P2 (bench)
    "q_revenue_join3",        # J4 J5 A1 (bench)
    "q_window_rank",          # W1 W4 (bench)
    "q_events_tumbling",      # A5 (bench)
    "q_stream_static_join",   # J1 J3 (bench)
    "q_distinct_users",       # A2 (bench)
    "q_cosine_topk",          # X3 J11 O2 (bench)
    "q_approx_topk_events",   # A3 keeper (family has no unchecked member)
    # ---- r11 rotation: 42 first-ever driver checks ----
    # pre-validated r11 shortlist (NOTES_r10.md; all green in the r10
    # three-tier seal sweeps)
    "q_setops_years",         # U1 U2 U3 A2 (r11: was q_max_concurrency's U1 + q_null_ordering's U-share)
    "q_grouping_sets_returns",  # A4 A1 (r11: was q_rollup_orders)
    "q_tumbling_daily",       # A5 A2 (r11: second A5 leg alongside bench anchor)
    "q_sliding_global_3h",    # A6 A1 (r11: was q_sliding_type_windows)
    "q_session_bounds",       # A7 (r11: was q_session_value)
    "q_pivot_year",           # A9 J3 (r11: was q_pivot_priority)
    "q_cast_numeric_edges",   # P4 P1 (r11: was q_cast_battery2)
    "q_acctbal_tier_join",    # J6 A1 (r11: was q_band_join)
    "q_ship_service_window",  # J7 J4 (r11: was q_hints_battery's J4 share)
    "q_asof_backward",        # J8 W2 (r11: was q_asof_forward)
    "q_nation_status_grid",   # J11 J10 J5 (r11: was q_gap_fill/q_interpolate's J10)
    "q_clustered_layout",     # O3 P2 (r11: was q_zorder_stats)
    "q_row_index",            # S1 P1 (r11: was q_file_lineage)
    "q_latest_event",         # T2 A2 (r11: was q_dedup_events)
    "q_user_streaks",         # T4 W2 (r11: was q_sessionize_batch)
    "q_repartition_hint",     # T5 A1 (r11: was q_hints_battery)
    "q_stream_static_nation",  # J1 J3 J5 A1 (r11: second J1 leg)
    "q_stream_stream_views",  # J2 J7 (r11: was q_stream_stream_join)
    "q_map_entries_explode",  # FN-map FN-array (r11: was q_map_battery2)
    "q_from_xml",             # P3 (r11: was q_from_csv)
    "q_udf_vowels",           # F1 (r11: was q_sql_udf)
    "q_pandas_udf_bucket",    # F2 (r11: was q_pandas_udf)
    "q_grouped_agg_span",     # F3 (r11: was q_grouped_agg_udf)
    "q_apply_in_pandas_gaps",  # F4 (r11: was q_apply_in_pandas)
    "q_map_in_pandas_sieve",  # F5 (r11: was q_map_in_pandas)
    "q_udtf_bigrams",         # F6 (r11: was q_udtf_tokens)
    "q_minhash_incoming",     # X2 rows-only (r11: the index lookup API under the driver's weaker check)
    "q_frame_sample",         # X4 (r11: was q_quantize_embeddings's X4 share)
    # multi-family gap fillers (each covers 2-3 families the shortlist
    # leaves open; all green in the r10 three-tier seal sweeps)
    "q_content_split",        # A1 P5 X5 FN-string (r11: was q_gopher_rules)
    "q_checksums",            # X1 FN-string (r11: was q_dedup_incoming's X1)
    "q_cohort_ltv",           # W3 A1 FN-datetime (r11: was q_cumulative_distinct's W3)
    "q_funnel_timing",        # A1 FN-datetime FN-math (r11: was q_math_battery2)
    "q_revenue_concentration",  # W3 A1 O1 (r11: was q_null_ordering)
    "q_idle_customers",       # J9 A1 P5 (r11: was q_late_supplier_blame)
    # breadth picks (never-checked, diverse families)
    "q_collab_filter",        # J4 A1 W4 X3 (r11: was q_market_share)
    "q_mrl_truncation",       # X3 FN-array W1 (r11: was q_quantize_embeddings)
    "q_prefix_jaccard_join",  # X2 W1 J4 (r11: was q_dup_clusters_incoming's X2)
    "q_bm25_search",          # X5 A1 J3 O2 (r11: was q_min_cost_supplier's O2)
    "q_supplier_shortlist",   # J9 A2 O2 (r11: was q_triangle_count's O2)
    "q_json_roundtrip",       # P3 FN-string (r11: was q_regexp_battery2/q_mask_pii's FN-string)
    "q_file_row_profile",     # S1 P1 A1 (r11: second S1 leg)
    "q_run_lengths",          # T4 W2 A1 (r11: second T4 leg)
)


def _ordered_specs() -> list[QuerySpec]:
    """Registry specs with the curated 50 first, then the rest in
    registration order.  Raises if curation references a name that was
    never registered (catches renames at import time, not driver
    time)."""
    _load_all_plans()
    missing = [n for n in CURATED_FIRST if n not in REGISTRY]
    if missing:
        raise KeyError(f"CURATED_FIRST names not in registry: {missing}")
    rest = [n for n in REGISTRY if n not in set(CURATED_FIRST)]
    return [REGISTRY[n] for n in (*CURATED_FIRST, *rest)]


def queries_dict() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def oracle_sql_dict() -> dict[str, str]:
    return {s.name: s.oracle for s in _ordered_specs() if s.oracle is not None}
