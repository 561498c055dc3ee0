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
    from . import round17  # noqa: F401
    from . import round18  # noqa: F401
    from . import round19  # noqa: F401


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
#: r12 rotation pushes 42 FIRST-TIME names — the 28-name pre-validated
#: shortlist from NOTES_r11.md plus 14 fillers drawn from the deepest
#:  never-checked families (FN-string/FN-math/FN-datetime/W/X5) and
#: the r11 span/SemDeDup additions (VERDICT r11 item 5).  The anchor
#: section is unchanged (bench set + A3 keeper).  Family coverage
#: proven lossless at swap time (old-panel tag-union ⊆ new-panel
#: tag-union, `tools/rotation_report.py --check`) and every incoming
#: name verified green in the sf0.01 differential immediately before
#: the swap (42/42 on 2026-08-16; q_embedding_neardup_lsh rows-only
#: by design — the embedding-LSH scale path's driver slot).
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
    # ---- r12 rotation: 42 first-ever driver checks ----
    # pre-validated r12 shortlist (NOTES_r11.md; all green in the r11
    # three-tier seal sweeps)
    "q_cube_filtered",        # A4 A1 (r12: was q_grouping_sets_returns)
    "q_tumbling_week_orders",  # A5 A1 (r12: was q_tumbling_daily)
    "q_sliding_28d_events",   # A6 A1 (r12: was q_sliding_global_3h)
    "q_session_spans",        # A7 A2 (r12: was q_session_bounds)
    "q_pivot_dual_agg",       # A9 A1 (r12: was q_pivot_year)
    "q_map_zip_stats",        # FN-map A1 (r12: was q_map_entries_explode)
    "q_events_supplier_mix",  # J1 J3 A1 (r12: was q_stream_static_nation)
    "q_type_day_grid",        # J11 J10 A1 (r12: was q_nation_status_grid)
    "q_click_purchase",       # J2 J7 W4 (r12: was q_stream_stream_views)
    "q_balance_overlap",      # J6 A1 (r12: was q_acctbal_tier_join)
    "q_asof_tolerance",       # J8 W2 (r12: was q_asof_backward)
    "q_try_cast_temporal",    # P4 P5 (r12: was q_cast_numeric_edges)
    "q_best_event",           # T2 A1 (r12: was q_latest_event)
    "q_shuffle_pipeline",     # T5 A1 (r12: was q_repartition_hint)
    "q_union_evolved_agg",    # U1 P5 (r12: was q_setops_years' U1 share)
    "q_setops_modes",         # U2 U3 A1 (r12: was q_setops_years)
    "q_desc_range_layout",    # O3 P2 (r12: was q_clustered_layout)
    "q_payload_chunks",       # X4 FN-array (r12: was q_frame_sample)
    "q_approx_topk_flags",    # A3 O2 P1 (r12: second A3 leg; round-13 stock pulled forward)
    "q_json_kv_explode",      # P3 FN-map A1 (r12: was q_from_xml)
    "q_row_chunks",           # S1 P1 A1 (r12: was q_row_index)
    "q_debounce",             # T4 W2 A1 (r12: was q_user_streaks)
    "q_udf_digitsum",         # F1 (r12: was q_udf_vowels)
    "q_pandas_udf_intlen",    # F2 (r12: was q_pandas_udf_bucket)
    "q_grouped_agg_second_max",  # F3 (r12: was q_grouped_agg_span)
    "q_apply_in_pandas_norm",  # F4 (r12: was q_apply_in_pandas_gaps)
    "q_map_in_pandas_repeat",  # F5 (r12: was q_map_in_pandas_sieve)
    "q_udtf_chargrams",       # F6 (r12: was q_udtf_bigrams)
    # span/SemDeDup family exposure (VERDICT r11 item 5 — the r11
    # additions' first driver rows)
    "q_span_trim",            # X1 X5 J10 P5 (r12: was q_checksums' X1)
    "q_curation_funnel",      # X1 X5 A1 P5 (r12: was q_content_split)
    "q_semdedup_keep",        # X2 X3 J11 (r12: was q_prefix_jaccard_join's X2)
    "q_embedding_neardup_lsh",  # X2 X3 rows-only (r12: was q_minhash_incoming — the embedding-LSH scale path's driver slot)
    # fillers from the deepest never-checked families
    "q_listagg",              # A1 FN-string (r12: was q_checksums' FN-string)
    "q_higher_moments",       # FN-math A1 (r12: was q_funnel_timing's FN-math)
    "q_period_over_period",   # W2 FN-datetime A1 (r12: was q_cohort_ltv's FN-datetime)
    "q_window_value_funcs",   # W2 W3 (r12: was q_revenue_concentration's W3)
    "q_gini_coefficient",     # W1 A1 O1 (r12: was q_revenue_concentration's O1)
    "q_tfidf_top_term",       # X5 A1 W4 (r12: was q_bm25_search)
    "q_token_regex",          # X5 FN-string (r12: was q_json_roundtrip's FN-string)
    "q_anomaly_zscore",       # A1 FN-math W1 (r12: was q_mrl_truncation's W1)
    "q_time_weighted_avg",    # W2 A1 FN-datetime (r12: second FN-datetime leg)
    "q_never_late_parts",     # J9 A1 J4 (r12: was q_idle_customers/q_supplier_shortlist's J9)
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
