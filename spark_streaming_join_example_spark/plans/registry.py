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
    from . import round20  # noqa: F401
    from . import round21  # noqa: F401
    from . import round22  # noqa: F401


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
#: r14 rotation pushes 43 FIRST-TIME names — the 35-name pre-validated
#: shortlist from NOTES_r13.md (older reserve preferred; greedy family
#: cover) plus 7 fillers drawn from the deepest never-checked families
#: (FN-string 23, X5 29, W2 18, FN-math 23, FN-datetime 26 candidates
#: post-r13) and the rows-only slot.  The rows-only slot goes to
#: q_ivf_topk (the r13 VERDICT's named choice — the IVF partial-probe
#: production path's first driver row; its routed-kernel ≡ brute-force
#: proof lives in q_knn_ivf_exact which stays oracle-checked),
#: replacing q_semdedup_lsh which earned its row in r13.  Family
#: coverage proven lossless at swap time (`rotation_report.py
#: --check`) and every incoming name verified green in the full
#: sf0.01 differential immediately before the swap (491/491 oracle
#: queries pass on 2026-08-16; q_ivf_topk rows-only by design).
CURATED_FIRST: tuple[str, ...] = (
    # ---- anchors: the bench set (always hash-checked on the round's
    # artifact) ----
    "q_pricing_summary",      # A1 P1 P2 (bench)
    "q_revenue_join3",        # J4 J5 A1 (bench)
    "q_window_rank",          # W1 W4 (bench)
    "q_events_tumbling",      # A5 (bench)
    "q_stream_static_join",   # J1 J3 (bench)
    "q_distinct_users",       # A2 (bench)
    "q_cosine_topk",          # X3 J11 O2 (bench)
    # ---- r14 rotation: 43 first-ever driver checks ----
    # pre-validated r14 shortlist (NOTES_r13.md; all green in the r13
    # three-tier seal sweeps AND in this round's pre-swap full sf0.01
    # differential)
    "q_approx_deciles_array",  # A3 FN-array A1 (r14: was q_approx_quartiles)
    "q_grouping_parts",       # A4 A1 (r14: was q_rollup_subtotals)
    "q_tumbling_15m_bounds",  # A5 A2 (r14: was q_tumbling_90min)
    "q_sliding_12h_purchases",  # A6 A2 (r14: was q_sliding_distinct_2h)
    "q_session_rates",        # A7 (r14: was q_session_dynamic_gap)
    "q_pivot_segment_explicit",  # A9 A1 (r14: was q_unpivot_flags)
    "q_map_concat_profile",   # FN-map A1 (r14: was q_map_from_entries)
    "q_active_no_purchase",   # J9 J1 A1 (r14: was q_stream_static_defaults)
    "q_click_error_window",   # J2 J7 (r14: was q_view_purchase_outer)
    "q_region_quarter_grid",  # J11 J5 A1 FN-datetime (r14: was q_region_priority_grid)
    "q_reorder_within_30d",   # J6 J4 (r14: was q_acctbal_dominance)
    "q_asof_nearest",         # J8 W2 (r14: was q_asof_forward_tol)
    "q_recursive_cte",        # A1 J10 (r14: was q_potential_promotion's J9 — q_active_no_purchase carries J9)
    "q_curriculum_order",     # X5 W1 O1 (r14: was q_order_count_dist)
    "q_hash_bucket_layout",   # O3 T5 P2 (r14: was q_composite_range_layout)
    "q_csv_quoted",           # P3 FN-string A1 (r14: was q_json_malformed)
    "q_bool_casts",           # P4 P5 A1 (r14: was q_int_width_casts)
    "q_row_parity_split",     # S1 U1 A1 (r14: was q_provenance_union)
    "q_first_event_daily",    # T2 A1 FN-datetime (r14: was q_dedup_within_hour)
    "q_rising_runs",          # T4 W2 A1 (r14: was q_rate_limit)
    "q_setops_daily_actives",  # U2 U3 A2 (r14: was q_setops_chain)
    "q_udf_hamming_str",      # F1 FN-string (r14: was q_udf_checkdigit)
    "q_pandas_udf_grade",     # F2 P5 (r14: was q_pandas_udf_iter)
    "q_grouped_agg_bitmask",  # F3 FN-math (r14: was q_grouped_agg_wavg)
    "q_apply_in_pandas_rollmax",  # F4 W3 A1 (r14: was q_cogroup_stats)
    "q_map_in_pandas_project",  # F5 P1 A1 (r14: was q_map_in_pandas_parse)
    "q_udtf_windows",         # F6 X5 (r14: was q_udtf_ngrams_n)
    "q_common_span",          # X1 X2 W2 J4 (r14: was q_chargram_jaccard)
    "q_record_pack",          # X4 FN-string (r14: was q_binary_entropy)
    "q_corpus_pipeline",      # X1 X3 X5 (r14: was q_repeated_grams + q_label_balance's X3)
    "q_pmi_collocations",     # X5 O2 J3 (r14: was q_doc_top_token)
    "q_top_parts_per_nation",  # W4 J4 A1 (r14: was q_window_rank's non-anchor W4 depth)
    "q_mad_outliers",         # FN-math X5 A1 (r14: was q_max_drawdown's FN-math)
    "q_date_arith",           # FN-datetime (r14: was q_timestamp_diffs)
    "q_string_battery2",      # FN-string (r14: was q_event_pattern's FN-string)
    # fillers from the deepest never-checked families (post-r13
    # candidate depth: X5 29, FN-datetime 26, FN-string 23, FN-math
    # 23, W2 18 — the r13 VERDICT priority list)
    "q_ivf_topk",             # X3 rows-only (r14: was q_semdedup_lsh — the IVF partial-probe path's driver slot)
    "q_like_battery",         # FN-string P2 (r14: was q_readability)
    "q_token_entropy",        # X5 A1 (r14: was q_kanonymity)
    "q_islands",              # W2 A1 (r14: was q_scd2_intervals)
    "q_weighted_median",      # FN-math W3 A1 (r14: was q_autocorr)
    "q_seasonal_profile",     # FN-datetime A1 (r14: was q_try_arithmetic)
    "q_transition_matrix",    # W2 A1 (r14: was q_event_pattern)
    "q_zipf_fit",             # X5 FN-math A1 (r14: was q_window_distribution's W1 slot — q_curriculum_order carries W1)
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
