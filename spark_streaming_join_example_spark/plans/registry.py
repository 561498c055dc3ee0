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
#: ROTATION (round 7+): a fixed panel means the other ~240 oracle
#: queries never earn an official driver CORRECTNESS row.  Each round,
#: ~25-30 non-anchor slots rotate to a DIFFERENT query covering the
#: SAME §2 family (the swapped-out name stays green in the full local
#: differential); sole-coverage anchors (A6/A7/A9, F2/F6, J1/J2, T2,
#: …) never rotate.  Swaps are marked "rN: was <name>" below.  The r9
#: rotation (per the r8 VERDICT items 1+6) pushes 27 FIRST-TIME names
#: plus the three F-series flavors the verdict asked to re-signal
#: (q_apply_in_pandas, q_grouped_agg_udf, q_map_in_pandas) — after r9
#: the never-driver-checked pool drops from 182 to ~155.  Family
#: coverage proven lossless at swap time (old-panel tag-union ⊆
#: new-panel tag-union; r9 additionally gains S1 + T4) and every
#: incoming name verified green in the full sf0.01 differential first
#: (r9 sweep: 275 pass, 0 fail).
CURATED_FIRST: tuple[str, ...] = (
    # headline relational anchors (bench set + core shapes)
    "q_pricing_summary",      # A1 P2
    "q_revenue_join3",        # J4
    "q_scalar_subquery",      # J3 A1 (r9: was q_broadcast_enrich)
    "q_lexicon_sentiment",    # X5 J3 A1 (r9: was q_sql_scripting)
    "q_histogram",            # FN-math A1 (r9: was q_parameterized_sql)
    "q_window_rank",          # W1 W4
    "q_ewma",                 # W2 W3 FN-math (r9: was q_window_lag)
    "q_kll_quantiles",        # A3 sketch, rows-only (r8: was q_window_frame)
    "q_correlated_subquery",  # J9 A1 (r9: was q_exists_subquery)
    "q_reconcile_totals",     # J10 A1 P5 (r9: was q_merge_upsert)
    "q_geo_nearest",          # J6 W1 FN-math (r9: was q_levenshtein_fuzzy)
    "q_share_of_total",       # A1 W3 A4 (r9: was q_grouping_id)
    "q_pivot",                # A9
    "q_max_concurrency",      # W3 A1 U1 FN-datetime (r8: was q_union_by_name)
    "q_theta_setops",         # A3 U2 U3 sketch, rows-only (r8: was q_intersect_all)
    "q_except_all",           # U3  (r7: was q_except_users)
    "q_url_canonicalize",     # FN-string X1 A1 (r9: was q_parse_url)
    "q_try_casts",            # P4 P5 (r9: was q_pricing_summary_decimal)
    "q_order_priority",       # J9 A1 O1 (r9: was q_welch_ab; FN-math via q_histogram/q_ewma/q_geo_nearest)
    "q_json_paths",           # P3 (r9: was q_xpath)
    "q_transform_keys",       # FN-map (r9: was q_str_to_map; P3 via q_json_paths)
    "q_arrays_zip",           # FN-array P1 (r9: was q_posexplode)
    "q_zorder_stats",         # O3 P1 A1 (r9: was q_sort_within_partitions)
    "q_hints_battery",        # J4 T5 A1 (r9: was q_skew_report; U1 via q_max_concurrency)
    "q_file_lineage",         # S1 P1 (r9: was q_sql_pipe; NEW family tag — batch source lineage)
    # streaming-twin batch queries
    "q_stream_static_join",   # J1
    "q_stream_stream_join",   # J2
    "q_events_tumbling",      # A5
    "q_events_sliding",       # A6
    "q_distinct_users",       # A2
    "q_session_window",       # A7
    "q_dedup_events",         # T2
    # temporal joins + approx
    "q_asof_forward",         # J8 J7 (r7: was q_asof_join)
    "q_sessionize_batch",     # W2 A1 T4 (r9: was q_attribution; J7 via q_asof_forward; NEW family tag T4)
    "q_bitmap_distinct",      # A2 A3 (r9: was q_approx_topk_events)
    # UDF ladder
    "q_sql_udf",              # F1 (r8: was q_udf_scalar)
    "q_pandas_udf",           # F2
    "q_grouped_agg_udf",      # F3 (r9: was q_embedding_centroid; r8 VERDICT item 6 re-signal)
    "q_apply_in_pandas",      # F4 (r9: was q_apply_in_arrow; r8 VERDICT item 6 re-signal)
    "q_map_in_pandas",        # F5 (r9: was q_map_in_arrow; r8 VERDICT item 6 re-signal)
    "q_udtf_tokens",          # F6
    # LLM-pipeline extensions
    "q_minmax_by",            # A1 W4 (r9: was q_lateral_topk; J5 via q_bfs_hops/q_graph_degrees)
    "q_prefix_shingle_join",  # X2 W1 J4 X1 (r9: was q_embedding_neardup; NEW r9 operator mode)
    "q_cosine_topk",          # X3 (also covers J11 via block cross join)
    "q_knn_search",           # X3 (r9: was q_knn_ivf_exact)
    "q_binary_magic",         # X4 P5 FN-string (r9: was q_multimodal_binary)
    "q_vector_join",          # X4 J4 (r9: was q_decontaminate; X5 via q_lexicon_sentiment; X1/J9 covered above)
    "q_dup_clusters_star",    # X1 X2 (r9: was q_dup_clusters — large/small-star variant)
    "q_bfs_hops",             # J5 A1 X2 iterative graph (r9: was q_kcore)
    "q_graph_degrees",        # A1 J5 X2 (r9: was q_exact_global_median; O1 via q_order_priority)
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
