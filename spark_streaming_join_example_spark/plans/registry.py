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
#: ROTATION (round 7+): a fixed panel means the other ~236 oracle
#: queries never earn an official driver CORRECTNESS row.  Each round,
#: ~15-25 non-anchor slots rotate to a DIFFERENT query covering the
#: SAME §2 family (the swapped-out name stays green in the full local
#: differential); sole-coverage anchors (A6/A7/A9, F2/F6, J1/J2, T2,
#: …) never rotate.  Swaps are marked "rN: was <name>" below.  The r8
#: rotation targets never-driver-checked families per the r7 VERDICT:
#: the A4 grouping-sets battery, the SQL front door (pipe syntax,
#: scripting, parameterized), the remaining F-series flavors, the
#: sketch family (two deliberate rows-only entries — q_kll_quantiles,
#: q_theta_setops — whose ε-exactness lives in pytest), and the
#: never-checked X/graph/ranking twins.  Family coverage proven
#: lossless at swap time (old-panel tag-union == new-panel tag-union)
#: and every incoming name hash-verified green at sf0.01 first.
CURATED_FIRST: tuple[str, ...] = (
    # headline relational anchors (bench set + core shapes)
    "q_pricing_summary",      # A1 P2
    "q_revenue_join3",        # J4
    "q_broadcast_enrich",     # J3
    "q_sql_scripting",        # A1 P2 (r8: was q_filter_project_case — SQL front door)
    "q_parameterized_sql",    # P2 A1 (r8: was q_top_orders; O2 stays via q_cosine_topk)
    "q_window_rank",          # W1 W4
    "q_window_lag",           # W2
    "q_kll_quantiles",        # A3 sketch, rows-only (r8: was q_window_frame; W3 via q_max_concurrency)
    "q_exists_subquery",      # J9  (r8: was q_anti_join; r7: was q_semi_join)
    "q_merge_upsert",         # J10 P5 U1 (r8: was q_snapshot_diff; r7: was q_outer_join)
    "q_levenshtein_fuzzy",    # J6 FN-string X2 (r8: was q_skyline; r7: was q_theta_join)
    "q_grouping_id",          # A4 grouping-sets battery (r8: was q_rollup)
    "q_pivot",                # A9
    "q_max_concurrency",      # W3 A1 U1 FN-datetime (r8: was q_union_by_name)
    "q_theta_setops",         # A3 U2 U3 sketch, rows-only (r8: was q_intersect_all)
    "q_except_all",           # U3  (r7: was q_except_users)
    "q_parse_url",            # FN-string P3 (r8: was q_regexp_extract_all)
    "q_pricing_summary_decimal",  # A1 P4 (r8: was q_datetime_scalar; FN-datetime via q_max_concurrency)
    "q_welch_ab",             # A1 FN-math (r8: was q_corr_cov)
    "q_xpath",                # P3 FN-string (r8: was q_variant_extract)
    "q_str_to_map",           # FN-map P3 (r8: was q_map_hofs)
    "q_posexplode",           # FN-array P1 (r8: was q_array_setops)
    "q_sort_within_partitions",  # O3
    "q_skew_report",          # A1 T5 U1 (r8: was q_salted_join)
    "q_sql_pipe",             # A1 P2 (r8: was q_market_join6; J5 via q_kcore/q_lateral_topk)
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
    "q_attribution",          # J7 A1 W1 (r8: was q_point_in_time_join)
    "q_approx_topk_events",   # A3 (exact-pinned top-k oracle)
    # UDF ladder
    "q_sql_udf",              # F1 (r8: was q_udf_scalar)
    "q_pandas_udf",           # F2
    "q_embedding_centroid",   # F3 X3 (r7: was q_grouped_agg_udf)
    "q_apply_in_arrow",       # F4 (r8: was q_holt_winters; r7: was q_apply_in_pandas)
    "q_map_in_arrow",         # F5  (r7: was q_map_in_pandas)
    "q_udtf_tokens",          # F6
    # LLM-pipeline extensions
    "q_lateral_topk",         # W4 J5 (r8: was q_dedup_keep_best; X1 via q_dup_clusters/q_decontaminate)
    "q_embedding_neardup",    # X2 X3 (r8: was q_ngram_jaccard)
    "q_cosine_topk",          # X3 (also covers J11 via block cross join)
    "q_knn_ivf_exact",        # X3 IVF ≡ brute force
    "q_multimodal_binary",    # X4
    "q_decontaminate",        # X5 X1 J9 (r8: was q_langid; r7: was q_text_tokens)
    "q_dup_clusters",         # X1/X2 connected components
    "q_kcore",                # J5 A1 X2 iterative graph (r8: was q_pagerank)
    "q_exact_global_median",  # O1 W1 A1 distributed ranking (r8: was q_global_rank_distributed)
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
