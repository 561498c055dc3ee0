"""Round-14 rotation stock: fresh oracle-checked queries for the §2
families that run dry once the r12 panel consumes the round-12/13
stock (one never-checked candidate each after r11 — see
tools/rotation_report.py).  Same program as plans/round10-13.py; every
query is a different shape from its checked siblings (noted per
docstring).  Conventions: exact integer-scaled sums for money/value
columns (functions/numeric.py), scalar ordering keys for argmin/argmax,
CAST-stabilized timestamps, integer-exact threshold comparisons where
a float divide would be order-dependent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..functions.numeric import (
    MONEY,
    VALUE,
    exact_sum,
    oracle_exact_sum,
)
from ..sources.batch import load_table
from .events_queries import EV_CTE
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A4 — subtotals-only rollup report (grouping level as a FILTER)
# ---------------------------------------------------------------------------


@register(
    "q_rollup_subtotals",
    tags=("A4", "A1", "P5"),
    oracle=f"""
WITH r AS (
  SELECT year(l_shipdate) AS ship_year, l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         {oracle_exact_sum('l_quantity', MONEY)} AS sum_qty
  FROM lineitem
  GROUP BY ROLLUP (year(l_shipdate), l_returnflag)
)
SELECT ship_year, l_returnflag,
       CASE WHEN ship_year IS NULL THEN 2
            WHEN l_returnflag IS NULL THEN 1 END AS lvl,
       n, sum_qty
FROM r
WHERE ship_year IS NULL OR l_returnflag IS NULL
""",
)
def q_rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP consumed as a SUBTOTALS-ONLY report — the grouping level
    becomes a filter, keeping per-year subtotals and the grand total
    while dropping the leaf rows (the checked A4 siblings emit the
    full lattice: q_rollup_orders, q_grouping_sets_returns,
    q_cube_filtered slices by a data predicate, not by level).  Level
    is derived from NULL-ness of the rollup keys — identical logic in
    both engines, valid because neither key is nullable in the data —
    so no engine-specific grouping_id bit order is assumed."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("ship_year"), "l_returnflag", "l_quantity"
    )
    r = li.rollup("ship_year", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("l_quantity", MONEY).alias("sum_qty"),
    )
    return r.filter(
        F.col("ship_year").isNull() | F.col("l_returnflag").isNull()
    ).select(
        "ship_year",
        "l_returnflag",
        F.when(F.col("ship_year").isNull(), 2)
        .when(F.col("l_returnflag").isNull(), 1)
        .alias("lvl"),
        "n",
        "sum_qty",
    )


# ---------------------------------------------------------------------------
# A5 — 90-minute tumbling windows (size is NOT a divisor of the day)
# ---------------------------------------------------------------------------

_W90_US = 90 * 60 * 1_000_000


@register(
    "q_tumbling_90min",
    tags=("A5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp((epoch_us(ts) // {_W90_US}) * {_W90_US})
         AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev GROUP BY 1
""",
)
def q_tumbling_90min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows whose width does NOT divide the day (90 min →
    16 windows/day, drifting across midnight) — pins the epoch-anchored
    alignment of ``window()`` itself, where the checked A5 siblings use
    day-aligned widths (daily, weekly, hourly OHLC).  The oracle
    recomputes the anchor arithmetically (floor(epoch/width)·width), so
    any off-by-one in window assignment breaks the hash."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "90 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# A6 — sliding windows with a DISTINCT aggregate (size/slide = 4)
# ---------------------------------------------------------------------------

_SL30_US = 30 * 60 * 1_000_000


@register(
    "q_sliding_distinct_2h",
    tags=("A6", "A2", "A1"),
    oracle=f"""
{EV_CTE}
, starts AS (
  SELECT make_timestamp((epoch_us(ts) // {_SL30_US}) * {_SL30_US}
                        - k.k * {_SL30_US}) AS window_start,
         user_id
  FROM ev, LATERAL (SELECT unnest(range(0, 4)) AS k) k
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM starts GROUP BY window_start
""",
)
def q_sliding_distinct_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every 30 min with an EXACT DISTINCT
    aggregate inside the window — each event lands in 4 windows and
    the same user must be deduplicated per window, not globally (the
    checked A6 siblings sum/count: q_events_sliding,
    q_sliding_type_windows, q_sliding_global_3h, q_sliding_28d_events).
    The oracle expands the 4 replicas explicitly."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "n_users")
    )


# ---------------------------------------------------------------------------
# A7 — session windows with a DYNAMIC (per-event) gap
# ---------------------------------------------------------------------------


@register(
    "q_session_dynamic_gap",
    tags=("A7", "A1", "P5"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT user_id, ts, value,
         epoch_us(ts) AS t,
         epoch_us(ts) + CASE WHEN event_type = 'error'
                             THEN 300000000 ELSE 900000000 END AS e
  FROM ev
), f AS (
  SELECT user_id, ts, value, t, e,
         CASE WHEN t >= MAX(e) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                OR ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) = 1
              THEN 1 ELSE 0 END AS is_new
  FROM g
), s AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM s GROUP BY user_id, sid
""",
)
def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose gap depends on the EVENT — 5 minutes after
    an error, 15 minutes otherwise (``session_window(ts, gap_column)``,
    the dynamic-gap form; every checked A7 sibling uses a constant
    gap).  Spark merges events while each arrives before the running
    max of (prev ts + prev gap); the oracle reproduces exactly that
    with a running-max window over epoch microseconds.  A session
    closes when the next event's ts is AT or past the frontier
    (≥, matching Spark's half-open session intervals)."""
    e = _t(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "error", F.lit("5 minutes"))
        .otherwise(F.lit("15 minutes"))
    )
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# A9 — UNPIVOT: the inverse reshaping (wide measures → long)
# ---------------------------------------------------------------------------


@register(
    "q_unpivot_flags",
    tags=("A9", "P1", "A1"),
    oracle=f"""
WITH a AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n_rows,
         {oracle_exact_sum('l_quantity', MONEY)} AS sum_qty,
         {oracle_exact_sum('l_extendedprice', MONEY)} AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'n_rows' AS measure, n_rows AS val FROM a
UNION ALL
SELECT l_returnflag, 'sum_qty', sum_qty FROM a
UNION ALL
SELECT l_returnflag, 'sum_price', sum_price FROM a
""",
)
def q_unpivot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the INVERSE reshaping of the checked pivot
    siblings: a wide per-flag measure table goes long as
    (flag, measure, value) rows, the shape feeding generic
    metric-store sinks.  All measures are cast to double before
    melting (unpivot requires a uniform value type); the sums are
    integer-exact underneath so the casts are lossless."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        exact_sum("l_quantity", MONEY).alias("sum_qty"),
        exact_sum("l_extendedprice", MONEY).alias("sum_price"),
    )
    return a.unpivot(
        ids=["l_returnflag"],
        values=["n_rows", "sum_qty", "sum_price"],
        variableColumnName="measure",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# FN-map — map CONSTRUCTION from grouped entries + keyed lookups
# ---------------------------------------------------------------------------


@register(
    "q_map_from_entries",
    tags=("FN-map", "FN-array", "A1"),
    oracle=f"""
{EV_CTE}
SELECT user_id,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
            AS BIGINT) AS clicks,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
            AS BIGINT) AS purchases,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0)
            AS BIGINT) AS errors
FROM ev GROUP BY user_id
""",
)
def q_map_from_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-user event-type histogram AS A MAP
    (collect_list → array_sort → map_from_entries) and answer keyed
    lookups with element_at — map CONSTRUCTION from grouped data,
    where the checked FN-map siblings transform or inspect existing
    maps (q_transform_keys, q_map_battery2, q_map_entries_explode,
    q_map_zip_stats).  array_sort fixes collect_list's
    partition-dependent order before map_from_entries (keys are
    unique per group, values ride along); missing keys surface as
    NULL from element_at and are coalesced to 0 in both engines."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0))
        .cast("long")
        .alias("clicks"),
        F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0))
        .cast("long")
        .alias("purchases"),
        F.coalesce(F.element_at("m", F.lit("error")), F.lit(0))
        .cast("long")
        .alias("errors"),
    )


# ---------------------------------------------------------------------------
# J1 — stream-static enrichment with a DEFAULT channel for misses
# ---------------------------------------------------------------------------


@register(
    "q_stream_static_defaults",
    tags=("J1", "J3", "P5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT CASE WHEN event_type IN ('click', 'view') THEN 'engage'
            WHEN event_type = 'purchase' THEN 'revenue'
            ELSE 'other' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev GROUP BY 1
""",
)
def q_stream_static_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment where the static dim does NOT cover
    every stream key — unmatched events take a DEFAULT channel via
    LEFT join + coalesce (the checked J1 siblings inner-join fully
    covering dims: q_stream_static_join, q_stream_static_nation,
    q_events_supplier_mix).  The dim is a bounded in-plan literal
    (3 rows), exactly the broadcast shape the streaming twin uses;
    the oracle folds the mapping into a CASE."""
    spark_ = spark
    e = _t(spark_, sf_dir, "events")
    dim = spark_.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "revenue")],
        "event_type string, channel string",
    )
    return (
        e.join(F.broadcast(dim), "event_type", "left")
        .select(
            F.coalesce("channel", F.lit("other")).alias("channel"),
            "user_id",
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — stream-stream OUTER conversion join (unmatched side kept)
# ---------------------------------------------------------------------------


@register(
    "q_view_purchase_outer",
    tags=("J2", "J7", "A1"),
    oracle=f"""
{EV_CTE}
, v AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view'),
  p AS (SELECT user_id, ts FROM ev WHERE event_type = 'purchase'),
  m AS (
  SELECT v.event_id, CAST(date_trunc('day', v.ts) AS DATE) AS view_day,
         MAX(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS converted
  FROM v LEFT JOIN p
    ON v.user_id = p.user_id
   AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
  GROUP BY v.event_id, CAST(date_trunc('day', v.ts) AS DATE)
)
SELECT view_day, CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(converted) AS BIGINT) AS n_converted
FROM m GROUP BY view_day
""",
)
def q_view_purchase_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream conversion join kept OUTER: every view is
    reported whether or not a purchase by the same user follows within
    30 minutes (the checked J2 siblings are inner /
    earliest-match: q_stream_stream_join, q_stream_stream_views,
    q_click_purchase) — the funnel-denominator shape, which in
    streaming is the watermark-bounded left-outer interval join.
    Equi-anchored on user_id with a 30-minute band, then collapsed to
    a per-view converted flag before the daily rollup."""
    e = _t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    j = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    )
    per_view = j.groupBy(
        "v_id", F.to_date("v_ts").alias("view_day")
    ).agg(
        F.max(
            F.when(F.col("p_user").isNotNull(), 1).otherwise(0)
        ).alias("converted")
    )
    return per_view.groupBy("view_day").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum("converted").alias("n_converted"),
    )


# ---------------------------------------------------------------------------
# J6 — equi-anchored dominance theta join (inequality on a value column)
# ---------------------------------------------------------------------------


@register(
    "q_acctbal_dominance",
    tags=("J6", "J5", "A1"),
    oracle="""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_dominated
FROM customer c
JOIN supplier s
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
)
def q_acctbal_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominance theta join: customer × supplier pairs in the SAME
    nation where the supplier's balance strictly exceeds the
    customer's — an equi anchor (nationkey) carrying a value
    inequality, vs the checked J6 siblings' range-band shapes
    (q_band_join, q_acctbal_tier_join, q_balance_overlap over
    aggregates).  The equi anchor keeps the pair space per-nation
    blocked (SMJ/shuffle on nationkey; the inequality evaluates
    inside each block), so at 100 TB the cost is Σ per-nation
    |C|×|S|, never a global cross."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = c.join(
        s,
        (F.col("s_nationkey") == F.col("c_nationkey"))
        & (F.col("s_acctbal") > F.col("c_acctbal")),
    ).join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("c_custkey").alias("n_dominated"),
    )


# ---------------------------------------------------------------------------
# J7 — range join against a GENERATED calendar dimension
# ---------------------------------------------------------------------------


@register(
    "q_calendar_range_join",
    tags=("J7", "J11", "A1"),
    oracle=f"""
{EV_CTE}
, weeks AS (
  SELECT UNNEST(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-05',
                      INTERVAL 7 DAY)) AS week_start
)
SELECT w.week_start, CAST(COUNT(ev.ts) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
FROM weeks w LEFT JOIN ev
  ON ev.ts >= w.week_start AND ev.ts < w.week_start + INTERVAL 7 DAY
GROUP BY w.week_start
""",
)
def q_calendar_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a GENERATED weekly calendar dim (sequence →
    explode; 5 rows spanning the fixture's January) — the
    calendar-scaffold shape: every week reported even if empty (LEFT
    from the dim side), where the checked J7 siblings range-join two
    data tables.  The dim is bounded and in-plan, so the range join
    lowers to a broadcast nested-loop against 5 rows — at 100 TB the
    stream side stays partition-parallel and each task scans its rows
    once against the broadcast calendar."""
    e = _t(spark, sf_dir, "events")
    weeks = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-29").cast("timestamp"),
                F.expr("INTERVAL 7 DAYS"),
            )
        ).alias("week_start")
    )
    j = weeks.join(
        e,
        (F.col("ts") >= F.col("week_start"))
        & (F.col("ts") < F.col("week_start") + F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    return j.groupBy("week_start").agg(
        F.count("ts").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# J8 — FORWARD as-of with a staleness tolerance (next match, bounded)
# ---------------------------------------------------------------------------


@register(
    "q_asof_forward_tol",
    tags=("J8", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
  p AS (SELECT user_id, ts FROM ev WHERE event_type = 'purchase'),
  m AS (
  SELECT c.event_id, CAST(date_trunc('day', c.ts) AS DATE) AS click_day,
         CASE WHEN p.ts IS NOT NULL
               AND p.ts <= c.ts + INTERVAL 2 HOUR THEN 1 ELSE 0 END AS hit
  FROM c ASOF LEFT JOIN p
    ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT click_day, CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(SUM(hit) AS BIGINT) AS n_matched_2h
FROM m GROUP BY click_day
""",
)
def q_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with a staleness bound: each click pairs with the
    user's NEXT purchase, counted only when it lands within 2 hours —
    composing the forward direction (q_asof_forward) with a tolerance
    (q_asof_tolerance is backward) and keeping unmatched clicks in the
    denominator.  The tolerance is applied as a post-filter on the
    single as-of match, NOT as a wider join (semantics: "the next
    purchase, if it came soon enough", not "any purchase within 2h");
    DuckDB's native forward ASOF LEFT JOIN is the oracle."""
    from ..operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    j = asof_join(
        clicks,
        buys,
        left_on="c_user",
        right_on="p_user",
        left_ts="c_ts",
        right_ts="p_ts",
        how="left",
        direction="forward",
    )
    per_click = j.select(
        F.to_date("c_ts").alias("click_day"),
        F.when(
            F.col("p_ts").isNotNull()
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 2 HOURS")),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    return per_click.groupBy("click_day").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum("hit").alias("n_matched_2h"),
    )


# ---------------------------------------------------------------------------
# J9 — semi + anti composed: shipped parts with ZERO late shipments
# ---------------------------------------------------------------------------


@register(
    "q_never_late_parts",
    tags=("J9", "A1", "J4"),
    oracle="""
WITH late AS (
  SELECT DISTINCT l.l_partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 1000 DAY
), shipped AS (
  SELECT DISTINCT l_partkey FROM lineitem
)
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_never_late
FROM part p
WHERE EXISTS (SELECT 1 FROM shipped s WHERE s.l_partkey = p.p_partkey)
  AND NOT EXISTS (SELECT 1 FROM late t WHERE t.l_partkey = p.p_partkey)
GROUP BY p.p_brand
""",
)
def q_never_late_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi AND anti join COMPOSED on the same key: parts that have
    shipments (semi) but none shipped more than 45 days after the
    order date (anti on a joined derivation) — the "clean suppliers /
    clean parts" compliance shape, where the checked J9 siblings use a
    single semi or anti leg.  The late set derives from a
    lineitem⋈orders join before the anti, so the anti key is itself
    join-produced."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS")
        )
        .select("l_partkey")
        .distinct()
    )
    shipped = li.select("l_partkey").distinct()
    kept = (
        p.join(shipped, p["p_partkey"] == shipped["l_partkey"], "left_semi")
        .join(late, p["p_partkey"] == late["l_partkey"], "left_anti")
    )
    return kept.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_never_late")
    )


# ---------------------------------------------------------------------------
# J11 — region × priority dense grid (fact pre-aggregated, zero-filled)
# ---------------------------------------------------------------------------


@register(
    "q_region_priority_grid",
    tags=("J11", "J10", "J5", "A1"),
    oracle=f"""
WITH f AS (
  SELECT r.r_name, o.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         {oracle_exact_sum('o.o_totalprice', MONEY)} AS sum_price
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, o.o_orderpriority
)
SELECT g.r_name, g.o_orderpriority,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS n,
       COALESCE(f.sum_price, 0.0) AS sum_price
FROM (SELECT r_name, o_orderpriority
      FROM (SELECT DISTINCT r_name FROM region),
           (SELECT DISTINCT o_orderpriority FROM orders)) g
LEFT JOIN f ON f.r_name = g.r_name
           AND f.o_orderpriority = g.o_orderpriority
""",
)
def q_region_priority_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense region × priority report grid: the fact side is a 4-way
    snowflake aggregate (orders→customer→nation→region), the scaffold
    is a bounded 5×5 dim cross built AFTER aggregation, zero-filled
    via outer join — the third grid shape (q_nation_status_grid:
    nation×status; q_type_day_grid: type×weekday) with a deeper
    snowflake under it.  The cross multiplies two ≤5-row dims, never
    facts."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    f = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))  # bounded: region dim (5 rows)
        .groupBy("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("sum_price"),
        )
    )
    grid = r.select("r_name").distinct().crossJoin(
        o.select("o_orderpriority").distinct()
    )
    return grid.join(f, ["r_name", "o_orderpriority"], "left").select(
        "r_name",
        "o_orderpriority",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("sum_price", F.lit(0.0)).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# O3 — composite range-clustered layout (two range keys + desc secondary)
# ---------------------------------------------------------------------------


@register(
    "q_composite_range_layout",
    tags=("O3", "P2"),
    oracle="""
SELECT l_returnflag, l_shipdate, l_orderkey, l_quantity
FROM lineitem WHERE l_quantity >= 45
""",
)
def q_composite_range_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered write layout on a COMPOSITE key
    (repartitionByRange over (returnflag, shipdate) — lexicographic
    range buckets — then a within-partition sort with a descending
    orderkey tiebreak), vs the checked single-key layouts
    (q_clustered_layout ascending, q_desc_range_layout descending
    secondary, q_zorder_stats interleaved stats).  Layout ops must
    never change content: the order-insensitive oracle hash pins the
    row set."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        li.select("l_returnflag", "l_shipdate", "l_orderkey", "l_quantity")
        .repartitionByRange(6, "l_returnflag", "l_shipdate")
        .sortWithinPartitions(
            "l_returnflag", "l_shipdate", F.col("l_orderkey").desc()
        )
    )


# ---------------------------------------------------------------------------
# P3 — quoted CSV round-trip (delimiter inside a quoted field)
# ---------------------------------------------------------------------------


@register(
    "q_csv_quoted",
    tags=("P3", "FN-string", "A1"),
    oracle="""
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
       MAX(p_retailprice) AS max_price
FROM part GROUP BY p_brand
""",
)
def q_csv_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip where the FIRST field is quoted and contains the
    delimiter (a comma is injected into the name before writing) —
    pins the quote-aware tokenizer path of from_csv, which the checked
    P3 siblings never touch (q_from_csv: plain fields).  The parse
    must recover the original name exactly (comma restored inside the
    quotes), so the group-by-brand profile over PARSED columns matches
    the direct oracle."""
    p = _t(spark, sf_dir, "part")
    line = F.concat(
        F.lit('"'),
        F.regexp_replace("p_name", " ", ","),
        F.lit('",'),
        F.col("p_brand"),
        F.lit(","),
        F.col("p_retailprice").cast("string"),
    )
    parsed = p.select(
        F.from_csv(
            line, F.lit("name string, brand string, price double")
        ).alias("r")
    ).select(
        F.regexp_replace("r.name", ",", " ").alias("p_name"),
        F.col("r.brand").alias("p_brand"),
        F.col("r.price").alias("p_retailprice"),
    )
    return parsed.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("p_name").alias("n_names"),
        F.max("p_retailprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# P4 — integer width narrowing with try_cast (ANSI-safe overflow)
# ---------------------------------------------------------------------------


@register(
    "q_int_width_casts",
    tags=("P4", "P5", "A1"),
    oracle="""
WITH d AS (
  SELECT l_returnflag,
         TRY_CAST(l_orderkey * 7919 % 40000 - 20000 AS SMALLINT) AS sm,
         TRY_CAST(l_orderkey % 300 - 150 AS TINYINT) AS ti
  FROM lineitem
)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(ti) AS BIGINT) AS n_tiny_overflow,
       CAST(SUM(CAST(sm AS BIGINT)) AS BIGINT) AS sum_small,
       CAST(MIN(ti) AS BIGINT) AS min_tiny
FROM d GROUP BY l_returnflag
""",
)
def q_int_width_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer WIDTH narrowing under ANSI mode: values derived to
    straddle the tinyint range are try_cast down (overflow → NULL,
    counted), in-range smallints sum exactly — the widths battery the
    checked P4 siblings don't cover (they exercise strings→numbers,
    dates, floats, epochs).  Both engines share two's-complement
    int8/int16 bounds, so the overflow census is engine-stable."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(
        "l_returnflag",
        F.expr(
            "try_cast(l_orderkey * 7919 % 40000 - 20000 AS SMALLINT)"
        ).alias("sm"),
        F.expr("try_cast(l_orderkey % 300 - 150 AS TINYINT)").alias("ti"),
    )
    return d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count("ti")).alias("n_tiny_overflow"),
        F.sum(F.col("sm").cast("long")).alias("sum_small"),
        F.min("ti").cast("long").alias("min_tiny"),
    )


# ---------------------------------------------------------------------------
# T2 — dedup bounded to a TIME BUCKET (dropDuplicatesWithinWatermark twin)
# ---------------------------------------------------------------------------


@register(
    "q_dedup_within_hour",
    tags=("T2", "A2", "FN-datetime"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT event_type, user_id, date_trunc('hour', ts) AS hr
  FROM ev GROUP BY event_type, user_id, date_trunc('hour', ts)
), t AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total FROM ev GROUP BY 1
)
SELECT t.event_type, t.n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(t.n_total - COUNT(*) AS BIGINT) AS n_dropped
FROM g JOIN t ON g.event_type = t.event_type
GROUP BY t.event_type, t.n_total
""",
)
def q_dedup_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup bounded to a TIME HORIZON: one event per (user, type)
    survives per HOUR bucket — the batch twin of
    ``dropDuplicatesWithinWatermark`` (state expires after the
    horizon, so the same key is admitted again later), vs the checked
    global-key policies (q_dedup_events keep-first, q_latest_event
    keep-last, q_best_event keep-best).  Reported as a per-type
    suppression census; the hour bucket is date_trunc in both engines
    (both return a timestamp-typed key here — it is grouped on, not
    projected, so the DATE-vs-TIMESTAMP convention gap never
    surfaces)."""
    e = _t(spark, sf_dir, "events")
    kept = (
        e.groupBy(
            "event_type", "user_id", F.date_trunc("hour", "ts").alias("hr")
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    totals = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return totals.join(kept, "event_type").select(
        "event_type",
        "n_total",
        "n_kept",
        (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# T4 — fixed-window rate limiter batch twin (keep first K per key+window)
# ---------------------------------------------------------------------------

_RL_US = 10 * 60 * 1_000_000


@register(
    "q_rate_limit",
    tags=("T4", "W4", "A1"),
    oracle=f"""
{EV_CTE}
, b AS (
  SELECT event_type, user_id, ts,
         (epoch_us(ts) // {_RL_US}) AS bkt
  FROM ev
), r AS (
  SELECT event_type,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, bkt
                                      ORDER BY ts) <= 3
              THEN 1 ELSE 0 END AS kept
  FROM b
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_suppressed
FROM r GROUP BY event_type
""",
)
def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate limiter batch twin: at most 3 events per user per 10-minute
    window survive; later arrivals in the window are suppressed — the
    quota/throttle stateful op (a per-key counter that resets on the
    window boundary), distinct from the checked T4 twins (sessionize,
    streaks, run lengths, debounce), expressed as row_number over
    (user, window) with the per-user ts order (unique per fixture).
    Reported as a per-type suppression census."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", (F.col("ts").cast("long") / 600).cast("long")
    ).orderBy("ts")
    r = e.select(
        "event_type",
        F.when(F.row_number().over(w) <= 3, 1).otherwise(0).alias("kept"),
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("kept").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).alias("n_suppressed"),
    )


# ---------------------------------------------------------------------------
# T5 — AQE REBALANCE hint (skew-aware output re-distribution)
# ---------------------------------------------------------------------------


@register(
    "q_rebalance_hint",
    tags=("T5", "A1"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('l_extendedprice', MONEY)} AS sum_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_rebalance_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REBALANCE hint — AQE's skew-aware redistribution (splits
    oversized partitions, coalesces tiny ones; a best-effort shuffle
    the optimizer may size at runtime), vs the checked T5 siblings'
    hard REPARTITION / REPARTITION_BY_RANGE / repartition→coalesce
    shapes.  Content must be partitioning-invariant: the aggregate
    result is pinned against the plain oracle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.hint("rebalance", "l_returnflag")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("l_extendedprice", MONEY).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# U1 — three-source union with heterogeneous schemas (null-filled)
# ---------------------------------------------------------------------------


@register(
    "q_union_three_sources",
    tags=("U1", "A1", "P5"),
    oracle=f"""
{EV_CTE}
, u AS (
  SELECT 'order' AS kind, o_totalprice AS amount,
         CAST(NULL AS DOUBLE) AS qty, CAST(NULL AS DOUBLE) AS value
  FROM orders
  UNION ALL
  SELECT 'line', l_extendedprice, l_quantity, CAST(NULL AS DOUBLE)
  FROM lineitem
  UNION ALL
  SELECT 'event', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), value
  FROM ev
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(amount) AS BIGINT) AS n_amount,
       {oracle_exact_sum('amount', MONEY)} AS sum_amount,
       CAST(COUNT(qty) AS BIGINT) AS n_qty,
       CAST(COUNT(value) AS BIGINT) AS n_value
FROM u GROUP BY kind
""",
)
def q_union_three_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-source unionByName with allowMissingColumns: orders,
    lineitem, and events legs each carry a different column subset and
    the union null-fills the gaps (the checked U1 siblings align two
    legs or use positional UNION ALL).  The per-kind profile counts
    non-null presence per column — the schema-evolution ingest shape
    where shards written under different schema versions land in one
    relation.  NOTE: sum_amount over the null-filled column skips
    NULLs identically in both engines (SUM ignores NULL; the exact-sum
    scaling preserves that)."""
    o = _t(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("kind"),
        F.col("l_extendedprice").alias("amount"),
        F.col("l_quantity").alias("qty"),
    )
    e = _t(spark, sf_dir, "events").select(
        F.lit("event").alias("kind"), "value"
    )
    u = o.unionByName(li, allowMissingColumns=True).unionByName(
        e, allowMissingColumns=True
    )
    return u.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("amount").alias("n_amount"),
        exact_sum("amount", MONEY).alias("sum_amount"),
        F.count("qty").alias("n_qty"),
        F.count("value").alias("n_value"),
    )


# ---------------------------------------------------------------------------
# U2/U3 — chained set operators with explicit precedence
# ---------------------------------------------------------------------------


@register(
    "q_setops_chain",
    tags=("U2", "U3", "A2", "J4"),
    oracle="""
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996),
     b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT o_custkey
FROM ((SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
      INTERSECT
      SELECT c_custkey FROM b)
""",
)
def q_setops_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED set operators with explicit precedence: (1995 customers
    EXCEPT 1996 customers) INTERSECT building-segment customers — the
    churned-cohort-in-segment report.  The checked siblings exercise
    the operators side by side (q_setops_years tags cohorts,
    q_setops_modes pins bag semantics); this one pins the COMPOSITION
    — the EXCEPT must evaluate before the INTERSECT, and the column
    name survives from the leftmost leg in both engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    y95 = (
        o.filter(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
    )
    y96 = (
        o.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
    )
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return y95.exceptAll(y96).intersect(b)


# ---------------------------------------------------------------------------
# X2 — exact character-4-gram Jaccard pairs (integer-exact threshold)
# ---------------------------------------------------------------------------


@register(
    "q_chargram_jaccard",
    tags=("X2", "J4", "A1"),
    oracle="""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
), g AS (
  SELECT DISTINCT doc_id,
         substr(text, CAST(i.i + 1 AS INT), 4) AS gram
  FROM d, LATERAL (SELECT unnest(range(0, length(text) - 3)) AS i) i
), sz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(COUNT(*) AS BIGINT) AS i
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT inter.a_id, inter.b_id, inter.i AS n_shared,
       (sa.n + sb.n - inter.i) AS n_union
FROM inter
JOIN sz sa ON sa.doc_id = inter.a_id
JOIN sz sb ON sb.doc_id = inter.b_id
WHERE 5 * inter.i >= 4 * (sa.n + sb.n - inter.i)
""",
)
def q_chargram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CHARACTER-4-gram Jaccard near-dup pairs (threshold 0.8)
    over a bounded slice — the sub-word dedup unit that catches
    whitespace/punctuation edits word shingles miss (the checked X2
    members all tokenize to words first).  The threshold compare is
    INTEGER-exact (5·|∩| ≥ 4·|∪|), so no float divide can drift
    between engines; output carries the raw set sizes.  Bounded to
    300 docs (7 pairs at sf0.01): the all-pairs-via-shared-gram join is the REFERENCE
    form — at corpus scale the prefix/LSH/SimHash indexes are the
    path (this is their exactness yardstick in char-gram space)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    g = (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.length("text") - F.lit(4)
                )
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.substring(F.col("text"), F.col("i") + 1, 4).alias("gram"),
        )
        .distinct()
    )
    sz = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("doc_id").alias("a_id"), "gram")
    b = g.select(F.col("doc_id").alias("b_id"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sz.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .filter(
            F.lit(5) * F.col("i")
            >= F.lit(4) * (F.col("na") + F.col("nb") - F.col("i"))
        )
        .select(
            "a_id",
            "b_id",
            F.col("i").alias("n_shared"),
            (F.col("na") + F.col("nb") - F.col("i")).alias("n_union"),
        )
    )


# ---------------------------------------------------------------------------
# X4 — byte-level Shannon entropy of payloads (deterministic fold)
# ---------------------------------------------------------------------------


@register(
    "q_binary_entropy",
    tags=("X4", "X5", "FN-math"),
    oracle="""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n_bytes
  FROM documents WHERE doc_id < 300 AND octet_length(encode(text)) > 0
), bytes AS (
  SELECT doc_id, n_bytes,
         substr(h, CAST(i.i * 2 + 1 AS INT), 2) AS byte
  FROM b, LATERAL (SELECT unnest(range(0, n_bytes)) AS i) i
), freq AS (
  SELECT doc_id, n_bytes, byte, CAST(COUNT(*) AS BIGINT) AS c
  FROM bytes GROUP BY doc_id, n_bytes, byte
), packed AS (
  SELECT doc_id, n_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
         list(c ORDER BY byte) AS cs
  FROM freq GROUP BY doc_id, n_bytes
)
SELECT doc_id, n_bytes, n_distinct_bytes,
       ROUND(list_reduce(
         list_prepend(0.0, list_transform(cs,
           c -> -(CAST(c AS DOUBLE) / n_bytes)
                 * log2(CAST(c AS DOUBLE) / n_bytes))),
         (acc, x) -> acc + x), 6) AS entropy
FROM packed
""",
)
def q_binary_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level Shannon entropy per payload — the
    compressibility/garbage screen a binary-ingest pipeline runs
    before decode (the checked X4 members sniff magic bytes, chunk,
    or sample frames).  Floating sums are order-dependent, so the
    per-byte terms are folded in EXPLICIT ascending-byte order on both
    engines (sort_array + F.aggregate here, list(ORDER BY) +
    list_reduce there) — a deterministic left fold, bit-identical
    given identical terms — then rounded to 6 dp as belt."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.hex(F.encode("text", "UTF-8")).alias("h"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        )
        .filter(F.col("n_bytes") > 0)
    )
    byte_rows = d.select(
        "doc_id",
        "n_bytes",
        F.explode(
            F.sequence(F.lit(0), F.col("n_bytes") - 1)
        ).alias("i"),
        "h",
    ).select(
        "doc_id",
        "n_bytes",
        F.substring(
            F.col("h"), (F.col("i") * 2 + 1).cast("int"), 2
        ).alias("byte"),
    )
    freq = byte_rows.groupBy("doc_id", "n_bytes", "byte").agg(
        F.count(F.lit(1)).alias("c")
    )
    packed = freq.groupBy("doc_id", "n_bytes").agg(
        F.count(F.lit(1)).alias("n_distinct_bytes"),
        F.array_sort(F.collect_list(F.struct("byte", "c"))).alias("pairs"),
    )
    term = (
        "-(CAST(p.c AS DOUBLE) / n_bytes) "
        "* log2(CAST(p.c AS DOUBLE) / n_bytes)"
    )
    return packed.select(
        "doc_id",
        "n_bytes",
        "n_distinct_bytes",
        F.round(
            F.expr(
                f"aggregate(pairs, CAST(0.0 AS DOUBLE), (acc, p) -> acc + ({term}))"
            ),
            6,
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# S1 — cross-table provenance union (file_name over two scans)
# ---------------------------------------------------------------------------


@register(
    "q_provenance_union",
    tags=("S1", "U1", "A1"),
    oracle="""
SELECT 'events.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
UNION ALL
SELECT 'documents.parquet', CAST(COUNT(*) AS BIGINT) FROM documents
""",
)
def q_provenance_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-TABLE provenance: one union over two scans, each row
    tagged with its source file via `_metadata.file_name`, rolled up
    per file — the multi-source lineage audit (the checked S1 members
    profile a single table each).  The union must preserve each leg's
    hidden-column binding (a naive plan could conflate the metadata
    struct across legs)."""
    e = _t(spark, sf_dir, "events").select(
        F.col("_metadata.file_name").alias("file_name")
    )
    d = _t(spark, sf_dir, "documents").select(
        F.col("_metadata.file_name").alias("file_name")
    )
    return (
        e.unionByName(d)
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
