"""Round-20 rotation stock (authored in round 13): one fresh shape for
every family whose never-checked pool would drop below TWO candidates
once the projected r14 panel rotates — the two-panels-ahead larder
rule (tools/rotation_report.py --project), which after the r13 swap
flags 31 families at depth exactly 2.  Same program as
plans/round10-19.py: every query is a different SHAPE from its checked
siblings (noted per docstring), integer-exact or convention-pinned so
the DuckDB twin hashes equal at any partitioning.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import pandas_udf

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
# A3 — the sketch read out as a DISPERSION metric (IQR), not raw
# quantiles: one percentile_approx array call, two readouts subtracted
# ---------------------------------------------------------------------------


@register(
    "q_approx_iqr",
    tags=("A3", "A1"),
    oracle="""
SELECT l_linenumber,
       CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE) AS med,
       CAST(quantile_disc(l_quantity, 0.75)
            - quantile_disc(l_quantity, 0.25) AS DOUBLE) AS iqr,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_linenumber
""",
)
def q_approx_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-percentile sketch read out as a DERIVED dispersion metric
    (IQR = q75 − q25) plus the median, per line position — the robust
    spread statistic a profiling job computes from ONE sketch pass.
    The checked A3 siblings return raw quantiles (scalar or array) or
    heavy hitters; deriving arithmetic OVER the readouts is the fresh
    flavor, and it stays exact because l_quantity values are integers
    (the subtraction of two exact order statistics is exact).

    Exactness precondition (same argument as q_approx_quartiles):
    l_quantity has ~50 integer values over ≥857 rows per l_linenumber
    group at the smallest tier, so every gated rank sits ≫ ε·n ranks
    inside its value run — recomputed per tier by
    tests/test_batch_queries.py::
    test_approx_quartiles_exactness_precondition (gates list includes
    this query's l_linenumber grouping)."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_linenumber").agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10000).alias(
            "qs"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return g.select(
        "l_linenumber",
        F.col("qs")[1].alias("med"),
        (F.col("qs")[2] - F.col("qs")[0]).alias("iqr"),
        "n",
    )


# ---------------------------------------------------------------------------
# A4 — rollup FILTERED to its subtotal levels: the "summary board"
# shape (detail rows dropped, only the aggregation lattice kept)
# ---------------------------------------------------------------------------


@register(
    "q_rollup_having",
    tags=("A4", "A1", "P5"),
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       o_orderstatus AS st,
       CAST(GROUPING(EXTRACT(year FROM o_orderdate)) * 2
            + GROUPING(o_orderstatus) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS total
FROM orders
GROUP BY ROLLUP(EXTRACT(year FROM o_orderdate), o_orderstatus)
HAVING GROUPING(EXTRACT(year FROM o_orderdate)) * 2
       + GROUPING(o_orderstatus) > 0
""",
)
def q_rollup_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (year, status) keeping ONLY the subtotal levels
    (grouping_id > 0) — the summary-board shape where the detail grain
    is dropped and just the lattice above it ships.  The checked A4
    siblings emit the full lattice (rollup/cube/grouping-sets) or tag
    levels without filtering on them; FILTERING on grouping_id is the
    fresh flavor (and exercises Catalyst pushing a post-aggregate
    predicate that references the grouping metadata column, which
    cannot be pushed below the Expand).

    Scale: one Expand + one hash aggregate — the subtotal filter
    reduces the output, never the shuffle, exactly as at 100 TB.
    Playbook note: F.grouping() needs NAMED grouping columns, so yr/st
    are materialized with withColumn BEFORE rollup()."""
    o = (
        _t(spark, sf_dir, "orders")
        .withColumn("yr", F.year("o_orderdate"))
        .withColumn("st", F.col("o_orderstatus"))
    )
    return (
        o.rollup("yr", "st")
        .agg(
            (F.grouping("yr") * 2 + F.grouping("st")).cast("int").alias(
                "lvl"
            ),
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("total"),
        )
        .filter(F.col("lvl") > 0)
        .select("yr", "st", "lvl", "n", "total")
    )


# ---------------------------------------------------------------------------
# A5 + A2 — sub-hour tumbling window carrying an EXACT distinct
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_45m_users",
    tags=("A5", "A2", "A1"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp((epoch_us(ts) // 2700000000) * 2700000000)
         AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ev
GROUP BY 1
""",
)
def q_tumbling_45m_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """45-minute tumbling windows carrying an EXACT COUNT(DISTINCT
    user) — the non-divisor-of-an-hour width no checked A5 sibling
    uses (15m/90min/6h/hour/week are all hour-aligned or
    hour-multiples; 45 min buckets drift through the hour grid), and
    the distinct makes it a two-shuffle aggregate (partial count can't
    fold the distinct).  The bucket is integer epoch arithmetic (the
    q_events_tumbling r13 idiom): epoch seconds minus (mod 2700),
    exact for all timestamps in UTC.

    Scale: COUNT(DISTINCT) expands to a two-level aggregate on
    (window, user) then (window) — both keyed on the window bucket, so
    AQE reuses the partitioning; no per-window state beyond the group
    rows."""
    e = _t(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("long")
    bucket = F.timestamp_seconds(ts_sec - F.pmod(ts_sec, F.lit(2700)))
    return e.groupBy(bucket.alias("window_start")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A6 — sliding window over the ORDERS fact (2-day window, 1-day slide)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "q_sliding_2d_orders",
    tags=("A6", "A1"),
    oracle=f"""
WITH starts AS (
  SELECT make_timestamp((epoch_us(o_orderdate) // {_DAY_US}) * {_DAY_US})
           AS s1,
         make_timestamp((epoch_us(o_orderdate) // {_DAY_US}) * {_DAY_US}
                        - {_DAY_US}) AS s2,
         o_totalprice
  FROM orders
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS total
FROM (
  SELECT s1 AS window_start, o_totalprice FROM starts
  UNION ALL
  SELECT s2 AS window_start, o_totalprice FROM starts
)
GROUP BY window_start
""",
)
def q_sliding_2d_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-day sliding windows advancing 1 day over the ORDERS fact —
    every order lands in exactly two windows.  The checked A6 siblings
    slide over events (hours) or wide batch slides (28d/60d/12h); a
    daily slide over the 6.5-year order history is the
    trailing-revenue dashboard shape.  Spark's window() struct IS used
    here (the semantically-necessary case); the oracle expands the two
    window starts per row with integer epoch-µs arithmetic.

    Scale: window() explodes each row into window_size/slide = 2
    copies before the hash aggregate — the blow-up factor is the
    window/slide RATIO, not the window width, which is why a daily
    slide over years of data stays linear."""
    o = _t(spark, sf_dir, "orders")
    w = F.window("o_orderdate", "2 days", "1 day")
    return (
        o.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


# ---------------------------------------------------------------------------
# A7 — sessions over a FILTERED event stream, aggregated per USER
# ---------------------------------------------------------------------------


@register(
    "q_purchase_session_stats",
    tags=("A7", "A1", "P2"),
    oracle=f"""
{EV_CTE}
, p AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts)) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM ev WHERE event_type = 'purchase'
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM p
), per_session AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n_ev) AS BIGINT) AS longest_session
FROM per_session GROUP BY user_id
""",
)
def q_purchase_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions computed over the PURCHASE slice only,
    then rolled up per user (session count + longest session in
    events).  The checked A7 siblings emit session rows (bounds,
    spans, rates, dynamic gaps, keyless globals) over the full stream;
    filtering the stream FIRST and aggregating the sessions AWAY (two
    stacked aggregations on the same user key) is the fresh shape —
    the retention-analysis form.

    Scale: the event_type filter prunes ~80% of rows before the
    session window; both the session_window aggregate and the user
    rollup shuffle on user_id, so the second aggregate is
    shuffle-free."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_session = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_ev").alias("longest_session"),
    )


# ---------------------------------------------------------------------------
# A9 — pivot on a DERIVED temporal key (quarters), zero-filled
# ---------------------------------------------------------------------------


@register(
    "q_pivot_quarters",
    tags=("A9", "FN-datetime", "A1"),
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(quarter FROM o_orderdate) = 1)
            AS BIGINT) AS q1,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(quarter FROM o_orderdate) = 2)
            AS BIGINT) AS q2,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(quarter FROM o_orderdate) = 3)
            AS BIGINT) AS q3,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(quarter FROM o_orderdate) = 4)
            AS BIGINT) AS q4
FROM orders GROUP BY 1
""",
)
def q_pivot_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on a DERIVED temporal key — quarter-of-year columns per
    order year, zero-filled (COUNT never returns NULL for an empty
    cell here because the explicit values list closes the domain).
    The checked A9 siblings pivot stored categorical columns (status,
    segment, priority, year values); deriving the pivot key from a
    timestamp is the calendar-matrix shape.  The explicit values list
    ['q1'..'q4'] skips Spark's distinct-discovery job AND keeps the
    output schema fixed — both required at 100 TB (schema can't
    depend on which quarters happen to appear)."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.concat(F.lit("q"), F.quarter("o_orderdate")).alias("qtr"),
    )
    return (
        o.groupBy("yr")
        .pivot("qtr", ["q1", "q2", "q3", "q4"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["q1", "q2", "q3", "q4"])
    )


# ---------------------------------------------------------------------------
# U2 + U3 — set ops ACROSS source tables (event users vs order
# customers), not across slices of one table
# ---------------------------------------------------------------------------


@register(
    "q_setops_cross_source",
    tags=("U2", "U3", "A2", "A1"),
    oracle=f"""
{EV_CTE}
, buyers AS (SELECT DISTINCT user_id AS k FROM ev
             WHERE event_type = 'purchase'),
  urgent AS (SELECT DISTINCT o_custkey AS k FROM orders
             WHERE o_orderpriority = '1-URGENT')
SELECT 'both' AS mode, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS key_sum
FROM (SELECT k FROM buyers INTERSECT SELECT k FROM urgent)
UNION ALL
SELECT 'event_only', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(k), 0) AS BIGINT)
FROM (SELECT k FROM buyers EXCEPT SELECT k FROM urgent)
UNION ALL
SELECT 'order_only', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(k), 0) AS BIGINT)
FROM (SELECT k FROM urgent EXCEPT SELECT k FROM buyers)
""",
)
def q_setops_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT between key sets drawn from two DIFFERENT
    fact tables (event purchasers vs urgent-order customers), rolled
    up to one row per set-op mode with a key-sum checksum.  Every
    checked U2/U3 sibling carves both operands out of the SAME table
    (event types, years, days, NULL batteries); cross-source identity
    reconciliation is the fresh shape and the one entity-resolution
    pipelines run.

    Scale: both operands are pre-aggregated to distinct keys before
    the set op, so the shuffles carry |distinct users| ≪ |events|
    rows; the three modes share the two distinct scans via plan
    reuse."""
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    buyers = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("k"))
        .distinct()
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )

    def _summ(df: DataFrame, mode: str) -> DataFrame:
        return df.agg(
            F.lit(mode).alias("mode"),
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("key_sum"),
        ).select("mode", "n", "key_sum")

    return (
        _summ(buyers.intersect(urgent), "both")
        .unionAll(_summ(buyers.exceptAll(urgent), "event_only"))
        .unionAll(_summ(urgent.exceptAll(buyers), "order_only"))
    )


# ---------------------------------------------------------------------------
# W4 — top-k per group where the GROUP is coarse and k > 1, pinned to
# the rank-filter (WindowGroupLimit) plan
# ---------------------------------------------------------------------------


@register(
    "q_top2_brands_per_type",
    tags=("W4", "A1", "O2"),
    oracle="""
WITH counts AS (
  SELECT p_type, p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_type, p_brand
), ranked AS (
  SELECT p_type, p_brand, n_parts,
         ROW_NUMBER() OVER (PARTITION BY p_type
                            ORDER BY n_parts DESC, p_brand) AS rk
  FROM counts
)
SELECT p_type, p_brand, n_parts, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 2
""",
)
def q_top2_brands_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 brands by part count within each part type — top-k per
    group over an AGGREGATED relation (the window input is itself a
    groupBy output, 150 rows max), with the brand name as the
    deterministic tie-break.  The checked W4 siblings rank raw fact
    rows (parts per nation, tokens per doc, events per user); ranking
    an aggregate is the two-level shape (aggregate → rank) that
    dashboard top-N tiles compile to.

    Scale: the aggregate reduces 20k parts to ≤150 (type, brand) rows
    BEFORE the window sort, so the rank is effectively free; Spark
    plans the rk<=2 filter as WindowGroupLimit, keeping ≤3 rows per
    group in the sort buffer."""
    p = _t(spark, sf_dir, "part")
    counts = p.groupBy("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("n_parts").desc(), F.col("p_brand")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("p_type", "p_brand", "n_parts", F.col("rk").cast("int"))
    )


# ---------------------------------------------------------------------------
# S1 — scan checksum via BIT_XOR (order-free, overflow-free), one row
# per source table through a union
# ---------------------------------------------------------------------------


@register(
    "q_xor_checksum",
    tags=("S1", "A1", "FN-math", "U1"),
    oracle="""
SELECT 'lineitem' AS src, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(bit_xor(l_orderkey * 8 + l_linenumber) AS BIGINT) AS key_xor
FROM lineitem
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(bit_xor(o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer', CAST(COUNT(*) AS BIGINT),
       CAST(bit_xor(c_custkey) AS BIGINT)
FROM customer
""",
)
def q_xor_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-integrity checksums via BIT_XOR of the (composite) primary
    key, one row per source table — XOR is order-independent,
    overflow-free, and cancels exact duplicates, which is why ingest
    reconciliation uses it over SUM (the checked S1 siblings use
    ordinal/Gauss/parity/row-count identities that all depend on
    contiguous ordinals).  The lineitem key is composite, packed as
    orderkey*8+linenumber (linenumber ≤ 7 fits in 3 bits, exact in
    int64).

    Scale: three full scans reading ONLY the key columns (verified
    column pruning), each folding to one row map-side — the cheapest
    possible full-table integrity pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def _row(df: DataFrame, src: str, key) -> DataFrame:
        return df.agg(
            F.lit(src).alias("src"),
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(key).cast("long").alias("key_xor"),
        ).select("src", "n", "key_xor")

    return (
        _row(li, "lineitem",
             F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        .unionAll(_row(o, "orders", F.col("o_orderkey")))
        .unionAll(_row(c, "customer", F.col("c_custkey")))
    )


# ---------------------------------------------------------------------------
# J10 — FULL OUTER join of two per-day aggregates (coverage diff)
# ---------------------------------------------------------------------------


@register(
    "q_daily_type_outer",
    tags=("J10", "FN-datetime", "A1", "P5"),
    oracle=f"""
{EV_CTE}
, clicks AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev WHERE event_type = 'click' GROUP BY 1
), purchases AS (
  SELECT epoch_us(ts) // {_DAY_US} AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(COALESCE(c.day, p.day) AS BIGINT) AS day,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS clicks,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS purchases,
       CASE WHEN c.day IS NULL THEN 'purchase_only'
            WHEN p.day IS NULL THEN 'click_only'
            ELSE 'both' END AS coverage
FROM clicks c FULL OUTER JOIN purchases p ON c.day = p.day
""",
)
def q_daily_type_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-day aggregates (click days vs
    purchase days) with zero-fill and a coverage tag — the
    calendar-reconciliation shape that finds days present in one
    series but not the other.  The checked J10 siblings left/right
    outer-join a fact to a dimension; FULL outer between two
    AGGREGATED sides (both small, both derived from the same fact) is
    the fresh flavor.

    Scale: both sides reduce to ≤|days| rows before the join — the
    outer join is over two tiny aggregates however big the fact is;
    day is integer epoch-day arithmetic, exact in both engines."""
    e = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    j = clicks.join(purchases, "day", "full_outer")
    return j.select(
        F.col("day").cast("long"),
        F.coalesce("cn", F.lit(0)).cast("long").alias("clicks"),
        F.coalesce("pn", F.lit(0)).cast("long").alias("purchases"),
        F.when(F.col("cn").isNull(), F.lit("purchase_only"))
        .when(F.col("pn").isNull(), F.lit("click_only"))
        .otherwise(F.lit("both"))
        .alias("coverage"),
    )


# ---------------------------------------------------------------------------
# J1 + J3 + J5 — stream-static enrichment through a CHAIN of dims
# (customer → nation → region), aggregated at the top of the chain
# ---------------------------------------------------------------------------


@register(
    "q_stream_static_region",
    tags=("J1", "J3", "J5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT r_name, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev
JOIN customer ON user_id = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, event_type
""",
)
def q_stream_static_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment through a CHAIN of three dimensions
    (customer → nation → region), aggregated at the coarsest level.
    The checked J1 siblings join one dim (customer, nation, supplier
    mix) or a derived profile; the snowflake CHAIN — where each hop is
    itself broadcast-sized and Catalyst collapses all three into
    back-to-back BroadcastHashJoins with zero shuffles before the
    final aggregate — is the fresh shape and the classic star-schema
    rollup.

    Scale: customer is the largest dim (1.5M rows at SF100 ≈ 100 MB —
    still broadcastable); nation/region are constants.  The fact
    never shuffles until the 10-row (region × type) aggregate."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)  # bounded: region dim, 5 rows
        .groupBy("r_name", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# J2 + J7 — conversion-window pair join: signup followed by purchase
# within 7 days (one-sided band)
# ---------------------------------------------------------------------------


@register(
    "q_signup_purchase_window",
    tags=("J2", "J7", "FN-datetime", "A1"),
    oracle=f"""
{EV_CTE}
, s AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'signup'),
  p AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'purchase')
SELECT CAST(epoch_us(s.ts) // 86400000000 AS BIGINT) AS signup_day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_converters,
       {oracle_exact_sum('p.value', VALUE)} AS converted_value
FROM s JOIN p ON s.user_id = p.user_id
 AND p.ts > s.ts
 AND p.ts <= s.ts + INTERVAL 7 DAY
GROUP BY 1
""",
)
def q_signup_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window pair join: every signup matched to the
    purchases the SAME user makes in the following 7 days, rolled up
    per signup day.  The checked J2 siblings pair click/view/purchase
    or error streams on symmetric or chained bands; the ONE-SIDED
    trailing window anchored at an acquisition event is the
    attribution shape marketing funnels run.

    Scale: equi-key (user_id) carries the join — the 7-day band only
    filters within each user's (tiny) event group, so the plan is one
    shuffle on user_id with the band as a post-join predicate, never a
    time-bucket blow-up."""
    e = _t(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    j = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")),
    )
    return j.groupBy(
        F.expr("unix_micros(s_ts) div 86400000000").alias("signup_day")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("s_user").alias("n_converters"),
        exact_sum("p_value", VALUE).alias("converted_value"),
    )


# ---------------------------------------------------------------------------
# J6 — within-order line-pair dominance (theta join under an equi key)
# ---------------------------------------------------------------------------


@register(
    "q_line_pair_dominance",
    tags=("J6", "A1", "J4"),
    oracle="""
SELECT a.l_returnflag AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(a.l_quantity - b.l_quantity AS BIGINT)) AS BIGINT)
         AS qty_gap_total
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey
 AND a.l_linenumber < b.l_linenumber
 AND a.l_quantity >= b.l_quantity + 20
GROUP BY a.l_returnflag
""",
)
def q_line_pair_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-order line-pair dominance: pairs of lines of the SAME
    order where the earlier line position out-quantities the later by
    ≥ 20 units — a theta join (two inequalities) riding on an equi key
    (l_orderkey).  The checked J6 siblings band-join on dates or
    balances across tables; the SELF-join theta bounded by the
    order's own line count (≤ 7, so ≤ 21 pairs per order) is the
    fresh shape.

    Scale: the equi key carries the shuffle — both sides partition on
    l_orderkey and the quadratic term is per-order (constant-bounded),
    so the join is linear in lineitem however large the table.
    Quantities are integer-valued doubles; the gap sum is cast to
    int64 before summing (exact, order-free)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.select(
        F.col("l_orderkey").alias("a_ok"),
        F.col("l_linenumber").alias("a_ln"),
        F.col("l_quantity").alias("a_qty"),
        F.col("l_returnflag").alias("flag"),
    )
    b = li.select(
        F.col("l_orderkey").alias("b_ok"),
        F.col("l_linenumber").alias("b_ln"),
        F.col("l_quantity").alias("b_qty"),
    )
    j = a.join(
        b,
        (F.col("a_ok") == F.col("b_ok"))
        & (F.col("a_ln") < F.col("b_ln"))
        & (F.col("a_qty") >= F.col("b_qty") + 20),
    )
    return j.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("a_qty") - F.col("b_qty")).cast("long"))
        .cast("long")
        .alias("qty_gap_total"),
    )


# ---------------------------------------------------------------------------
# J8 — UNBOUNDED forward as-of via the ignore-nulls window idiom (no
# join at all: the as-of is a per-key running carry)
# ---------------------------------------------------------------------------


@register(
    "q_asof_next_purchase",
    tags=("J8", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, cp AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS next_purchase_ts
  FROM ev WHERE event_type IN ('click', 'purchase')
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(next_purchase_ts) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(epoch_us(next_purchase_ts) - epoch_us(ts)), 0)
            AS BIGINT) AS gap_us_total
FROM cp WHERE event_type = 'click'
GROUP BY user_id
""",
)
def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBOUNDED forward as-of (each click → the next purchase by the
    same user, however far ahead) computed WITHOUT a join: both event
    kinds are unioned into one per-user timeline and the match is a
    running ignore-nulls carry over the DESC-ordered window — the
    single-shuffle as-of idiom.  The checked J8 siblings are
    tolerance-bounded (backward/forward/nearest) or join-shaped; the
    unbounded carry form is the fresh one, and it is the plan that
    wins at 100 TB because the quotes and ticks never cross a join
    boundary (one sort per user partition, zero candidate pairs).

    The (ts DESC, event_id DESC) frame end is the nearest LATER row;
    ignore-nulls walks from it toward later rows, so the carry is the
    nearest later purchase, ties broken by event_id."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = e.withColumn(
        "next_purchase_ts",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    clicks = carried.filter(F.col("event_type") == "click")
    gap = F.unix_micros("next_purchase_ts") - F.unix_micros("ts")
    return clicks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("next_purchase_ts").alias("n_matched"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_us_total"),
    )


# ---------------------------------------------------------------------------
# J9 — semi ∧ anti with the anti side a PRIORITY slice of the same
# fact (customers who order, but never urgently)
# ---------------------------------------------------------------------------


@register(
    "q_patient_customers",
    tags=("J9", "A1", "J3"),
    oracle="""
WITH has_order AS (SELECT DISTINCT o_custkey FROM orders),
     urgent AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM has_order)
  AND c_custkey NOT IN (SELECT o_custkey FROM urgent)
GROUP BY c_mktsegment
""",
)
def q_patient_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi ∧ anti where the anti operand is a PRIORITY slice of the
    same fact: customers who have ordered (semi vs orders) but never
    urgently (anti vs the 1-URGENT slice), per market segment.  The
    checked J9 siblings anti-join across different facts or aggregate
    conditions; carving BOTH operands from one fact with a predicate
    is the fresh shape — and with ~10 orders per customer at priority
    p=1/5, the cohort is non-vacuous at every tier (≈ 0.8^10 ≈ 11% of
    customers: 18/203/1985 measured at sf0.001/0.01/0.1).

    Scale: both probe sides reduce to distinct custkeys before the
    joins; Spark plans LeftSemi + LeftAnti back-to-back on the same
    c_custkey key, one shuffle each over dimension-sized inputs."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    sj = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    aj = sj.join(urgent, sj.c_custkey == urgent.o_custkey, "left_anti")
    return aj.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_custkey").alias("min_custkey"),
    )


# ---------------------------------------------------------------------------
# J11 + J10 — dims-only grid (brand × type) LEFT-joined with actual
# counts, zero-filled
# ---------------------------------------------------------------------------


@register(
    "q_brand_type_grid",
    tags=("J11", "J10", "A1"),
    oracle="""
WITH brands AS (SELECT DISTINCT p_brand FROM part),
     types AS (SELECT DISTINCT p_type FROM part),
     actual AS (
       SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS n_parts
       FROM part GROUP BY p_brand, p_type
     )
SELECT b.p_brand, t.p_type,
       CAST(COALESCE(a.n_parts, 0) AS BIGINT) AS n_parts,
       COALESCE(a.n_parts, 0) > 0 AS present
FROM brands b CROSS JOIN types t
LEFT JOIN actual a ON a.p_brand = b.p_brand AND a.p_type = t.p_type
""",
)
def q_brand_type_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (brand × type) assortment grid: the cross product of the
    two DERIVED dimension domains (25 × 6 = 150 cells) LEFT-joined
    with actual part counts, zero-filled with a presence flag — the
    coverage-matrix shape that finds unstocked combinations.  The
    checked J11 siblings cross stored dims or generated axes; deriving
    BOTH axes from the fact with distinct() first is the fresh
    flavor.

    Plan note: the 25×6 cross join is a deliberate dims-only
    CartesianProduct/BNLJ, allowlisted in tests/test_plans.py — both
    sides are distinct() aggregates bounded by the attribute domains
    (25 and 6), independent of fact row count."""
    p = _t(spark, sf_dir, "part")
    brands = p.select("p_brand").distinct()
    types = p.select("p_type").distinct()
    actual = p.groupBy(
        F.col("p_brand").alias("a_brand"), F.col("p_type").alias("a_type")
    ).agg(F.count(F.lit(1)).alias("a_n"))
    grid = brands.crossJoin(types)
    j = grid.join(
        actual,
        (grid.p_brand == actual.a_brand) & (grid.p_type == actual.a_type),
        "left",
    )
    return j.select(
        "p_brand",
        "p_type",
        F.coalesce("a_n", F.lit(0)).cast("long").alias("n_parts"),
        (F.coalesce("a_n", F.lit(0)) > 0).alias("present"),
    )


# ---------------------------------------------------------------------------
# O1 + W1 — global ORDER STATISTICS band via the distributed two-phase
# rank (the median neighborhood, not the head)
# ---------------------------------------------------------------------------


@register(
    "q_median_band_orders",
    tags=("O1", "W1", "A1"),
    oracle="""
WITH ranked AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS pos,
         COUNT(*) OVER () AS n
  FROM orders
)
SELECT CAST(pos AS BIGINT) AS pos, o_orderkey, o_totalprice
FROM ranked
WHERE pos BETWEEN n // 2 - 2 AND n // 2 + 2
""",
)
def q_median_band_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global MEDIAN NEIGHBORHOOD — the five orders straddling the
    50th percentile of a total (totalprice, orderkey) order — via the
    DISTRIBUTED two-phase rank (operators/ranking.global_row_number:
    range partition + local rank + broadcast offsets), NOT a
    single-partition window.  The checked O1 siblings take the head
    (top-k/limit) or assign buckets; extracting an interior
    order-statistics BAND is the fresh shape — the one quantile
    audits and trimmed estimators need, and the one a naive ORDER BY
    ... OFFSET n/2 plan cannot do at scale (offset forces a full
    ordered scan; the two-phase rank prunes to the one range
    partition containing the band).

    The band filter keys on a count computed in the same plan, so the
    query stays a pure DataFrame composition (scalar-broadcast join of
    the 1-row count — the allowlisted BNLJ pattern)."""
    from ..operators.ranking import global_row_number

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(
        o, ["o_totalprice", "o_orderkey"], out="pos"
    )
    n1 = o.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(n1))
        # Integer floor division to match the oracle's `n // 2`: with an
        # ODD row count, float `_n / 2` shifts the band half a position
        # (4 rows, lowest dropped) vs the oracle's 5-row [n//2-2, n//2+2].
        .filter(
            (F.col("pos") >= F.floor(F.col("_n") / 2) - 2)
            & (F.col("pos") <= F.floor(F.col("_n") / 2) + 2)
        )
        .select(F.col("pos").cast("long"), "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# O3 + T5 — MULTI-KEY hash-bucket layout with a derived secondary
# cluster key
# ---------------------------------------------------------------------------


@register(
    "q_multikey_bucket_layout",
    tags=("O3", "T5", "P2"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01'
""",
)
def q_multikey_bucket_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSITE-key hash-bucket layout: repartition(6, returnflag,
    linestatus) — bucketing on the pair co-locates a future
    (flag, status) grouped aggregation with zero shuffle — then
    sortWithinPartitions on a DERIVED integer cluster key
    (price cents, descending) so each bucket file serves price-ordered
    scans.  The checked O3 siblings hash ONE stored key or range-sort
    stored columns; the multi-key hash + derived-key cluster is the
    remaining cell of the layout matrix.  Content pinned by the
    order-insensitive oracle hash: layout ops must never change the
    row set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    m = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    return m.repartition(6, "l_returnflag", "l_linestatus").sortWithinPartitions(
        F.col("price_cents").desc()
    )


# ---------------------------------------------------------------------------
# P3 — JSON parse driving a CONDITIONAL bucket (parity of the payload
# field), aggregated
# ---------------------------------------------------------------------------


@register(
    "q_props_defaults",
    tags=("P3", "P5", "A1"),
    oracle="""
WITH parsed AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       CASE WHEN k IS NULL THEN 'missing'
            WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS INT) AS k_min,
       CAST(MAX(k) AS INT) AS k_max
FROM parsed GROUP BY 1, 2
""",
)
def q_props_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsed ONCE and routed through a conditional
    bucket (parity of the extracted field, with an explicit 'missing'
    arm for unparseable/absent keys), then aggregated per (type,
    bucket).  The checked P3 siblings extract paths, explode KV maps,
    or flag malformed rows; PARSING-THEN-BRANCHING in one pipeline —
    the ETL normalize-and-route shape — is the fresh flavor.

    Scale: from_json runs once per row inside codegen; the aggregate
    is (5 types × ≤3 buckets) rows.  No UDF, no reparse."""
    e = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    bucket = (
        F.when(k.isNull(), F.lit("missing"))
        .when(k % 2 == 0, F.lit("even"))
        .otherwise(F.lit("odd"))
    )
    return (
        e.select("event_type", k.alias("k"), bucket.alias("k_bucket"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("k_sum"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
        )
    )


# ---------------------------------------------------------------------------
# P4 — temporal ↔ string cast round-trip (format, parse back, compare)
# ---------------------------------------------------------------------------


@register(
    "q_temporal_string_casts",
    tags=("P4", "FN-datetime", "FN-string"),
    oracle=f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month_str,
       strptime(strftime(o_orderdate, '%Y-%m') || '-01', '%Y-%m-%d')
         AS month_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS total
FROM orders GROUP BY 1, 2
""",
)
def q_temporal_string_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal ↔ string cast ROUND-TRIP: format the order date to a
    'yyyy-MM' month string (the cast-to-text direction), then parse
    the string BACK to the month-start timestamp (text-to-temporal) —
    both values kept in the output so the hash gate pins the full
    round trip, not just one direction.  The checked P4 siblings cast
    numerics, booleans, decimals, widths, and try_cast edge strings;
    the temporal-format leg is the remaining cast family.

    Conventions: Spark date_format 'yyyy-MM' ≡ DuckDB strftime
    '%Y-%m' (zero-padded, no locale terms); to_timestamp with an
    explicit pattern ≡ strptime.  Both sides append '-01' before
    parsing so the result is a real timestamp, not a truncation."""
    o = _t(spark, sf_dir, "orders")
    month_str = F.date_format("o_orderdate", "yyyy-MM")
    return (
        o.select(
            month_str.alias("month_str"),
            F.to_timestamp(
                F.concat(month_str, F.lit("-01")), "yyyy-MM-dd"
            ).alias("month_start"),
            "o_totalprice",
        )
        .groupBy("month_str", "month_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# F1 — scalar Python UDF: population count (bit arithmetic the row-UDF
# way, checked against the engine-native bit_count)
# ---------------------------------------------------------------------------


@register(
    "q_udf_bitcount",
    tags=("F1", "FN-math", "A1"),
    oracle="""
SELECT CAST(bit_count(o_orderkey) AS INT) AS popcount,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders GROUP BY 1
""",
)
def q_udf_bitcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF computing the POPCOUNT of the order key
    (bin(x).count('1') row-at-a-time), grouped into a bit-weight
    histogram and checked against DuckDB's native bit_count.  The
    checked F1 siblings do string transforms and digit/check-digit
    arithmetic; bit-level integer work is the remaining scalar-UDF
    flavor.  F1 is the operator under test here — the row UDF IS the
    point (the production path would be the built-in bit_count
    expression, one codegen instruction vs a Python round trip)."""
    from pyspark.sql.types import IntegerType

    @F.udf(returnType=IntegerType())
    def popcount(x: int) -> int:
        return bin(x).count("1")

    o = _t(spark, sf_dir, "orders")
    return o.groupBy(popcount("o_orderkey").alias("popcount")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
    )


# ---------------------------------------------------------------------------
# F2 — pandas UDF: vectorized CLIP (winsorize-to-bounds), exact-sum
# checked
# ---------------------------------------------------------------------------


@register(
    "q_pandas_udf_clip",
    tags=("F2", "A1"),
    oracle=f"""
SELECT c_mktsegment,
       {oracle_exact_sum('LEAST(GREATEST(c_acctbal, 0), 5000)', MONEY)}
         AS clipped_total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer GROUP BY c_mktsegment
""",
)
def q_pandas_udf_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF clipping account balances into [0, 5000] (the
    winsorize-to-bounds normalization), exact-sum aggregated per
    segment against a LEAST/GREATEST oracle.  The checked F2 siblings
    bucket, grade, tag, measure lengths, or iterate batches; a
    numeric RANGE CLAMP — pd.Series.clip, one vectorized kernel over
    the Arrow batch — is the remaining elementwise-numeric flavor.
    Clipping only bounds values (no arithmetic on them), so the
    cents-exact sum sees the same doubles in both engines."""

    @pandas_udf("double")
    def clip_bal(s: pd.Series) -> pd.Series:
        return s.clip(0.0, 5000.0)

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_mktsegment", clip_bal("c_acctbal").alias("clipped")
    ).groupBy("c_mktsegment").agg(
        exact_sum("clipped", MONEY).alias("clipped_total"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# F3 — grouped-agg pandas UDAF: deterministic MODE (most frequent
# value, smallest wins ties)
# ---------------------------------------------------------------------------


@register(
    "q_grouped_agg_mode",
    tags=("F3", "A1"),
    oracle="""
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY c DESC, l_quantity) AS rk
  FROM counts
)
SELECT r.l_returnflag,
       CAST(r.l_quantity AS DOUBLE) AS mode_qty,
       CAST(n.n AS BIGINT) AS n
FROM ranked r
JOIN (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1) n
  ON r.l_returnflag = n.l_returnflag
WHERE r.rk = 1
""",
)
def q_grouped_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF computing the deterministic MODE of
    l_quantity per return flag (most frequent value; ties broken by
    the SMALLEST value, so the reduction is total-order deterministic
    at any partitioning).  The checked F3 siblings compute weighted
    means, medians, spans, second-maxima, and bitmasks; the
    most-frequent-value reduction — pandas value_counts over the whole
    group — is the remaining order-statistic flavor.  The oracle
    reproduces the tie rule with an explicit (count DESC, value)
    ranking."""

    @pandas_udf("double")
    def mode_min(s: pd.Series) -> float:
        counts = s.value_counts()
        top = counts[counts == counts.max()]
        return float(min(top.index))

    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        return int(len(s))

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        mode_min("l_quantity").alias("mode_qty"),
        n_rows("l_quantity").alias("n"),
    )


# ---------------------------------------------------------------------------
# F4 — applyInPandas: per-group TOTAL-ORDER RANK materialized row-wise
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_pandas_rank",
    tags=("F4", "W1"),
    oracle=f"""
{EV_CTE}
SELECT event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS INT) AS rk
FROM ev
""",
)
def q_apply_in_pandas_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas materializing the per-type total-order rank of
    every event (sort by (value, event_id) inside the group, emit
    ordinal) — the grouped-map twin of a ROW_NUMBER window, checked
    against exactly that.  The checked F4 siblings compute gaps,
    z-scores, rolling maxima, run groups, and cogrouped stats — all
    REDUCED outputs; emitting a row-preserving ORDINAL (output rows ==
    input rows) is the remaining grouped-map flavor and the one
    feature pipelines use for per-key percentile features.

    The unique event_id tie-break makes the rank deterministic at any
    partitioning; values pass through untouched (no float
    arithmetic)."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "rk": pd.Series(range(1, len(pdf) + 1), dtype="int32"),
            }
        )

    e = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    return e.groupBy("event_type").applyInPandas(
        rank_group, "event_id long, rk int"
    )


# ---------------------------------------------------------------------------
# F5 — mapInPandas: content FINGERPRINT (md5) with column pruning
# ---------------------------------------------------------------------------


@register(
    "q_map_in_pandas_md5",
    tags=("F5", "X1", "FN-string"),
    oracle="""
SELECT doc_id, md5(text) AS fingerprint,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
)
def q_map_in_pandas_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas computing the md5 content fingerprint of every
    document (hashlib over each Arrow batch) next to its length —
    the exact-dedup key builder as a Python stage, checked against
    DuckDB's native md5.  The checked F5 siblings repeat, sieve,
    chunk, parse, and project; a CRYPTOGRAPHIC DIGEST per row is the
    remaining flavor, and the column-pruned input (doc_id, text only)
    keeps the Arrow transfer minimal — the discipline that matters
    when the corpus is 100 TB (the production path is the builtin
    F.md5 over a binary cast, JVM-side)."""
    import hashlib

    def digest(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fingerprint": [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in pdf["text"]
                    ],
                    "n_chars": pdf["text"].str.len().astype("int64"),
                }
            )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        digest, "doc_id long, fingerprint string, n_chars long"
    )


# ---------------------------------------------------------------------------
# F6 — UDTF over a DIMENSION-SIZED distinct input (explode the 6 part
# types into position-indexed words)
# ---------------------------------------------------------------------------


@register(
    "q_udtf_type_words",
    tags=("F6", "FN-string"),
    oracle="""
SELECT p_type, CAST(i AS INT) AS word_idx, t[CAST(i AS INT)] AS word
FROM (
  SELECT DISTINCT p_type, string_split(p_type, ' ') AS t FROM part
), UNNEST(range(1, len(t) + 1)) AS r(i)
""",
)
def q_udtf_type_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding each DISTINCT part type into
    (position, word) rows — a table function applied to a
    dimension-sized DISTINCT relation (6 rows in, ~18 out), the
    vocabulary-normalization shape.  The checked F6 siblings yield
    tokens/n-grams/windows/pairs over the 500-row document corpus;
    running the UDTF over an aggregated input (distinct() BEFORE the
    lateral join) is the remaining composition — at 100 TB the
    distinct collapses the fact to its attribute domain before any
    Python is paid."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_idx int, word string")
    class TypeWordsUDTF:
        def eval(self, s: str):
            for i, w in enumerate(s.split(" "), start=1):
                yield (i, w)

    spark.udtf.register("type_words_udtf", TypeWordsUDTF)
    d = _t(spark, sf_dir, "part").select("p_type").distinct()
    d.createOrReplaceTempView("__udtf_type_words_in")
    return spark.sql(
        "SELECT p_type, t.word_idx, t.word "
        "FROM __udtf_type_words_in, LATERAL type_words_udtf(p_type) t"
    )


# ---------------------------------------------------------------------------
# T2 — dedup on a VALUE-BUCKET key (first event per user per value
# decade), not a time or content key
# ---------------------------------------------------------------------------


@register(
    "q_first_value_bucket",
    tags=("T2", "A1"),
    oracle=f"""
{EV_CTE}
, keyed AS (
  SELECT user_id, CAST(floor(value / 50) AS BIGINT) AS bucket, ts, event_id
  FROM ev
), ranked AS (
  SELECT user_id, bucket, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                            ORDER BY ts, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY user_id, bucket) AS n_seen
  FROM keyed
)
SELECT user_id, bucket,
       CAST(event_id AS BIGINT) AS first_event_id,
       CAST(n_seen AS BIGINT) AS n_seen
FROM ranked WHERE rk = 1
""",
)
def q_first_value_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keyed on a VALUE-DERIVED bucket — the first event (by ts,
    id) each user logs per value-of-50 band, with the duplicate count
    kept.  The checked T2 siblings dedup on time buckets, payload
    content, or best-value; a NUMERIC-RANGE key derived from the
    measure itself is the remaining key family (the
    first-purchase-over-$X milestone shape).  value // 50 floors in
    both engines (values are positive doubles).

    Scale: one hash aggregate on (user, bucket) with a struct-min —
    no window, no sort; the min carries (ts, event_id, …) in
    lexicographic struct order, the exact ROW_NUMBER()=1 rule."""
    e = _t(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50).cast("long")
    g = e.groupBy("user_id", bucket.alias("bucket")).agg(
        F.min(F.struct("ts", "event_id")).alias("first"),
        F.count(F.lit(1)).alias("n_seen"),
    )
    return g.select(
        "user_id",
        "bucket",
        F.col("first.event_id").alias("first_event_id"),
        "n_seen",
    )


# ---------------------------------------------------------------------------
# T4 — longest SAME-TYPE run per user (equality-chain state machine)
# ---------------------------------------------------------------------------


@register(
    "q_longest_type_run",
    tags=("T4", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
), sized AS (
  SELECT user_id, event_type, run_id, COUNT(*) AS run_len
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id,
       CAST(MAX(run_len) AS BIGINT) AS longest_run,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM sized GROUP BY user_id
""",
)
def q_longest_type_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive SAME-EVENT-TYPE run per user (equality
    chain over the (ts, event_id)-ordered timeline) plus the run
    count — the habit/loop-detection state machine.  The checked T4
    siblings track monotone VALUE chains, threshold crossings,
    debounce, and rate limits; a categorical EQUALITY chain is the
    remaining transition kind.  Lag-mark-cumsum-aggregate: the
    standard batch encoding of a single-token state machine, every
    stage integer-exact.

    Scale: one window sort per user partition and two aggregates, all
    keyed on user_id — the shuffle is paid once and reused (same
    discipline as q_islands' docstring)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "brk",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn(
        "run_id",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sized = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return sized.groupBy("user_id").agg(
        F.max("run_len").alias("longest_run"),
        F.count(F.lit(1)).alias("n_runs"),
    )


# ---------------------------------------------------------------------------
# X2 — prefix-blocked CONTAINMENT pairs (overlap / smaller-set size),
# integer-compare thresholded so no float crosses the hash gate
# ---------------------------------------------------------------------------


@register(
    "q_word_containment_pairs",
    tags=("X2", "X1", "J4"),
    oracle="""
WITH t AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS block,
         list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < 2000
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_cnt,
       CAST(len(a.toks) AS BIGINT) AS a_cnt,
       CAST(len(b.toks) AS BIGINT) AS b_cnt
FROM t a JOIN t b
  ON a.block = b.block AND a.doc_id < b.doc_id
WHERE 10 * len(list_intersect(a.toks, b.toks))
      >= 6 * LEAST(len(a.toks), len(b.toks))
""",
)
def q_word_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT-similarity pairs (overlap / smaller set ≥ 0.6) over
    candidates blocked on the documents' first-five-words prefix — the
    asymmetric measure that catches a short doc embedded in a longer
    one, which Jaccard dilutes.  The checked X2 siblings compute
    Jaccard (word/char/shingle) or hamming; containment is the
    remaining set-similarity measure, and the threshold is evaluated
    as the INTEGER cross-product 10·|∩| ≥ 6·min(|A|,|B|) so no float
    ratio ever crosses the hash gate (the q_temperature_mix
    discipline).  The exact counts ship in the output instead of the
    ratio.

    Scale: the leading-prefix equality block is the cheap key (near
    duplicates share their opening words — the same physics the
    checked prefix-LSH paths exploit); candidates are |block|²-bounded
    per block, never corpus².  The doc_id < 2000 bound exists because
    the ORACLE joins quadratically within blocks at any size."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    t = d.select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias(
            "block"
        ),
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    a = t.select(
        F.col("doc_id").alias("a_id"),
        F.col("block").alias("a_block"),
        F.col("toks").alias("a_toks"),
    )
    b = t.select(
        F.col("doc_id").alias("b_id"),
        F.col("block").alias("b_block"),
        F.col("toks").alias("b_toks"),
    )
    j = a.join(
        b,
        (F.col("a_block") == F.col("b_block"))
        & (F.col("a_id") < F.col("b_id")),
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    a_cnt = F.size("a_toks")
    b_cnt = F.size("b_toks")
    return j.filter(
        10 * inter >= 6 * F.least(a_cnt, b_cnt)
    ).select(
        "a_id",
        "b_id",
        inter.cast("long").alias("inter_cnt"),
        a_cnt.cast("long").alias("a_cnt"),
        b_cnt.cast("long").alias("b_cnt"),
    )


# ---------------------------------------------------------------------------
# X4 — binary payload byte-level stats per source shard (magic-prefix
# census)
# ---------------------------------------------------------------------------


@register(
    "q_payload_byte_stats",
    tags=("X4", "FN-string", "A1"),
    oracle="""
WITH b AS (
  SELECT source, encode(text) AS payload FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT substring(hex(payload), 1, 8)) AS BIGINT)
         AS n_prefixes,
       MIN(substring(hex(payload), 1, 8)) AS min_prefix
FROM b GROUP BY source
""",
)
def q_payload_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level census of a BINARY payload column per source shard:
    total payload bytes, the number of distinct 4-byte magic prefixes,
    and the smallest prefix (hex) — the format-sniffing pass a
    multimodal ingest runs before routing blobs to decoders.  The
    checked X4 siblings round-trip base64, pack typed records, and
    compute bit entropy; the MAGIC-PREFIX census (substring on
    BinaryType + hex, aggregated) is the remaining byte-op family.
    Both engines hex uppercase; DuckDB cannot substring a BLOB, so
    the oracle slices the hex STRING (8 hex chars = 4 bytes) while
    Spark slices the binary then hexes — identical strings.

    Scale: one projection + one hash aggregate; the payload never
    leaves the JVM and only the 4-byte prefix and a length survive the
    map side."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    prefix = F.hex(F.expr("substring(encode(text, 'UTF-8'), 1, 4)"))
    return (
        d.select(
            "source",
            F.octet_length(payload).alias("nb"),
            prefix.alias("prefix"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.countDistinct("prefix").alias("n_prefixes"),
            F.min("prefix").alias("min_prefix"),
        )
    )
