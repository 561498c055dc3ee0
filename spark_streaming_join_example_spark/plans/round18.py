"""Round-18 rotation stock (authored in round 12, second tranche):
one further fresh shape for each family that would be down to a
single never-checked candidate once the projected r13 panel
(NOTES_r12.md shortlist) consumes its pick — keeping the rotation
larder two panels deep without r13 needing to author.  Same program
as plans/round10-17.py: every query is a different SHAPE from its
checked siblings (noted per docstring), integer-exact or
convention-pinned so the DuckDB twin hashes equal.

This module registers row/pandas UDFs (the F-family flavors), so it
appears in tests/test_lint.py's per-module UDF allowlist alongside
plans/udf_queries.py and plans/round16.py.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.numeric import MONEY, VALUE, exact_sum, oracle_exact_sum
from ..sources.batch import load_table
from .events_queries import EV_CTE
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A3 — approx_top_k with explicit capacity + relative-support filter
# ---------------------------------------------------------------------------


@register(
    "q_approx_topk_support",
    tags=("A3", "A1", "FN-datetime"),
    oracle=f"""
{EV_CTE}
, c AS (
  SELECT event_type || '|' || CAST(dayofweek(ts) + 1 AS VARCHAR) AS k,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1
), t AS (SELECT SUM(cnt) AS total FROM c)
SELECT k, cnt FROM c, t WHERE cnt * 100 >= total
""",
)
def q_approx_topk_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters by RELATIVE support (≥ 1 % of the stream) via
    ``approx_top_k`` with an explicit ``maxItemsTracked`` capacity —
    the support-threshold mining form (the checked A3 top-k siblings
    rank to a fixed k).  The composite key (event_type ⊕ day-of-week)
    has a 35-value domain far under the 256-item capacity, so sketch
    counts are provably exact and the oracle is the plain GROUP BY
    with the same 1 % filter; the support threshold is computed from
    the sketch's own exploded rows with a window SUM — no second scan
    and no scalar cross join.  Day-of-week pinned to Spark's
    convention (1 = Sunday): DuckDB's dayofweek is 0-based."""
    e = _t(spark, sf_dir, "events")
    sk = e.select(
        F.concat_ws(
            "|", "event_type", F.dayofweek("ts").cast("string")
        ).alias("k")
    ).agg(F.expr("approx_top_k(k, 64, 256)").alias("tk"))
    ex = sk.select(F.explode("tk").alias("x")).select(
        F.col("x.item").alias("k"), F.col("x.count").alias("cnt")
    )
    total = F.sum("cnt").over(Window.partitionBy())
    return (
        ex.withColumn("_total", total)
        .filter(F.col("cnt") * 100 >= F.col("_total"))
        .select("k", "cnt")
    )


# ---------------------------------------------------------------------------
# A4 — rollup over a DERIVED temporal hierarchy (year → month)
# ---------------------------------------------------------------------------


@register(
    "q_rollup_year_month",
    tags=("A4", "A1", "FN-datetime"),
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mon,
       CAST(2 * GROUPING(year(o_orderdate))
            + GROUPING(month(o_orderdate)) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS revenue
FROM orders
GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
""",
)
def q_rollup_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a DERIVED calendar hierarchy — year ⊃ month
    subtotals plus the grand total, with the grouping id.  The
    checked A4 siblings roll stored categorical columns
    (status/priority) or use explicit sets; rolling computed
    date-part keys is the time-series report shape (and makes the
    optimizer place the extraction below the expand)."""
    o = (
        _t(spark, sf_dir, "orders")
        .withColumn("yr", F.year("o_orderdate"))
        .withColumn("mon", F.month("o_orderdate"))
    )
    return o.rollup("yr", "mon").agg(
        (F.grouping("yr") * 2 + F.grouping("mon"))
        .cast("long")
        .alias("gid"),
        F.count(F.lit(1)).alias("n"),
        exact_sum("o_totalprice", MONEY).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A5 — tumbling windows emitting BOTH bounds
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_15m_bounds",
    tags=("A5", "A2"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS wstart,
       make_timestamp((epoch_us(ts) // 900000000) * 900000000
                      + 900000000) AS wend,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM ev GROUP BY 1, 2
""",
)
def q_tumbling_15m_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global 15-minute tumble emitting BOTH window bounds — every
    checked A5 sibling projects only ``window.start``; downstream
    range joins and BI tools key on the half-open [start, end), so
    the end column is part of the real API surface.  The oracle
    derives end = start + width with the same integer-µs arithmetic
    Spark's window struct guarantees."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# A6 — sliding windows over ORDERS keyed by priority (2 replicas)
# ---------------------------------------------------------------------------


@register(
    "q_sliding_60d_priority",
    tags=("A6", "A1"),
    oracle=f"""
SELECT make_timestamp(((epoch_us(o_orderdate) // 2592000000000) - k.k)
                      * 2592000000000) AS wstart,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS revenue
FROM orders CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
GROUP BY 1, 2
""",
)
def q_sliding_60d_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(o_orderdate, '60 days', '30 days') keyed by order
    priority — the sliding roll over the BATCH orders table (every
    checked A6 sibling slides the event stream; sliding a date-keyed
    fact table is the monthly-report shape).  Width = 2× slide ⇒
    exactly two replicas per order, generated in the oracle with
    integer-µs bucket arithmetic (30 days = 2 592 000 000 000 µs)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.window("o_orderdate", "60 days", "30 days").alias("w"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("revenue"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "o_orderpriority",
            "n",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# A7 — session windows with END bound and event-rate
# ---------------------------------------------------------------------------


@register(
    "q_session_rates",
    tags=("A7", "A1"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT user_id, ts, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts) > 600000000
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM ev
), s AS (
  SELECT user_id, ts, t,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(ts) AS session_start,
       make_timestamp(MAX(t) + 600000000) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(COUNT(*) * 60000000 AS DOUBLE)
             / (MAX(t) + 600000000 - MIN(t)), 6) AS events_per_min
FROM s GROUP BY user_id, sid
""",
)
def q_session_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 10-minute-gap sessions emitting the session END (last
    event + gap — the half-open bound Spark's session_window struct
    defines) and the event rate per minute over that closed span.
    The checked A7 siblings report starts/counts/sums; the end bound
    and a duration-derived METRIC are the monitoring-dashboard shape.
    Rate = n·60e6 / duration_µs — integer operands into one IEEE
    divide, identical in both engines (duration > 0 always: the gap
    pads every session)."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy(
        "user_id", F.session_window("ts", "10 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    dur = F.unix_micros("w.end") - F.unix_micros("w.start")
    return g.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n",
        F.round(
            (F.col("n") * F.lit(60_000_000)).cast("double") / dur, 6
        ).alias("events_per_min"),
    )


# ---------------------------------------------------------------------------
# A9 — pivot with an EXACT-AVERAGE aggregate (nullable cells)
# ---------------------------------------------------------------------------


@register(
    "q_pivot_avg_balance",
    tags=("A9", "A1"),
    oracle="""
SELECT c_nationkey,
       CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
             THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) END) AS DOUBLE)
         / COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END)
         / 100.0 AS avg_auto,
       CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'
             THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) END) AS DOUBLE)
         / COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END)
         / 100.0 AS avg_household,
       CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'
             THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) END) AS DOUBLE)
         / COUNT(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END)
         / 100.0 AS avg_furniture
FROM customer GROUP BY c_nationkey
""",
)
def q_pivot_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot whose cell aggregate is the ORDER-INDEPENDENT exact
    average (scaled-integer sum / count / scale) — the checked A9
    siblings pivot counts and sums; a mean inside a pivot is where
    naive float division breaks cross-engine hashing, so the cell
    formula IS the point.  Absent (nation, segment) cells stay NULL
    in both engines (empty SUM is NULL and NULL propagates through
    the divides), pinning the sparse-grid contract without a
    COALESCE mask."""
    from ..functions.numeric import exact_avg

    c = _t(spark, sf_dir, "customer")
    piv = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", ["AUTOMOBILE", "HOUSEHOLD", "FURNITURE"])
        .agg(exact_avg("c_acctbal", MONEY))
    )
    return piv.select(
        "c_nationkey",
        F.col("AUTOMOBILE").alias("avg_auto"),
        F.col("HOUSEHOLD").alias("avg_household"),
        F.col("FURNITURE").alias("avg_furniture"),
    )


# ---------------------------------------------------------------------------
# FN-map — canonical map→string rendering
# ---------------------------------------------------------------------------


@register(
    "q_map_render",
    tags=("FN-map", "FN-string", "A1"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY user_id, event_type
)
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                  ORDER BY event_type) AS profile,
       CAST(COUNT(*) AS BIGINT) AS n_types
FROM g GROUP BY user_id
""",
)
def q_map_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile map rendered to a CANONICAL string
    ("type:n,…", keys sorted) — the map→text serialization every
    cache key / debug log / feature-store export needs, exercising
    map_keys + array_sort + transform-with-element_at + concat_ws in
    one chain.  The checked FN-map siblings build, zip, concat or
    explode maps; none serializes one deterministically.  Sorted-key
    order makes the string unique, so the hash gate pins the whole
    rendering convention."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = g.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    ks = F.array_sort(F.map_keys(F.col("m")))
    parts = F.transform(
        ks,
        lambda k: F.concat(
            k, F.lit(":"), F.element_at(F.col("m"), k).cast("string")
        ),
    )
    return m.select(
        "user_id",
        F.concat_ws(",", parts).alias("profile"),
        F.size("m").cast("long").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# J2 — three-stage event chain (view → click → purchase)
# ---------------------------------------------------------------------------


@register(
    "q_view_click_purchase_chain",
    tags=("J2", "J7", "A1"),
    oracle=f"""
{EV_CTE}
, v AS (SELECT user_id, epoch_us(ts) AS t FROM ev
        WHERE event_type = 'view'),
  c AS (SELECT user_id, epoch_us(ts) AS t FROM ev
        WHERE event_type = 'click'),
  p AS (SELECT user_id, epoch_us(ts) AS t FROM ev
        WHERE event_type = 'purchase')
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(MIN(p.t - v.t) AS BIGINT) AS min_span_us,
       CAST(MAX(p.t - v.t) AS BIGINT) AS max_span_us
FROM v JOIN c ON v.user_id = c.user_id
             AND c.t > v.t AND c.t <= v.t + 43200000000
       JOIN p ON c.user_id = p.user_id
             AND p.t > c.t AND p.t <= c.t + 86400000000
GROUP BY v.user_id
""",
)
def q_view_click_purchase_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-stage interval chain: view → click within 12 h →
    purchase within a further 24 h, per user (the fixture's per-user
    streams average ~3 events/day, so sub-hour windows are vacuous at
    every tier — probed 19/164/1948 chains at sf0.001/0.01/0.1) — the funnel-attribution
    join a two-stream stream-stream join can't express (state must
    carry the intermediate click).  The checked J2 siblings join two
    event slices; chaining two interval joins is the n-stage funnel
    shape, and the per-user chain count is clicks-in-band ×
    purchases-in-band — burst-bounded, mirrored exactly by the
    oracle."""
    e = _t(spark, sf_dir, "events")

    def slc(t, a, b):
        return e.filter(F.col("event_type") == t).select(
            F.col("user_id").alias(a),
            F.unix_micros("ts").alias(b),
        )

    v = slc("view", "user_id", "v_t")
    c = slc("click", "c_user", "c_t")
    p = slc("purchase", "p_user", "p_t")
    vc = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_t") > F.col("v_t"))
        & (F.col("c_t") <= F.col("v_t") + 43_200_000_000),
    )
    vcp = vc.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_t") > F.col("c_t"))
        & (F.col("p_t") <= F.col("c_t") + 86_400_000_000),
    )
    return vcp.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_chains"),
        F.min(F.col("p_t") - F.col("v_t")).alias("min_span_us"),
        F.max(F.col("p_t") - F.col("v_t")).alias("max_span_us"),
    )


# ---------------------------------------------------------------------------
# J6 — date-band self-join via bucket blocking (the scale form)
# ---------------------------------------------------------------------------


@register(
    "q_contained_orders",
    tags=("J6", "J4", "A1"),
    oracle="""
WITH q AS (
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    AND o_orderdate < TIMESTAMP '2001-04-01'
)
SELECT a.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(abs(date_diff('day', a.o_orderdate, b.o_orderdate)))
            AS BIGINT) AS min_gap_days
FROM q a JOIN q b
  ON a.o_orderpriority = b.o_orderpriority
 AND b.o_orderdate >= a.o_orderdate - INTERVAL 15 DAY
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 15 DAY
 AND a.o_custkey <> b.o_custkey
 AND a.o_orderkey < b.o_orderkey
GROUP BY a.o_orderpriority
""",
)
def q_contained_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±15-day same-priority cross-customer order pairs, joined
    through DATE-BUCKET BLOCKING: each probe row explodes into its
    bucket and both neighbors (bucket = day // 15), the join key is
    the EQUI pair (priority, bucket), and the exact band predicate
    filters after — the standard banding rewrite that turns an
    inequality join into a shuffle-joinable equi join (the checked J6
    siblings either band against a tiny dim or self-band per
    customer key; this is the hot-key band whose unblocked form is
    Θ(n²) per priority).  A pair matches through exactly ONE of the
    three probe buckets (a's bucket is fixed), so no dedup pass is
    needed.  Scoped to 2001-Q1 (44/546/5576 orders at the three
    tiers): the oracle is the direct inequality join, quadratic per
    priority — the quarter bound keeps its pair scan fixture-sized at
    every tier (the UNSCOPED form measured 93 s of oracle + 16 s of
    Spark at sf0.1's 150k orders; the blocked join itself is what
    scales, the bound exists for the differential harness), and the
    oracle band is written as two range predicates, not abs(), so
    DuckDB can use its inequality-join machinery."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-04-01").cast("timestamp"))
    )
    day = (F.unix_micros("o_orderdate") / F.lit(86_400_000_000)).cast(
        "long"
    )
    a = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").alias("a_cust"),
        F.col("o_orderkey").alias("a_key"),
        day.alias("a_day"),
        (day / 15).cast("long").alias("bucket"),
    )
    b = o.select(
        F.col("o_orderpriority").alias("b_prio"),
        F.col("o_custkey").alias("b_cust"),
        F.col("o_orderkey").alias("b_key"),
        day.alias("b_day"),
        F.explode(
            F.array(
                (day / 15).cast("long") - 1,
                (day / 15).cast("long"),
                (day / 15).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    j = a.join(
        b,
        (F.col("prio") == F.col("b_prio"))
        & (a["bucket"] == b["bucket"])
        & (F.col("a_cust") != F.col("b_cust"))
        & (F.col("a_key") < F.col("b_key"))
        & (
            F.abs(F.col("a_day") - F.col("b_day")) <= 15
        ),
    )
    return j.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.abs(F.col("a_day") - F.col("b_day"))).alias(
            "min_gap_days"
        ),
    )


# ---------------------------------------------------------------------------
# J9 — semi ∧ anti composed on an AGGREGATE condition
# ---------------------------------------------------------------------------


@register(
    "q_no_open_orders",
    tags=("J9", "A1"),
    oracle=f"""
WITH w AS (SELECT DISTINCT o_custkey FROM orders),
     o AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderstatus = 'O')
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {oracle_exact_sum('c_acctbal', MONEY)} AS sum_acctbal
FROM customer
JOIN w ON c_custkey = w.o_custkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM o)
GROUP BY c_nationkey
""",
)
def q_no_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with purchase history but NO open order (≥ 1 order,
    none with status 'O'): a left-semi against the order log composed
    with a left-anti against its 'O' slice, profiled per nation —
    the fully-settled-accounts cohort.  The checked J9 siblings
    compose semi/anti across tables or time-scope one stream; this
    one ANDs the two join flavors over the same fact table on an
    aggregate-ish condition ("none of the group is open") expressed
    purely as joins — no groupBy-HAVING materialization."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    with_orders = o.select(F.col("o_custkey").alias("ck")).distinct()
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("ck")
    )
    cohort = with_orders.join(open_, "ck", "left_anti")
    return (
        c.join(cohort, c["c_custkey"] == cohort["ck"])
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal", MONEY).alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# P4 — decimal casts: exact money arithmetic + overflow census
# ---------------------------------------------------------------------------


@register(
    "q_decimal_casts",
    tags=("P4", "A1"),
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(TRY_CAST(o_totalprice AS DECIMAL(5,2))) AS BIGINT)
         AS n_small,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_dec
FROM orders GROUP BY o_orderstatus
""",
)
def q_decimal_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL cast battery: exact fixed-point money arithmetic via
    CAST(double AS DECIMAL(18,2)) — the prices are 2-decimal by
    construction, so the cast is value-preserving and the decimal SUM
    is exact and order-independent (an alternative route to the
    scaled-bigint discipline) — plus the overflow census:
    TRY_CAST AS DECIMAL(5,2) nulls every price ≥ 1000 identically in
    both engines.  The checked P4 siblings cover numeric-width,
    temporal, boolean and string casts; DECIMAL precision/scale is
    the remaining cast axis."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.expr("try_cast(o_totalprice AS DECIMAL(5,2))")
        ).alias("n_small"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_dec"),
    )


# ---------------------------------------------------------------------------
# S1 — physical-ordinal Gauss checksum across two tables
# ---------------------------------------------------------------------------


@register(
    "q_ordinal_checksum",
    tags=("S1", "U1", "A1"),
    oracle="""
WITH d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
     e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
SELECT 'documents' AS tbl, n AS n_rows,
       n * (n - 1) // 2 AS sum_ordinals FROM d
UNION ALL
SELECT 'embeddings', n, n * (n - 1) // 2 FROM e
""",
)
def q_ordinal_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gauss checksum of the physical row ordinal: per table,
    Σ row_index must equal n(n−1)/2 — one aggregate that catches any
    gap, duplicate, or offset in ``_metadata.row_index`` (the
    checked S1 siblings profile, chunk, or parity-split the ordinal;
    none closes the loop with an arithmetic identity).  The oracle
    emits the closed form from COUNT(*) alone, so the hash gate
    fails iff the exposed ordinal column deviates from 0..n−1
    anywhere."""
    outs = []
    for tbl in ("documents", "embeddings"):
        t = _t(spark, sf_dir, tbl)
        outs.append(
            t.select(F.col("_metadata.row_index").alias("ri")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("ri").alias("sum_ordinals"),
            ).select(F.lit(tbl).alias("tbl"), "n_rows", "sum_ordinals")
        )
    return outs[0].unionByName(outs[1])


# ---------------------------------------------------------------------------
# T2 — content-keyed dedup (payload identity, not entity identity)
# ---------------------------------------------------------------------------


@register(
    "q_content_dedup_events",
    tags=("T2", "X1", "A1"),
    oracle=f"""
{EV_CTE}
, k AS (
  SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS vbucket,
         event_id
  FROM ev
)
SELECT event_type, vbucket,
       CAST(MIN(event_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_dupes
FROM k GROUP BY event_type, vbucket
HAVING COUNT(*) >= 2
""",
)
def q_content_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-keyed dedup: events collapse on what they SAY
    (event_type, value bucketed to 0.1) rather than who sent them —
    the payload-identity policy (checked T2 siblings all dedup on
    the entity key), keeping the min-event_id representative and
    reporting only keys that actually collided.  The bucket uses
    floor(value·10): floor is convention-identical across engines on
    the same doubles, where round() would split on half-to-even vs
    half-away (the documented pandas/DuckDB divergence)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.floor(F.col("value") * 10).cast("long").alias("vbucket"),
            "event_id",
        )
        .groupBy("event_type", "vbucket")
        .agg(
            F.min("event_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .filter(F.col("n_dupes") >= 2)
    )


# ---------------------------------------------------------------------------
# T4 — threshold-crossing detector (hysteresis-free state machine)
# ---------------------------------------------------------------------------


@register(
    "q_threshold_crossings",
    tags=("T4", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, o AS (
  SELECT user_id, event_id, value,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS pv
  FROM ev
), x AS (
  SELECT user_id, event_id FROM o
  WHERE pv IS NOT NULL AND pv <= 3.0 AND value > 3.0
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_crossings,
       CAST(MIN(event_id) AS BIGINT) AS first_crossing_id
FROM x GROUP BY user_id
""",
)
def q_threshold_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upward threshold-crossing detector: per user (total order by
    ts, event_id), count transitions from value ≤ 3.0 to value > 3.0
    and report the first crossing event — the alerting state machine
    whose streaming twin keeps one float + one flag per key.  The
    checked T4 siblings track runs, streaks, debounce and throttle;
    edge DETECTION (a predicate on the pair, not on the row) is the
    remaining one-lag shape.  Strict double comparisons are
    engine-safe on identical stored values."""
    e = _t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(order).alias("pv"),
    )
    x = o.filter(
        F.col("pv").isNotNull()
        & (F.col("pv") <= 3.0)
        & (F.col("value") > 3.0)
    )
    return x.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_crossings"),
        F.min("event_id").alias("first_crossing_id"),
    )


# ---------------------------------------------------------------------------
# T5 — DISTRIBUTE BY / SORT BY (the SQL facet of layout control)
# ---------------------------------------------------------------------------


@register(
    "q_distribute_by_sql",
    tags=("T5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev WHERE user_id % 2 = 0
GROUP BY event_type
""",
)
def q_distribute_by_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DISTRIBUTE BY … SORT BY`` — the SQL surface of explicit
    layout control (hash-spread rows across reducers, order within
    each) feeding an aggregation on a DIFFERENT key.  The checked T5
    siblings use DataFrame repartition/hints/salting; the SQL clause
    pair is what migrating Hive/Spark-SQL workloads actually write.
    Results must be layout-invariant — the oracle is the plain
    filtered GROUP BY."""
    e = _t(spark, sf_dir, "events")
    e.createOrReplaceTempView("__r18_events")
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
                    AS DOUBLE) / 1000000.0 AS sum_value
        FROM (
          SELECT event_type, value FROM __r18_events
          WHERE user_id % 2 = 0
          DISTRIBUTE BY event_type SORT BY value
        )
        GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# U2/U3 — set ops with NULL keys (distinct-mode NULL equality)
# ---------------------------------------------------------------------------


@register(
    "q_setops_nulls",
    tags=("U2", "U3", "A2", "P5"),
    oracle=f"""
{EV_CTE}
, a AS (
  SELECT DISTINCT user_id, NULLIF(event_type, 'error') AS et
  FROM ev WHERE ts < TIMESTAMP '2024-01-16'
), b AS (
  SELECT DISTINCT user_id, NULLIF(event_type, 'error') AS et
  FROM ev WHERE ts >= TIMESTAMP '2024-01-16'
)
SELECT 'both' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM
  (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT 'first_half_only', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT 'second_half_only', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT * FROM b EXCEPT SELECT * FROM a)
""",
)
def q_setops_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT with NULL inside the comparison tuple:
    (user, NULLIF(type,'error')) month halves — set operations use
    NULL-safe grouping equality (two NULLs match), the opposite of
    join-predicate NULL semantics, and both engines implement that
    contract identically.  The checked U2/U3 siblings run set ops on
    non-null tuples (modes, chains, multisets); the NULL-key row is
    the semantics corner that distinguishes set ops from an inner
    join on the same columns."""
    e = _t(spark, sf_dir, "events")
    mid = F.lit("2024-01-16").cast("timestamp")
    proj = [
        F.col("user_id"),
        F.when(F.col("event_type") != "error", F.col("event_type")).alias(
            "et"
        ),
    ]
    a = e.filter(F.col("ts") < mid).select(*proj).distinct()
    b = e.filter(F.col("ts") >= mid).select(*proj).distinct()

    def one(df, tag):
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(tag).alias("op"), "n"
        )

    return (
        one(a.intersect(b), "both")
        .unionByName(one(a.subtract(b), "first_half_only"))
        .unionByName(one(b.subtract(a), "second_half_only"))
    )


# ---------------------------------------------------------------------------
# X4 — base64 transport-encoding round trip
# ---------------------------------------------------------------------------


@register(
    "q_payload_base64_roundtrip",
    tags=("X4", "FN-string"),
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(to_base64(encode(text))) AS BIGINT) AS b64_len,
       substr(to_base64(encode(text)), 1, 16) AS b64_head,
       octet_length(from_base64(to_base64(encode(text))))
         = octet_length(encode(text)) AS roundtrip_ok
FROM documents WHERE doc_id < 400
""",
)
def q_payload_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 TRANSPORT encoding of binary payloads with a decode
    round-trip check — the JSON-embedding/API-transport stage of a
    multimodal pipeline (the checked X4 siblings pack, chunk, slice
    and classify raw bytes; none covers the text-safe encoding both
    directions).  Spark's base64 is MIME-chunked (CRLF every 76
    chars) where DuckDB's is unchunked — the canonicalization is part
    of the transport contract this query pins; the
    round-trip flag pins decode ∘ encode = identity on byte
    length."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    bin_ = F.encode(F.col("text"), "UTF-8")
    # Spark's base64 emits MIME-chunked output (CRLF every 76 chars);
    # strip to the canonical unchunked form DuckDB's to_base64 emits
    b64 = F.regexp_replace(F.base64(bin_), "[\r\n]", "")
    return d.select(
        "doc_id",
        F.length(bin_).cast("long").alias("n_bytes"),
        F.length(b64).cast("long").alias("b64_len"),
        F.substring(b64, 1, 16).alias("b64_head"),
        (F.length(F.unbase64(b64)) == F.length(bin_)).alias(
            "roundtrip_ok"
        ),
    )


# ---------------------------------------------------------------------------
# F1 — row UDF #5: TWO-column input (string pair → int)
# ---------------------------------------------------------------------------


@register(
    "q_udf_hamming_str",
    tags=("F1", "FN-string"),
    oracle="""
SELECT p_partkey,
       CAST(len(list_filter(
         range(1, least(len(p_name), len(p_type)) + 1),
         i -> substr(p_name, CAST(i AS INT), 1)
              <> substr(p_type, CAST(i AS INT), 1)))
         + abs(len(p_name) - len(p_type)) AS BIGINT) AS dist
FROM part WHERE p_partkey < 300
""",
)
def q_udf_hamming_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF #5: TWO string arguments → one int
    (generalized Hamming distance: positional mismatches over the
    common prefix plus the length difference).  Every checked F1
    sibling takes a single column; the two-argument signature is the
    remaining scalar-UDF calling convention.  Built-in twin: a
    per-position list_filter plus the length delta (the oracle)."""

    @F.udf("long")
    def ham(a: str, b: str) -> int:
        m = min(len(a), len(b))
        return sum(1 for i in range(m) if a[i] != b[i]) + abs(
            len(a) - len(b)
        )

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select("p_partkey", ham("p_name", "p_type").alias("dist"))


# ---------------------------------------------------------------------------
# F2 — pandas UDF #5: vectorized STRING production
# ---------------------------------------------------------------------------


@register(
    "q_pandas_udf_tag",
    tags=("F2", "FN-string"),
    oracle=f"""
{EV_CTE}
SELECT event_id,
       upper(substr(event_type, 1, 2)) || '-'
         || CAST(user_id % 10 AS VARCHAR) AS tag
FROM ev WHERE event_id < 2000
""",
)
def q_pandas_udf_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas (vectorized) UDF #5: two columns in, a STRING out —
    Arrow-batched string construction (the checked F2 siblings all
    return numbers; producing strings exercises the Arrow
    large-string path).  The kernel is pure pandas .str ops, so the
    batch is one vectorized pass, not a Python loop."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def tag(t: pd.Series, u: pd.Series) -> pd.Series:
        return t.str.slice(0, 2).str.upper() + "-" + (u % 10).astype(str)

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select("event_id", tag("event_type", "user_id").alias("tag"))


# ---------------------------------------------------------------------------
# F3 — grouped-agg UDAF #5: interpolated median
# ---------------------------------------------------------------------------


@register(
    "q_grouped_agg_median",
    tags=("F3", "A1", "FN-math"),
    oracle="""
SELECT l_returnflag,
       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS med_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def q_grouped_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF #5: np.median — the INTERPOLATED
    median (mean of the two central order statistics at even n),
    which is exactly DuckDB's quantile_cont(0.5), so the comparison
    pins the interpolation convention itself (percentile_approx
    checks the DISCRETE quantile; this is the continuous one).  The
    checked F3 siblings compute span, second-max, weighted mean and
    bitmask folds."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def med(v: pd.Series) -> float:
        import numpy as np

        return float(np.median(v.to_numpy()))

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        med("l_quantity").alias("med_qty")
    )


# ---------------------------------------------------------------------------
# F4 — applyInPandas #5: per-key rolling window (exact max)
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_pandas_rollmax",
    tags=("F4", "W3", "A1"),
    oracle=f"""
{EV_CTE}
SELECT event_id, user_id,
       MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS roll_max
FROM ev WHERE user_id < 50
""",
)
def q_apply_in_pandas_rollmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas #5: per-user pandas ``rolling(3).max()`` over
    the (ts, event_id) total order — the rolling-window kernel shape
    (the checked F4 siblings do gaps, normalization, run encoding,
    Holt-Winters and cogroup).  MAX is chosen deliberately: it is
    float-exact (no accumulation), so the pandas kernel and the SQL
    window frame agree bit-for-bit and the hash gate needs no
    tolerance."""
    import pandas as pd

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)

    def roll(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = pdf[["event_id", "user_id"]].copy()
        out["roll_max"] = (
            pdf["value"].rolling(3, min_periods=1).max().to_numpy()
        )
        return out

    return e.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(roll, "event_id long, user_id long, roll_max double")


# ---------------------------------------------------------------------------
# F5 — mapInPandas #5: column-pruned vectorized projection
# ---------------------------------------------------------------------------


@register(
    "q_map_in_pandas_project",
    tags=("F5", "P1", "A1"),
    oracle="""
SELECT CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(o_totalprice / 10000) AS BIGINT)) AS BIGINT)
         AS sum_band
FROM orders GROUP BY 1
""",
)
def q_map_in_pandas_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas #5: a COLUMN-PRUNED vectorized projection — the
    kernel declares it reads only (o_orderkey, o_totalprice), so
    Catalyst prunes the scan to two columns BEFORE the Python
    boundary (the checked F5 siblings consume whole rows; the
    pruning contract is what keeps Arrow transfer proportional to
    what the kernel uses).  Derives integer band features
    vectorized, then the JVM side aggregates — Python emits one row
    per input row, no Python-side state."""
    e = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")

    def project(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "key_mod": pdf["o_orderkey"] % 7,
                    "band": (pdf["o_totalprice"] // 10000).astype("int64"),
                }
            )

    rows = e.mapInPandas(project, "key_mod long, band long")
    return rows.groupBy("key_mod").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("band").alias("sum_band"),
    )


# ---------------------------------------------------------------------------
# F6 — UDTF #5: data-dependent row count including ZERO
# ---------------------------------------------------------------------------


@register(
    "q_udtf_pairs_skip",
    tags=("F6", "X5"),
    oracle="""
SELECT doc_id, CAST(i AS BIGINT) AS pos,
       t[i] || ' ' || t[i + 1] AS pair
FROM (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE doc_id < 150
)
, UNNEST(range(1, len(t))) r(i)
WHERE len(t) >= 5
""",
)
def q_udtf_pairs_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #5: DATA-DEPENDENT cardinality including zero —
    token pairs are emitted only for documents with ≥ 5 tokens;
    shorter documents contribute NO rows at all (the checked F6
    siblings always yield ≥ 1 row per input).  The zero-row branch
    is the filter-inside-UDTF contract (lateral join must not
    fabricate a null row)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, pair string")
    class PairsUDTF:
        def eval(self, text: str):
            toks = text.split(" ")
            if len(toks) < 5:
                return
            for i in range(len(toks) - 1):
                yield (i + 1, toks[i] + " " + toks[i + 1])

    spark.udtf.register("pairs_skip_udtf", PairsUDTF)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    d.createOrReplaceTempView("__udtf_docs_pairs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.pair "
        "FROM __udtf_docs_pairs, LATERAL pairs_skip_udtf(text) t"
    )
