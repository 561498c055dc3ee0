"""Round-17 rotation stock (authored in round 12): one fresh shape for
each family that would run dry after the r13 panel consumes its last
never-checked candidate — A3-A7, A9, FN-map, J2, J6, J8, J9, O3, P4,
S1, T2, T4, T5, U2/U3 and X4 (the `tools/rotation_report.py` family
census after the r12 swap showed exactly one candidate left in each).
Same program as plans/round10-16.py: every query is a different SHAPE
from its checked siblings (noted per docstring), integer-exact or
convention-pinned so the DuckDB twin hashes equal, and
partition-count-invariant by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.numeric import MONEY, VALUE, exact_sum, oracle_exact_sum
from ..sources.batch import load_table
from .events_queries import EV_CTE
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A3 — percentile_approx with a PERCENTAGE ARRAY (one sketch pass, nine
# readouts), exploded back to rows
# ---------------------------------------------------------------------------


@register(
    "q_approx_deciles_array",
    tags=("A3", "FN-array", "A1"),
    oracle="""
WITH g AS (
  SELECT l_linestatus,
         quantile_disc(l_quantity,
           [0.05,0.15,0.25,0.35,0.45,0.55,0.65,0.75,0.85,0.95]) AS qs
  FROM lineitem GROUP BY 1
)
SELECT l_linestatus, CAST(i AS INT) AS bucket,
       CAST(qs[CAST(i AS INT)] AS DOUBLE) AS q
FROM g, UNNEST(range(1, 11)) r(i)
""",
)
def q_approx_deciles_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` with an ARRAY of percentages — ONE
    Greenwald-Khanna sketch pass serving ten decile-MIDPOINT readouts
    (0.05, 0.15, …, 0.95), then posexplode back to (group, bucket,
    value) rows.  The checked A3 siblings sketch heavy hitters or
    call the scalar form three times (q_approx_quartiles); the array
    form is the one-pass API a 100 TB profiling job actually uses
    (the sketch is built once per group, not once per quantile).

    Midpoints, NOT the deciles themselves: l_quantity is uniform over
    ~50 integer values, so rank q·n at q = k/10 sits EXACTLY on a
    value-run boundary and the two engines' discrete-quantile rank
    conventions legally disagree by one order statistic (measured: 3
    boundary rows at sf0.1 before the shift).  At q = (2k+1)/20 the
    target rank is mid-run — margin ≈ n/100 ≫ ε·n = n/10000 — so the
    sketch's answer is the unique exact order statistic at every
    fixture tier (run-margin argument pinned in
    tests/test_batch_queries.py::
    test_approx_quartiles_exactness_precondition, which checks this
    percentage grid too)."""
    li = _t(spark, sf_dir, "lineitem")
    pct = [(2 * i + 1) / 20 for i in range(10)]
    g = li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_quantity", pct, 10000).alias("qs")
    )
    return g.select("l_linestatus", F.posexplode("qs")).select(
        "l_linestatus",
        (F.col("pos") + 1).cast("int").alias("bucket"),
        F.col("col").cast("double").alias("q"),
    )


# ---------------------------------------------------------------------------
# A4 — explicit GROUPING SETS with grouping() markers in the output
# ---------------------------------------------------------------------------


@register(
    "q_grouping_parts",
    tags=("A4", "A1"),
    oracle=f"""
SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_bucket,
       CAST(GROUPING(p_brand) AS INT) AS g_brand,
       CAST(GROUPING(p_size // 10) AS INT) AS g_size,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('p_retailprice', MONEY)} AS sum_retail
FROM part
GROUP BY GROUPING SETS ((p_brand), (p_size // 10), ())
""",
)
def q_grouping_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three EXPLICIT grouping sets — per-brand, per-size-bucket, and
    the grand total — with ``grouping()`` flags materialized as output
    columns so a reader can tell a real NULL key from a rolled-up one.
    The checked A4 siblings cube-then-filter or rollup a hierarchy;
    none emits the grouping indicator columns, which are the part of
    the API a BI layer keys on.  Exact-sum fixed point keeps the
    aggregate hash-identical at any partitioning."""
    p = _t(spark, sf_dir, "part").withColumn(
        "size_bucket", (F.col("p_size") / 10).cast("long")
    )
    return (
        p.groupingSets(
            [["p_brand"], ["size_bucket"], []], "p_brand", "size_bucket"
        ).agg(
            F.grouping("p_brand").cast("int").alias("g_brand"),
            F.grouping("size_bucket").cast("int").alias("g_size"),
            F.count(F.lit(1)).alias("n"),
            exact_sum("p_retailprice", MONEY).alias("sum_retail"),
        )
    )


# ---------------------------------------------------------------------------
# A5 — tumbling 6-hour windows keyed by event type, value extremes
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_6h_types",
    tags=("A5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
         AS wstart,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM ev GROUP BY 1, 2
""",
)
def q_tumbling_6h_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows PER EVENT TYPE reporting value extremes
    — the checked A5 siblings tumble globally, daily per distinct-user,
    or weekly over orders; this is the keyed quarter-day roll with
    min/max (exact data values, no float summation to pin).  Oracle
    uses the same integer-µs bucket floor the loader's µs truncation
    guarantees."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n",
            "min_value",
            "max_value",
        )
    )


# ---------------------------------------------------------------------------
# A6 — sliding 12h/3h windows over a FILTERED event subset
# ---------------------------------------------------------------------------


@register(
    "q_sliding_12h_purchases",
    tags=("A6", "A2"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp(((epoch_us(ts) // 10800000000) - k.k)
                      * 10800000000) AS wstart,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM ev CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def q_sliding_12h_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(ts, '12 hours', '3 hours') over the PURCHASE stream only
    — sliding distinct-buyer counts, the half-day conversion roll.
    The checked A6 siblings slide over the full stream (hour-scale
    global, 28d/7d global, 2h distinct); this one composes the A6
    replicate with a pre-filter (predicate BELOW the window, pushed to
    the scan) and a per-window COUNT DISTINCT.  Width = 4× slide, so
    the oracle replicates each purchase into exactly 4 buckets with
    integer-µs arithmetic."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "12 hours", "3 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("wstart"), "n", "n_users")
    )


# ---------------------------------------------------------------------------
# A7 — KEYLESS session windows over the whole event stream
# ---------------------------------------------------------------------------


@register(
    "q_global_sessions",
    tags=("A7", "A2"),
    oracle=f"""
{EV_CTE}
, o AS (
  SELECT ts, user_id,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (ORDER BY ts) > 60000000
                OR lag(ts) OVER (ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM ev
), s AS (
  SELECT ts, user_id,
         SUM(is_new) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY sid
""",
)
def q_global_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with NO partition key — activity bursts of the
    whole stream (gap 1 minute), each reporting its size and distinct
    users.  Every checked A7 sibling sessions per user; the keyless
    form is the outage/traffic-burst detector.  Tie-safe: equal-µs
    events have gap 0 and always co-session, so the oracle's
    lag-over-ts islands are order-independent under ties.

    Scale note: keyless session merge necessarily serializes into a
    single ordered pass (one partition) — correct but a deliberate
    DEMO of the API corner; at 100 TB you bucket by coarse time first
    or session per key (the checked siblings).  The fixture stream
    (≤ 100k events) is far inside the single-partition envelope."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("session_start"), "n", "n_users")
    )


# ---------------------------------------------------------------------------
# A9 — pivot with an EXPLICIT values list (no distinct-scan planning)
# ---------------------------------------------------------------------------


@register(
    "q_pivot_segment_explicit",
    tags=("A9", "A1"),
    oracle="""
SELECT c_nationkey,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                              THEN 1 END), 0) AS BIGINT) AS n_auto,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                              THEN 1 END), 0) AS BIGINT) AS n_building,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                              THEN 1 END), 0) AS BIGINT) AS n_machinery
FROM customer GROUP BY c_nationkey
""",
)
def q_pivot_segment_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with the values list given EXPLICITLY —
    ``pivot(col, [v1, v2, v3])`` skips the extra distinct-scan job the
    checked A9 siblings trigger (they let Spark discover the pivot
    domain), which is the form a production pipeline uses when the
    domain is known (no scan, stable output schema even when a value
    is absent at small SF).  Absent combinations surface as NULL
    counts; COALESCE to 0 pins the dense-grid contract."""
    c = _t(spark, sf_dir, "customer")
    piv = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", ["AUTOMOBILE", "BUILDING", "MACHINERY"])
        .count()
    )
    return piv.select(
        "c_nationkey",
        F.coalesce(F.col("AUTOMOBILE"), F.lit(0)).alias("n_auto"),
        F.coalesce(F.col("BUILDING"), F.lit(0)).alias("n_building"),
        F.coalesce(F.col("MACHINERY"), F.lit(0)).alias("n_machinery"),
    )


# ---------------------------------------------------------------------------
# FN-map — map_concat of disjoint per-user profile maps + fold
# ---------------------------------------------------------------------------


@register(
    "q_map_concat_profile",
    tags=("FN-map", "A1"),
    oracle=f"""
{EV_CTE}
SELECT user_id,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
            AS BIGINT) AS n_click,
       CAST(COUNT(*) AS BIGINT) AS total
FROM ev WHERE event_type <> 'signup' GROUP BY user_id
""",
)
def q_map_concat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two DISJOINT per-user maps (browse types → count, outcome types
    → count) merged with ``map_concat``, probed with ``element_at``
    and folded with ``aggregate`` over ``map_values`` — the
    profile-merge idiom (each upstream job owns one map; the join
    concatenates).  The checked FN-map siblings zip two aligned maps
    or build/inspect one; none exercises concat-of-disjoint + fold.
    Disjoint key ranges make map_concat well-defined (duplicate-key
    concat is engine-defined, so the shapes are kept disjoint by
    construction)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") != "signup")
    g = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    browse = (
        g.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "n"))
            ).alias("m_browse")
        )
    )
    outcome = (
        g.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "n"))
            ).alias("m_outcome")
        )
    )
    empty = F.expr("map()").cast("map<string,bigint>")
    merged = (
        browse.join(outcome, "user_id", "full_outer")
        .select(
            "user_id",
            F.map_concat(
                F.coalesce("m_browse", empty),
                F.coalesce("m_outcome", empty),
            ).alias("m"),
        )
    )
    return merged.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("n_click"),
        F.aggregate(
            F.map_values("m"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total"),
    )


# ---------------------------------------------------------------------------
# J2 — symmetric ±5-minute interval join (click ↔ error diagnostics)
# ---------------------------------------------------------------------------


@register(
    "q_click_error_window",
    tags=("J2", "J7"),
    oracle=f"""
{EV_CTE}
SELECT c.user_id, c.event_id AS click_id, x.event_id AS error_id,
       CAST(epoch_us(x.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM ev WHERE event_type = 'click') c
JOIN (SELECT * FROM ev WHERE event_type = 'error') x
  ON c.user_id = x.user_id
 AND x.ts >= c.ts - INTERVAL 5 MINUTE
 AND x.ts <= c.ts + INTERVAL 5 MINUTE
""",
)
def q_click_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYMMETRIC interval join: every (click, error) pair of the same
    user within ±5 minutes, with the SIGNED gap — the diagnostics
    shape ("which clicks bracket an error").  The checked J2 siblings
    are one-directional (purchase after view/click); the two-sided
    band is the streaming twin whose state must hold BOTH sides for
    the full tolerance.  Emits raw pair rows (no aggregation) so the
    hash pins the exact pair set; per-user pair count is
    clicks×errors inside the band — burst-bounded, mirrored exactly
    by the oracle."""
    e = _t(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_us"),
    )
    x = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("x_user"),
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("x_us"),
    )
    j = c.join(
        x,
        (F.col("user_id") == F.col("x_user"))
        & (F.col("x_us") >= F.col("c_us") - 300_000_000)
        & (F.col("x_us") <= F.col("c_us") + 300_000_000),
    )
    return j.select(
        "user_id",
        "click_id",
        "error_id",
        (F.col("x_us") - F.col("c_us")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# J6 — band self-join on order dates (repeat-purchase window)
# ---------------------------------------------------------------------------


@register(
    "q_reorder_within_30d",
    tags=("J6", "J4"),
    oracle="""
SELECT a.o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_reorder_pairs,
       CAST(MIN(date_diff('day', a.o_orderdate, b.o_orderdate))
            AS BIGINT) AS min_gap_days,
       CAST(MAX(date_diff('day', a.o_orderdate, b.o_orderdate))
            AS BIGINT) AS max_gap_days
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate > a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
GROUP BY a.o_custkey
""",
)
def q_reorder_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band SELF-join: pairs of orders by the same customer where the
    second lands within (0, 30] days of the first — the
    repeat-purchase window.  The checked J6 siblings band on balances
    across two different tables; the self-band on a DATE key is the
    temporal flavor (and the shape AQE turns into a range-partitioned
    join).  Work is Σ per-customer orders² — bounded by the fixture's
    ≤ ~30 orders per customer, and at 100 TB the equi-key (custkey)
    still shards it; only the in-key band is quadratic.  Gap measured
    in whole days (both engines: date subtraction on midnight-aligned
    timestamps)."""
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        "o_custkey", F.col("o_orderdate").alias("d1")
    )
    b = o.select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderdate").alias("d2")
    )
    j = a.join(
        b,
        (F.col("o_custkey") == F.col("ck2"))
        & (F.col("d2") > F.col("d1"))
        & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 30 DAYS")),
    )
    gap = F.datediff(F.col("d2"), F.col("d1"))
    return j.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_reorder_pairs"),
        F.min(gap).cast("long").alias("min_gap_days"),
        F.max(gap).cast("long").alias("max_gap_days"),
    )


# ---------------------------------------------------------------------------
# J8 — NEAREST-in-time as-of (both directions, tie → earlier)
# ---------------------------------------------------------------------------

_ASOF_NEAREST_ORACLE = f"""
{EV_CTE}
, u AS (
  SELECT user_id, ts, epoch_us(ts) AS t_us,
         CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
         CASE WHEN event_type = 'error' THEN event_id END AS e_id,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind
  FROM ev WHERE event_type IN ('purchase', 'error')
), w AS (
  SELECT user_id, t_us, e_id,
         last_value(p_id IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t_us, kind
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
         last_value(CASE WHEN p_id IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_us, kind
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_t,
         first_value(p_id IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t_us, kind
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id,
         first_value(CASE WHEN p_id IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_us, kind
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_t
  FROM u
)
SELECT user_id, CAST(e_id AS BIGINT) AS error_id,
       CAST(CASE
         WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
         WHEN next_id IS NULL THEN prev_id
         WHEN prev_id IS NULL THEN next_id
         WHEN t_us - prev_t <= next_t - t_us THEN prev_id
         ELSE next_id END AS BIGINT) AS match_id,
       CAST(CASE
         WHEN prev_id IS NULL AND next_id IS NULL THEN NULL
         WHEN next_id IS NULL THEN t_us - prev_t
         WHEN prev_id IS NULL THEN next_t - t_us
         WHEN t_us - prev_t <= next_t - t_us THEN t_us - prev_t
         ELSE next_t - t_us END AS BIGINT) AS gap_us
FROM w WHERE e_id IS NOT NULL
"""


@register("q_asof_nearest", tags=("J8", "W2"), oracle=_ASOF_NEAREST_ORACLE)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time as-of join: each error matched to the user's
    temporally closest purchase in EITHER direction (tie → the
    earlier one), unmatched errors kept with NULLs.  The checked J8
    siblings are single-direction (backward, forward, tolerance-
    bounded); nearest-absolute is the fourth semantics and the one
    pandas calls ``direction='nearest'``.  Implemented as the tagged
    union + two running extreme windows (prev / next purchase per
    row) — ONE shuffle on the user key, no join; purchases sort
    before errors at equal µs (kind tiebreak) so a same-instant
    purchase is the gap-0 backward match in both engines."""
    e = _t(spark, sf_dir, "events")
    u = (
        e.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            F.when(
                F.col("event_type") == "purchase", F.col("event_id")
            ).alias("p_id"),
            F.when(
                F.col("event_type") == "error", F.col("event_id")
            ).alias("e_id"),
            F.when(F.col("event_type") == "purchase", F.lit(0))
            .otherwise(F.lit(1))
            .alias("kind"),
        )
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_t = F.when(F.col("p_id").isNotNull(), F.col("t_us"))
    w = u.select(
        "user_id",
        "t_us",
        "e_id",
        F.last("p_id", ignorenulls=True).over(back).alias("prev_id"),
        F.last(p_t, ignorenulls=True).over(back).alias("prev_t"),
        F.first("p_id", ignorenulls=True).over(fwd).alias("next_id"),
        F.first(p_t, ignorenulls=True).over(fwd).alias("next_t"),
    ).filter(F.col("e_id").isNotNull())
    prev_gap = F.col("t_us") - F.col("prev_t")
    next_gap = F.col("next_t") - F.col("t_us")
    take_prev = F.col("next_id").isNull() | (
        F.col("prev_id").isNotNull() & (prev_gap <= next_gap)
    )
    return w.select(
        "user_id",
        F.col("e_id").alias("error_id"),
        F.when(take_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("match_id"),
        F.when(take_prev & F.col("prev_id").isNotNull(), prev_gap)
        .when(~take_prev, next_gap)
        .cast("long")
        .alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# J9 — semi ∧ anti over the EVENT stream, enriched against a dimension
# ---------------------------------------------------------------------------


@register(
    "q_active_no_purchase",
    tags=("J9", "J1", "A1"),
    oracle=f"""
{EV_CTE}
, d AS (
  SELECT user_id, event_type FROM ev
  WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
), u AS (
  SELECT DISTINCT user_id FROM d WHERE event_type = 'click'
    AND user_id NOT IN (SELECT user_id FROM d
                        WHERE event_type = 'purchase')
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       {oracle_exact_sum('c_acctbal', MONEY)} AS sum_acctbal
FROM customer JOIN u ON c_custkey = user_id
GROUP BY c_mktsegment
""",
)
def q_active_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engaged-but-not-converted ON A GIVEN DAY: users who clicked on
    2024-01-02 but purchased nothing that day (semi ∧ anti composed
    over the SAME stream, time-scoped), enriched against the customer
    dimension and profiled per segment — the daily churn-risk cohort
    a re-engagement job emails.  The checked J9 siblings anti-join
    across two different relations (customers↔orders,
    parts↔lineitem); composing both join flavors over one scoped
    stream is the new shape.  Day-scoping keeps the cohort non-empty
    at EVERY fixture tier (lifetime converts everyone as the stream
    grows: 3 / 35 / 343 cohort users at sf0.001/0.01/0.1).  The anti
    side has no NULL keys (event user_id is non-null), so NOT IN is
    safe in the oracle."""
    e = _t(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-02").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    )
    clickers = (
        e.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    cohort = clickers.join(buyers, "user_id", "left_anti")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(cohort, c["c_custkey"] == cohort["user_id"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            exact_sum("c_acctbal", MONEY).alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# O3 — range layout on a DERIVED temporal bucket
# ---------------------------------------------------------------------------


@register(
    "q_month_bucket_layout",
    tags=("O3", "P2", "FN-datetime"),
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       o_totalprice
FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
""",
)
def q_month_bucket_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartitionByRange + sortWithinPartitions keyed on a DERIVED
    month bucket (date_trunc), price-descending within each month —
    the time-partitioned data-lake layout (newest-expensive-first
    readers early-exit).  The checked O3 siblings range on stored
    columns; ranging on a computed temporal key is what a real lake
    writer does.  Content is pinned by the order-insensitive oracle
    hash: layout ops must never change the row set."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    m = o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month"),
        "o_totalprice",
    )
    return m.repartitionByRange(5, "month").sortWithinPartitions(
        "month", F.col("o_totalprice").desc()
    )


# ---------------------------------------------------------------------------
# P4 — boolean cast battery (bool ↔ int ↔ string round trips)
# ---------------------------------------------------------------------------


@register(
    "q_bool_casts",
    tags=("P4", "P5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT event_type,
       CAST(SUM(CAST(value > 2.0 AS INT)) AS BIGINT) AS n_big,
       CAST(count_if(CAST(event_id % 3 AS BOOLEAN)) AS BIGINT)
         AS n_mod_true,
       bool_and(CAST(CAST(value > 2.0 AS VARCHAR) AS BOOLEAN)
                = (value > 2.0)) AS roundtrip_ok
FROM ev GROUP BY event_type
""",
)
def q_bool_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean cast battery: bool→int (summed as an indicator),
    int→bool (nonzero ⇒ true, the C convention both engines share),
    and the bool→string→bool round trip asserted with bool_and — the
    P4 corner the numeric/temporal/width cast batteries don't touch.
    'true'/'false' literals come from the engines' own bool→string
    rendering (identical lowercase in Spark and DuckDB), never typed
    by hand."""
    e = _t(spark, sf_dir, "events")
    big = F.col("value") > 2.0
    return e.groupBy("event_type").agg(
        F.sum(big.cast("int")).cast("long").alias("n_big"),
        F.count_if((F.col("event_id") % 3).cast("boolean"))
        .cast("long")
        .alias("n_mod_true"),
        F.bool_and(
            big.cast("string").cast("boolean") == big
        ).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# S1 — physical-ordinal A/B split across TWO tables
# ---------------------------------------------------------------------------


@register(
    "q_row_parity_split",
    tags=("S1", "U1", "A1"),
    oracle="""
WITH d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
     e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
SELECT 'documents' AS tbl, CAST(0 AS BIGINT) AS parity,
       (n + 1) // 2 AS n_rows, CAST(0 AS BIGINT) AS first_idx,
       ((n - 1) // 2) * 2 AS last_idx FROM d
UNION ALL
SELECT 'documents', 1, n // 2, 1, ((n - 2) // 2) * 2 + 1 FROM d
UNION ALL
SELECT 'embeddings', 0, (n + 1) // 2, 0, ((n - 1) // 2) * 2 FROM e
UNION ALL
SELECT 'embeddings', 1, n // 2, 1, ((n - 2) // 2) * 2 + 1 FROM e
""",
)
def q_row_parity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B split by PHYSICAL row ordinal
    (``_metadata.row_index`` parity) across two corpus tables unioned
    — the byte-free holdout assignment (no hash, no shuffle, stable
    under re-reads).  The checked S1 siblings profile or chunk one
    file's ordinals; this one derives a SPLIT KEY from the ordinal
    and unions two sources.  One file per fixture table keeps
    ordinals 0..n-1, so every reported bound is a closed form of
    COUNT(*) — the oracle generates all four (table, parity) rows
    arithmetically, and any gap or duplicate in the exposed ordinal
    breaks a bound."""
    outs = []
    for tbl in ("documents", "embeddings"):
        t = _t(spark, sf_dir, tbl)
        outs.append(
            t.select(F.col("_metadata.row_index").alias("ri")).select(
                F.lit(tbl).alias("tbl"), "ri"
            )
        )
    u = outs[0].unionByName(outs[1])
    return (
        u.groupBy("tbl", F.pmod("ri", F.lit(2)).cast("long").alias("parity"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ri").alias("first_idx"),
            F.max("ri").alias("last_idx"),
        )
    )


# ---------------------------------------------------------------------------
# T2 — composite-key dedup scoped to a time bucket (first per user-day)
# ---------------------------------------------------------------------------


@register(
    "q_first_event_daily",
    tags=("T2", "A1", "FN-datetime"),
    oracle=f"""
{EV_CTE}
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(arg_min(event_id,
              (epoch_us(ts) - epoch_us(date_trunc('day', ts))) * 10000000
              + event_id) AS BIGINT) AS first_event_id,
       arg_min(event_type,
              (epoch_us(ts) - epoch_us(date_trunc('day', ts))) * 10000000
              + event_id) AS first_type
FROM ev GROUP BY user_id, 2
""",
)
def q_first_event_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup on a COMPOSITE (user, day) key keeping the earliest
    event — the daily-first-touch attribution row.  The checked T2
    siblings dedup on the plain user key (first-seen / last-in-time /
    best-by-value); time-scoping the key is the retention-pipeline
    variant.  The min_by ordering key packs (µs-within-day ⊕
    event_id) into one bigint: within-day offsets < 8.64e10 ×
    1e7 ≈ 8.6e17 stays under 2^63 while event_id < 1e7 — the
    documented envelope (fixture ids ≤ ~1e5 even at sf0.1), making
    the representative deterministic under equal timestamps in both
    engines."""
    e = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    key = (
        F.unix_micros(F.col("ts")) - F.unix_micros(day)
    ) * F.lit(10_000_000) + F.col("event_id")
    return e.groupBy("user_id", day.alias("day")).agg(
        F.min_by("event_id", key).alias("first_event_id"),
        F.min_by("event_type", key).alias("first_type"),
    )


# ---------------------------------------------------------------------------
# T4 — rising-run detector (monotone-chain state machine, batch twin)
# ---------------------------------------------------------------------------


@register(
    "q_rising_runs",
    tags=("T4", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN value > lag(value) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)
              THEN 0 ELSE 1 END AS brk
  FROM ev
), s AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o
), r AS (
  SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS len
  FROM s GROUP BY user_id, run_id
)
SELECT user_id, MAX(len) AS longest_rise,
       CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long_runs,
       CAST(SUM(len) AS BIGINT) AS n_events
FROM r GROUP BY user_id
""",
)
def q_rising_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-chain detector: per user (ordered by ts, event_id — a
    total order), maximal runs where each value strictly exceeds the
    previous; report the longest run, the count of runs ≥ 3, and the
    event total as a checksum.  The T4 state is one float (last
    value) + one counter — the streaming-twin shape of
    applyInPandasWithState trend tracking; the checked T4 siblings
    encode run-LENGTH (equal values), streaks, debounce and throttle,
    none a cross-row ORDER comparison.  Strict float comparison is
    engine-safe: both engines compare the same stored doubles."""
    e = _t(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.col("value") > F.lag("value").over(order), F.lit(0)
    ).otherwise(F.lit(1))
    s = e.select("user_id", "value", brk.alias("brk"), "ts", "event_id")
    runs = s.withColumn("run_id", F.sum("brk").over(order))
    r = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("len")
    )
    return r.groupBy("user_id").agg(
        F.max("len").alias("longest_rise"),
        F.sum(F.when(F.col("len") >= 3, 1).otherwise(0))
        .cast("long")
        .alias("n_long_runs"),
        F.sum("len").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# T5 — salted EXACT-DISTINCT (the skew case partial agg can't absorb)
# ---------------------------------------------------------------------------


@register(
    "q_salted_distinct",
    tags=("T5", "A2", "A1"),
    oracle=f"""
{EV_CTE}
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ev GROUP BY event_type
""",
)
def q_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted EXACT count-distinct: shard each hot key's distinct set
    by salt = user_id % 8 — the DISTINCT column drives the salt, so
    every user lands in exactly one shard and the per-shard distinct
    counts ADD — then merge.  This is precisely the skew case
    q_salted_agg's docstring defers (count/sum skew dies at map-side
    partial agg; an exact distinct per hot key does NOT — its state
    is the value set itself), and the checked T5 siblings salt a
    join, a plain agg, or hint the planner.  With 5 event types at
    100 TB, the direct form funnels each type's full user set through
    one reducer; the salted form caps any reducer at 1/8 of it.  The
    oracle is the direct single-phase distinct — same answer by the
    disjoint-shard argument."""
    e = _t(spark, sf_dir, "events")
    p1 = (
        e.select(
            "event_type",
            F.pmod("user_id", F.lit(8)).alias("salt"),
            "user_id",
        )
        .groupBy("event_type", "salt")
        .agg(
            F.countDistinct("user_id").alias("pd"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    return p1.groupBy("event_type").agg(
        F.sum("pd").alias("n_users"), F.sum("pn").alias("n")
    )


# ---------------------------------------------------------------------------
# U2/U3 — multiset set-ops between two DERIVED relations
# ---------------------------------------------------------------------------


@register(
    "q_setops_daily_actives",
    tags=("U2", "U3", "A2"),
    oracle=f"""
{EV_CTE}
, c AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM ev WHERE event_type = 'click'),
  p AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM ev WHERE event_type = 'purchase')
SELECT 'click_and_buy' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM
  (SELECT * FROM c INTERSECT ALL SELECT * FROM p)
UNION ALL
SELECT 'click_only', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT * FROM c EXCEPT ALL SELECT * FROM p)
UNION ALL
SELECT 'buy_only', CAST(COUNT(*) AS BIGINT) FROM
  (SELECT * FROM p EXCEPT ALL SELECT * FROM c)
""",
)
def q_setops_daily_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL between two DERIVED multisets —
    (user, day) click activity vs purchase activity, where the
    multiplicity IS the signal (a user clicking 3× and buying 1× on a
    day contributes min(3,1)=1 to the intersection and 2 to
    click-only).  The checked U2/U3 siblings run set ops over slices
    of ONE base relation; deriving both sides through different
    filters + a composite projection is the funnel-overlap shape.
    Output is the three multiset cardinalities as labeled rows (no
    cross join of scalar frames — union keeps the plan
    exchange-only)."""
    e = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    c = e.filter(F.col("event_type") == "click").select("user_id", day)
    p = e.filter(F.col("event_type") == "purchase").select("user_id", day)
    both = (
        c.intersectAll(p)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("click_and_buy").alias("op"), "n")
    )
    click_only = (
        c.exceptAll(p)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("click_only").alias("op"), "n")
    )
    buy_only = (
        p.exceptAll(c)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("buy_only").alias("op"), "n")
    )
    return both.unionByName(click_only).unionByName(buy_only)


# ---------------------------------------------------------------------------
# X4 — structured record → packed binary encode (+ digest)
# ---------------------------------------------------------------------------


@register(
    "q_record_pack",
    tags=("X4", "FN-string"),
    oracle="""
WITH r AS (
  SELECT o_orderkey,
         upper(lpad(hex(o_orderkey), 16, '0'))
         || upper(lpad(hex(CAST(ROUND(o_totalprice * 100) AS BIGINT)),
                       16, '0')) AS rec_hex
  FROM orders WHERE o_orderkey < 2000
)
SELECT o_orderkey, rec_hex,
       CAST(octet_length(unhex(rec_hex)) AS BIGINT) AS n_bytes,
       md5(rec_hex) AS digest
FROM r
""",
)
def q_record_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured record → PACKED BINARY encode: two bigint fields
    (order key, price in cents) big-endian hex-packed into a 16-byte
    record, materialized through unhex to real binary (length
    checked), digested for content addressing.  The checked X4
    siblings slice, chunk, or classify EXISTING payloads; this one
    CONSTRUCTS binary from typed columns — the serialization half of
    the multimodal story (how a feature record becomes bytes).  Hex
    casing normalized with upper() on both engines; md5 runs over the
    hex text so the digest needs no blob-digest support in the
    oracle."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rec_hex = F.concat(
        F.upper(F.lpad(F.hex(F.col("o_orderkey")), 16, "0")),
        F.upper(F.lpad(F.hex(cents), 16, "0")),
    )
    r = o.select("o_orderkey", rec_hex.alias("rec_hex"))
    return r.select(
        "o_orderkey",
        "rec_hex",
        F.length(F.unhex("rec_hex")).cast("long").alias("n_bytes"),
        F.md5("rec_hex").alias("digest"),
    )
