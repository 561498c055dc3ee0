"""Round-11 rotation stock: fresh oracle-checked queries in the §2
families whose members will ALL carry driver CORRECTNESS rows after
the r10 panel lands (A4 A5 A6 A7 A9 P4 J1 J2 J6 J7 J8 J11 O3 S1 T2
T4 T5 U1 U2 U3 — the F-series second members live in
plans/udf_queries.py, the only module sanctioned for row UDFs).
Same program as plans/round10.py one round later: the driver
hash-checks 50 names per round, and a family with no never-checked
member forces its panel slot into a permanent keeper — a genuinely
new surface per family keeps the ~27-first-evers-per-round rotation
cadence alive.  Every query here is a different shape from its
checked siblings (noted per docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
# U1/U2/U3 — the set-operator trio over year cohorts
# ---------------------------------------------------------------------------


@register(
    "q_setops_years",
    tags=("U1", "U2", "U3", "A2"),
    oracle="""
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996)
SELECT 'both' AS cohort, o_custkey
FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1995', o_custkey
FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1996', o_custkey
FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
""",
)
def q_setops_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention trichotomy via the set-operator trio in ONE query:
    customers ordering in both 1995 and 1996 (INTERSECT), churned
    (EXCEPT one way), new (EXCEPT the other), tagged and UNION ALLed.
    The checked U-family siblings each exercise one operator in
    isolation; this is the composed cohort shape.  Distinct inputs
    make INTERSECT/EXCEPT's set semantics exact on both engines."""
    o = _t(spark, sf_dir, "orders")
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
    tag = lambda df, t: df.select(  # noqa: E731
        F.lit(t).alias("cohort"), "o_custkey"
    )
    return (
        tag(y95.intersect(y96), "both")
        .unionAll(tag(y95.exceptAll(y96), "only_1995"))
        .unionAll(tag(y96.exceptAll(y95), "only_1996"))
    )


# ---------------------------------------------------------------------------
# A4 — explicit GROUPING SETS (not ROLLUP/CUBE shorthand)
# ---------------------------------------------------------------------------


@register(
    "q_grouping_sets_returns",
    tags=("A4", "A1"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus)
            AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('l_quantity', MONEY)} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def q_grouping_sets_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT grouping sets — the irregular lattice ((a,b),(a),())
    that neither ROLLUP nor CUBE shorthand produces (it skips the
    (b)-only set CUBE would add; the checked A4 siblings are all
    ROLLUP/CUBE).  Spark's DataFrame API has no groupingSets entry
    point, so this goes through the SQL front door; grouping_id()
    is the same 2-column bitmask the oracle rebuilds."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id() AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_qty
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# A5 — daily tumbling window with an exact distinct
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_daily",
    tags=("A5", "A2"),
    oracle=f"""
{EV_CTE}
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev
GROUP BY 1
""",
)
def q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-DAY tumbling windows carrying an exact COUNT(DISTINCT) —
    a coarser grain than the checked hourly siblings and the only
    tumbling query that fuses a distinct aggregate into the window
    (two-phase: partial distinct per partition, exact merge)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n", "n_users",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# A6 — 3 h / 90 min sliding window (global, sum + extrema)
# ---------------------------------------------------------------------------

_SLIDE11_US = 90 * 60 * 1_000_000  # 90 min in µs


@register(
    "q_sliding_global_3h",
    tags=("A6", "A1"),
    oracle=f"""
WITH ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_id, value
  FROM events
), starts AS (
  SELECT event_id, value,
         make_timestamp((epoch_us(ts) // {_SLIDE11_US}) * {_SLIDE11_US}) AS s1,
         make_timestamp((epoch_us(ts) // {_SLIDE11_US}) * {_SLIDE11_US}
                        - {_SLIDE11_US}) AS s2
  FROM ev
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value,
       CAST(MIN(event_id) AS BIGINT) AS first_event
FROM (
  SELECT unnest([s1, s2]) AS window_start,
         unnest([event_id, event_id]) AS event_id,
         unnest([value, value]) AS value
  FROM starts
)
GROUP BY window_start
""",
)
def q_sliding_global_3h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hour windows sliding every 90 minutes (window = 2x slide, so
    each event lands in exactly two windows, which the oracle expands
    explicitly) — a different overlap geometry and an exact sum +
    min-id payload where the checked A6 siblings count (1h/30m
    global) or key by type (2h/1h)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "3 hours", "90 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
            F.min("event_id").alias("first_event"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n", "sum_value",
            "first_event",
        )
    )


# ---------------------------------------------------------------------------
# A7 — session windows keyed by event TYPE, reporting both bounds
# ---------------------------------------------------------------------------


@register(
    "q_session_bounds",
    tags=("A7",),
    oracle="""
WITH ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type
  FROM events
), flagged AS (
  SELECT event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
),
sessions AS (
  SELECT event_type, ts,
         SUM(is_new) OVER (PARTITION BY event_type ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT event_type,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY event_type, sid
""",
)
def q_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows keyed by event TYPE (5 coarse keys — the skew
    extreme; the checked A7 siblings key by user) at a 30-minute gap,
    emitting BOTH window bounds.  Spark defines session end as
    last-event + gap, which the oracle reproduces with
    MAX(ts) + INTERVAL."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# A9/J3 — pivot on ORDER YEAR after a broadcast dimension join
# ---------------------------------------------------------------------------

_YEARS = list(range(1995, 2002))


@register(
    "q_pivot_year",
    tags=("A9", "J3"),
    oracle="""
SELECT c_mktsegment,
       """
    + ",\n       ".join(
        f"CAST(COUNT(*) FILTER (year(o_orderdate) = {y}) AS BIGINT) AS y{y}"
        for y in _YEARS
    )
    + """
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q_pivot_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on a DERIVED key (order year) after a broadcast customer
    join — the checked A9 siblings pivot raw columns of one table.
    Explicit year list keeps the schema static (no pivot-value scan
    job), and counts are integers so the hash gate is exact."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .withColumn("yr", F.year("o_orderdate"))
        .groupBy("c_mktsegment")
        .pivot("yr", _YEARS)
        .count()
        .select(
            "c_mktsegment",
            *[F.coalesce(F.col(str(y)), F.lit(0)).alias(f"y{y}") for y in _YEARS],
        )
    )


# ---------------------------------------------------------------------------
# P4 — numeric/temporal cast edges round 2
# ---------------------------------------------------------------------------


@register(
    "q_cast_numeric_edges",
    tags=("P4", "P1"),
    oracle="""
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS price_f32,
       CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_ms,
       CAST(o_orderkey AS DOUBLE) AS key_d,
       CAST(FLOOR(o_totalprice / 1000.0) AS INT) AS price_k,
       CAST(o_orderstatus = 'F' AS INT) AS is_final
FROM orders
""",
)
def q_cast_numeric_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast edges the checked P4 siblings don't touch: a float32
    ROUND-TRIP (double→real→double — both engines use IEEE-754
    nearest-even narrowing, so the precision loss is identical),
    timestamp→epoch-milliseconds, exact int64→double (keys < 2^53),
    a floor-then-cast int (floored FIRST — Spark truncates fractional
    casts where DuckDB rounds), and boolean→int."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("float").cast("double").alias("price_f32"),
        F.unix_millis("o_orderdate").alias("epoch_ms"),
        F.col("o_orderkey").cast("double").alias("key_d"),
        F.floor(F.col("o_totalprice") / 1000.0).cast("int").alias("price_k"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
    )


# ---------------------------------------------------------------------------
# J6 — supplier account-balance tier join (broadcast non-equi)
# ---------------------------------------------------------------------------

_TIERS = [
    ("debt", -1000.0, 0.0),
    ("low", 0.0, 2500.0),
    ("mid", 2500.0, 5000.0),
    ("high", 5000.0, 8000.0),
    ("top", 8000.0, 10000.0),
]


@register(
    "q_acctbal_tier_join",
    tags=("J6", "A1"),
    oracle=f"""
WITH tiers(tier, lo, hi) AS (
  VALUES {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)}
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       {oracle_exact_sum('s_acctbal', MONEY)} AS total_bal
FROM supplier JOIN tiers ON s_acctbal >= lo AND s_acctbal < hi
GROUP BY tier
""",
)
def q_acctbal_tier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier classification of SUPPLIER balances by range join against
    a 5-row broadcast dimension — same non-equi physical shape as the
    checked q_band_join but on a different fact table with a signed
    domain (the debt tier's lower bound is negative), plus an exact
    2-decimal sum per tier."""
    s = _t(spark, sf_dir, "supplier")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    return (
        s.join(
            F.broadcast(tiers),
            (F.col("s_acctbal") >= F.col("lo"))
            & (F.col("s_acctbal") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            exact_sum("s_acctbal", MONEY).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# J7/J4 — equi + range join: ship lag inside a 60-day service window
# ---------------------------------------------------------------------------


@register(
    "q_ship_service_window",
    tags=("J7", "J4"),
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {oracle_exact_sum('l_extendedprice', MONEY)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
)
def q_ship_service_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable range-join shape: an EQUI anchor (orderkey) plus
    an interval-containment residual (shipped within 60 days of
    order) — Catalyst plans the equi key as the shuffle hash and
    evaluates the range as a post-join filter, so this stays a hash
    join at any scale (the checked J7 siblings are pure-range or
    as-of shapes)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"])
        & (li["l_shipdate"] >= o["o_orderdate"])
        & (li["l_shipdate"] < o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
    )
    return j.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        exact_sum("l_extendedprice", MONEY).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# J8 — BACKWARD as-of join (latest click at-or-before each purchase)
# ---------------------------------------------------------------------------


@register(
    "q_asof_backward",
    tags=("J8", "W2"),
    oracle="""
WITH c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM p ASOF JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each purchase attributed to the user's most
    recent click at-or-before it (q_asof_forward covers the forward
    direction; this is the classic last-touch attribution / quote
    lookup).  Same union-sort-carry kernel, FOLLOWING frame swapped
    for a last-ignorenulls PRECEDING scan; DuckDB's native ASOF JOIN
    is the oracle."""
    from ..operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    j = asof_join(
        buys,
        clicks,
        left_on="p_user",
        right_on="c_user",
        left_ts="p_ts",
        right_ts="c_ts",
        how="inner",
        direction="backward",
    )
    return j.select(
        "purchase_id",
        "click_id",
        F.expr("unix_micros(p_ts) - unix_micros(c_ts)").alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# J11/J10 — dense scaffold grid (bounded cross join + outer fill)
# ---------------------------------------------------------------------------


@register(
    "q_nation_status_grid",
    tags=("J11", "J10", "J5"),
    oracle="""
WITH counts AS (
  SELECT c_nationkey AS nk, o_orderstatus AS st,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT n_name, g.st AS o_orderstatus, COALESCE(n, 0) AS n_orders
FROM nation
CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) g
LEFT JOIN counts ON nk = n_nationkey AND counts.st = g.st
""",
)
def q_nation_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense-report scaffold: nation x order-status grid (25 x 3 —
    both sides bounded dimensions) LEFT-joined to the fact counts so
    empty cells surface as explicit zeros.  The cross join is
    dimension x dimension only; the fact table is aggregated BEFORE
    touching the grid, which is what keeps this shape safe at 100 TB."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    counts = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    statuses = o.select(F.col("o_orderstatus").alias("grid_st")).distinct()
    grid = n.crossJoin(F.broadcast(statuses))
    return (
        grid.join(
            counts,
            (grid["n_nationkey"] == counts["nk"])
            & (grid["grid_st"] == counts["st"]),
            "left",
        )
        .select(
            "n_name",
            F.col("grid_st").alias("o_orderstatus"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# O3 — range-clustered write layout
# ---------------------------------------------------------------------------


@register(
    "q_clustered_layout",
    tags=("O3", "P2"),
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate
FROM lineitem WHERE l_quantity >= 48
""",
)
def q_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartitionByRange + sortWithinPartitions — the RANGE-clustered
    write layout (contiguous key ranges per output file, the layout
    range-partitioned readers and min/max-pruning scans want), where
    the checked O3 siblings hash-cluster.  Logical row set is
    unchanged, so the order-insensitive oracle hash checks it
    exactly."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    return (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate")
        .repartitionByRange(8, "l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_shipdate")
    )


# ---------------------------------------------------------------------------
# S1/P1 — _metadata.row_index (within-file ordinal provenance)
# ---------------------------------------------------------------------------


@register(
    "q_row_index",
    tags=("S1", "P1"),
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS min_idx,
       CAST(COUNT(*) - 1 AS BIGINT) AS max_idx,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS sum_idx
FROM documents
""",
)
def q_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_metadata.row_index` — the within-file row ordinal, the OTHER
    hidden-metadata provenance column (q_file_lineage covers
    file_name).  The fixture table is one file, so the ordinals are
    exactly 0..n-1; the oracle pins that closed form (count, min 0,
    max n-1, triangular-number sum), which any gap or duplicate in
    the exposed index would break."""
    d = _t(spark, sf_dir, "documents")
    idx = d.select(F.col("_metadata.row_index").alias("ri"))
    return idx.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ri").alias("min_idx"),
        F.max("ri").alias("max_idx"),
        F.sum("ri").alias("sum_idx"),
    )


# ---------------------------------------------------------------------------
# T2 — keep-LAST dedup (the other streaming-dedup policy)
# ---------------------------------------------------------------------------


@register(
    "q_latest_event",
    tags=("T2", "A2"),
    oracle=f"""
{EV_CTE}
SELECT user_id, event_type,
       CAST(arg_max(event_id, ts) AS BIGINT) AS last_event_id,
       MAX(ts) AS last_ts,
       CAST(COUNT(*) AS BIGINT) AS n_seen
FROM ev
GROUP BY user_id, event_type
""",
)
def q_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the LATEST record (max event-time) — the
    upsert/compaction policy, vs the checked q_dedup_events'
    keep-first.  max_by gives the deterministic representative
    (fixture (user_id, ts) pairs are unique); a streaming twin is
    dropDuplicates on the reversed-time key or a last() stateful
    agg."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.max_by("event_id", "ts").alias("last_event_id"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_seen"),
    )


# ---------------------------------------------------------------------------
# T4/W2 — longest same-type streak per user (gaps-and-islands)
# ---------------------------------------------------------------------------


@register(
    "q_user_streaks",
    tags=("T4", "W2"),
    oracle=f"""
{EV_CTE}
, runs AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts)
       - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts)
           AS grp
  FROM ev
),
streaks AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS streak
  FROM runs GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type, MAX(streak) AS max_streak
FROM streaks GROUP BY user_id, event_type
""",
)
def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive same-type run per user (gaps-and-islands
    via the two-row_number difference trick) — the batch twin of a
    run-length stateful operator (per-key state carries current-streak
    + best-streak; arbitrary-stateful T4 family).  One shuffle on
    user_id; both window passes share the partitioning."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts")
    runs = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias(
            "grp"
        ),
    )
    streaks = runs.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return streaks.groupBy("user_id", "event_type").agg(
        F.max("streak").alias("max_streak")
    )


# ---------------------------------------------------------------------------
# T5 — REPARTITION(n, col) hint (explicit shuffle steering via SQL)
# ---------------------------------------------------------------------------


@register(
    "q_repartition_hint",
    tags=("T5", "A1"),
    oracle=f"""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS revenue
FROM orders
GROUP BY o_orderstatus
""",
)
def q_repartition_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`/*+ REPARTITION(16, o_custkey) */` — the explicit-shuffle hint
    (fixed partition count + key, the pre-write bucketing steer),
    where the checked T5 sibling q_hints_battery uses AQE-driven
    REBALANCE.  Hints change the physical exchange only; the oracle
    checks result identity with the plain aggregate."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_rephint")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                    AS DOUBLE) / 100.0 AS revenue
        FROM (SELECT /*+ REPARTITION(16, o_custkey) */ *
              FROM __orders_rephint)
        GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# J1/J3/J5 — two-hop stream-static enrichment (events -> customer -> nation)
# ---------------------------------------------------------------------------


@register(
    "q_stream_static_nation",
    tags=("J1", "J3", "J5", "A1"),
    oracle=f"""
{EV_CTE}
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev
JOIN customer ON user_id = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q_stream_static_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-hop stream-static enrichment: events through customer to
    nation (the checked J1 sibling is one hop to the segment).  Both
    dimensions broadcast, so in the streaming variant each micro-batch
    is two map-side joins with zero state — the snowflake lookup
    chain."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        e.join(F.broadcast(c), e["user_id"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# J2/J7 — view -> click funnel join (15-minute bound)
# ---------------------------------------------------------------------------


@register(
    "q_stream_stream_views",
    tags=("J2", "J7"),
    oracle=f"""
{EV_CTE}
SELECT date_trunc('hour', v.ts) AS view_hour,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_users
FROM ev v JOIN ev c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 15 MINUTE
GROUP BY 1
""",
)
def q_stream_stream_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upper-funnel stream-stream join: views to clicks by the
    same user within 15 minutes (the checked J2 sibling joins clicks
    to purchases at 30) — tighter bound means proportionally less
    join state under the streaming watermark, plus a distinct-user
    payload."""
    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 15 MINUTES")),
    )
    return joined.groupBy(
        F.date_trunc("hour", F.col("v_ts")).alias("view_hour")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("v_user").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# FN-map — map_from_arrays / map_contains_key / map_entries explode
# ---------------------------------------------------------------------------


@register(
    "q_map_entries_explode",
    tags=("FN-map", "FN-array"),
    oracle="""
SELECT doc_id, 'len' AS k, CAST(n_chars AS BIGINT) AS v,
       CAST(n_chars > 100 AS INT) AS has_long
FROM documents WHERE doc_id < 250
UNION ALL
SELECT doc_id, 'words', CAST(len(string_split(text, ' ')) AS BIGINT),
       CAST(n_chars > 100 AS INT)
FROM documents WHERE doc_id < 250
""",
)
def q_map_entries_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining FN-map constructors/inspectors: map_from_arrays
    (parallel key/value arrays -> map), map_contains_key (membership
    probe), and map_entries + explode (map -> rows, the inverse of
    map_from_entries).  The map round-trips through entry explosion,
    which the oracle rebuilds as a 2-way UNION."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    m = F.map_from_arrays(
        F.array(F.lit("len"), F.lit("words")),
        F.array(
            F.col("n_chars").cast("long"),
            F.size(F.split("text", " ")).cast("long"),
        ),
    )
    probe = F.map_contains_key(
        F.map_filter(m, lambda k, v: v > 100), F.lit("len")
    ).cast("int")
    entries = d.select(
        "doc_id",
        F.explode(F.map_entries(m)).alias("e"),
        probe.alias("has_long"),
    )
    return entries.select(
        "doc_id",
        F.col("e.key").alias("k"),
        F.col("e.value").alias("v"),
        "has_long",
    )
