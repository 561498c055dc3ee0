"""Round-5 second wave: marketing/feature-pipeline analytics that a
reference-engine user runs daily — multi-touch attribution, Welch A/B
test, item-item collaborative filtering, robust (MAD) outlier stats,
time-weighted averages, OHLC bars — plus the k-core graph operator
(rows-only; peel fixpoint is property-tested against a Python model in
tests/test_properties.py).

Determinism doctrine (unchanged): integer micro/milli-unit arithmetic
across every shuffle boundary, explicit tie-breaks on every argmax /
top-k, identical aliases both sides, and doubles only materialized in
the final projection from exact integer moments with the expression
written term-for-term identically in Spark and DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.ranking import global_ntile
from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_EV = """
WITH ev AS (
  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
         user_id, event_type, value, props
  FROM events
)
"""


# ---------------------------------------------------------------------------
# Multi-touch attribution: credit clicks preceding each purchase.
# ---------------------------------------------------------------------------


@register(
    "q_attribution",
    tags=("J7", "A1", "W1"),
    oracle=f"""
{_EV}
, p AS (
  SELECT event_id AS purchase_id, user_id, ts,
         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
  FROM ev WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, ts FROM ev
  WHERE event_type = 'click'
),
cand AS (
  SELECT p.purchase_id, p.user_id, p.v, c.click_id, c.ts AS cts
  FROM p JOIN c ON p.user_id = c.user_id
    AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 7 DAY
),
agg AS (
  SELECT purchase_id,
         CAST(COUNT(*) AS BIGINT) AS n_touches,
         MAX({{'cts': cts, 'click_id': click_id}}) AS last_touch
  FROM cand GROUP BY purchase_id
)
SELECT p.purchase_id, p.user_id,
       COALESCE(a.n_touches, 0) AS n_touches,
       a.last_touch.click_id AS last_click_id,
       CASE WHEN a.n_touches > 0
            THEN 1000000 // a.n_touches ELSE NULL END AS linear_credit_ppm,
       CASE WHEN a.n_touches > 0
            THEN p.v // a.n_touches ELSE NULL END AS credit_per_touch_e6
FROM p LEFT JOIN agg a ON p.purchase_id = a.purchase_id
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: for every purchase, collect the user's
    clicks in the preceding 7 days and emit the touch count, the
    last-touch click (tie on equal timestamps broken by click id — an
    argmax over a (ts, id) struct, totally ordered), and the linear
    credit each touch receives (ppm of one conversion and the
    purchase's micro-unit value split by floor division).

    Scale rationale: the candidate generation is an equi-join on
    user_id with a time-range residual — the shuffle moves each side
    once on the entity key and the range predicate filters within the
    matched key group, never a cross join.  At 100 TB you additionally
    bucket both sides by (user_id, day) so a click only meets the ≤7
    daily purchase buckets ahead of it (the banded range-join trick
    used by q_range_join); the aggregation is a purchase-key groupBy
    with a struct-max — partial-aggregable, skew-safe under AQE.
    Credits are integer ppm/micro floor-divisions — engine-exact.
    """
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.round(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("v"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    cand = p.join(
        c,
        (p["user_id"] == c["c_user"])
        & (c["cts"] <= p["ts"])
        & (c["cts"] > p["ts"] - F.expr("INTERVAL 7 DAY")),
    )
    agg = cand.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.max(F.struct("cts", "click_id")).alias("last_touch"),
    )
    return p.join(agg, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.coalesce(agg["n_touches"], F.lit(0)).cast("long").alias("n_touches"),
        F.col("last_touch.click_id").alias("last_click_id"),
        F.when(
            agg["n_touches"] > 0, F.expr("1000000 div n_touches")
        ).alias("linear_credit_ppm"),
        F.when(agg["n_touches"] > 0, F.expr("v div n_touches")).alias(
            "credit_per_touch_e6"
        ),
    )


# ---------------------------------------------------------------------------
# Welch's t-test between two user cohorts (A/B arms).
# ---------------------------------------------------------------------------


@register(
    "q_welch_ab",
    tags=("A1", "FN-math"),
    oracle=f"""
{_EV}
, m AS (
  SELECT user_id % 2 AS arm,
         CAST(ROUND(value * 1000.0) AS BIGINT) AS v
  FROM ev WHERE event_type = 'purchase'
),
mom AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 0 THEN v ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN arm = 0 THEN v*v ELSE 0 END) AS BIGINT) AS ss0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN arm = 1 THEN v*v ELSE 0 END) AS BIGINT) AS ss1
  FROM m
)
SELECT n0, n1,
       round((CAST(s0 AS DOUBLE)/n0 - CAST(s1 AS DOUBLE)/n1) / 1000.0, 6)
         AS mean_diff,
       round((CAST(s0 AS DOUBLE)/n0 - CAST(s1 AS DOUBLE)/n1)
             / sqrt((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)*s0/n0)/(n0-1)/n0
                  + (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1)/(n1-1)/n1),
             6) AS t_stat
FROM mom
""",
)
def q_welch_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic between two experiment arms
    (users split by id parity) over purchase values — the A/B-test
    primitive, computed from one pass of exact integer moments
    (n, Σv, Σv²) per arm and assembled into the t ratio only in the
    final single-row projection.

    Scale rationale: conditional integer sums make the whole test ONE
    partial-aggregated scan — no per-arm shuffle, no variance UDF; at
    100 TB this is a map-side combine down to 6 longs per partition.
    Values are MILLI-units (t is scale-invariant): v² ≤ 1.1e11, so
    Σv² stays int64-safe past 3×10⁷ rows per arm (~sf10 here) — the
    round-5 sf0.1 bonus sweep caught the micro-unit form overflowing
    (v² ≈ 1.1e17 per row ⇒ int64 died at ~8×10¹ rows · 10⁶).  The
    double
    expression is written term-for-term identically in both engines
    and rounded to 6 decimals, the registry's cross-engine float
    doctrine.
    """
    e = _t(spark, sf_dir, "events")
    m = e.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * F.lit(1000.0)).cast("long").alias("v"),
    )
    z = F.lit(0).cast("long")
    mom = m.agg(
        F.sum(F.when(F.col("arm") == 0, F.lit(1).cast("long")).otherwise(z)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("v")).otherwise(z)).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, F.col("v") * F.col("v")).otherwise(z)).alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, F.lit(1).cast("long")).otherwise(z)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("v")).otherwise(z)).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, F.col("v") * F.col("v")).otherwise(z)).alias("ss1"),
    )
    return mom.select(
        "n0",
        "n1",
        F.round(
            (F.col("s0").cast("double") / F.col("n0")
             - F.col("s1").cast("double") / F.col("n1"))
            / F.lit(1000.0),
            6,
        ).alias("mean_diff"),
        F.round(
            (F.col("s0").cast("double") / F.col("n0")
             - F.col("s1").cast("double") / F.col("n1"))
            / F.sqrt(
                (F.col("ss0").cast("double")
                 - F.col("s0").cast("double") * F.col("s0") / F.col("n0"))
                / (F.col("n0") - 1) / F.col("n0")
                + (F.col("ss1").cast("double")
                   - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
                / (F.col("n1") - 1) / F.col("n1")
            ),
            6,
        ).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (co-occurrence cosine², top-3 per item).
# ---------------------------------------------------------------------------


@register(
    "q_collab_filter",
    tags=("J4", "A1", "W4", "X3"),
    oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
),
di AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS d FROM baskets GROUP BY item
),
co AS (
  SELECT a.item AS i, b.item AS j, CAST(COUNT(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.item <> b.item
  GROUP BY a.item, b.item
),
scored AS (
  SELECT co.i, co.j, co.co,
         CAST(co.co * co.co * 1000000 // (di.d * dj.d) AS BIGINT)
           AS cos2_ppm
  FROM co JOIN di ON co.i = di.item JOIN di dj ON co.j = dj.item
),
ranked AS (
  SELECT i, j, co, cos2_ppm,
         row_number() OVER (PARTITION BY i
                            ORDER BY cos2_ppm DESC, co DESC, j) AS rn
  FROM scored
)
SELECT i AS item, j AS reco, co AS n_cobaskets, cos2_ppm,
       CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 3
""",
)
def q_collab_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: score every co-purchased part
    pair by squared cosine of their basket-membership vectors —
    co(i,j)² / (d_i · d_j), kept in integer ppm so no sqrt crosses the
    compare gate — and keep each item's top-3 recommendations (ties
    broken by raw co-count, then item id).

    Scale rationale: the classic "buy this too" kernel.  Co-occurrence
    is a self-join on the basket key, so cost is Σ|basket|² — bounded
    by the biggest basket (7 lines here; at 100 TB you cap or sample
    mega-baskets first, the standard industry guard).  Degrees are
    node-cardinality and broadcast onto the pair list; the top-3 is a
    rank-filter that Catalyst executes as a group-limit within the
    pair shuffle (asserted for the same shape in tests/test_plans.py),
    so nothing materializes the full ranked list.
    """
    from ..operators.graph import basket_pairs

    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    di = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("d"))
    # r15 (guide §2.3): co-occurrence is symmetric — co(i,j) == co(j,i)
    # — so count each unordered pair once (i < j, half the exploded
    # rows and half the bytes through the count exchange) and mirror
    # the COUNTS afterwards; the mirror branch re-reads the count's
    # exchange via ReusedExchange instead of re-shuffling.  Output is
    # bit-identical to counting both orientations.
    co_h = (
        basket_pairs(
            li, "l_orderkey", "l_partkey",
            distinct_pairs=False, directed=False,
        )
        .toDF("i", "j")
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    co = co_h.union(
        co_h.select(F.col("j").alias("i"), F.col("i").alias("j"), "co")
    )
    scored = (
        co.join(F.broadcast(di.toDF("i", "d_i")), "i")
        .join(F.broadcast(di.toDF("j", "d_j")), "j")
        .select(
            "i",
            "j",
            "co",
            F.expr("CAST(co * co * 1000000 div (d_i * d_j) AS BIGINT)").alias(
                "cos2_ppm"
            ),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("cos2_ppm").desc(), F.col("co").desc(), F.col("j")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("reco"),
            F.col("co").alias("n_cobaskets"),
            "cos2_ppm",
            F.col("rn").cast("int").alias("rn"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier stats: median + MAD per event type.
# ---------------------------------------------------------------------------


@register(
    "q_mad_outliers",
    tags=("A1", "FN-math", "X5"),
    oracle=f"""
{_EV}
, m AS (
  SELECT event_type, CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
  FROM ev
),
med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med FROM m GROUP BY event_type
),
dev AS (
  SELECT m.event_type, m.v, med.med, ABS(m.v - med.med) AS adev
  FROM m JOIN med ON m.event_type = med.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(dev.med) / 1000000.0, 6) AS median,
       round(MIN(mad.mad) / 1000000.0, 6) AS mad,
       CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: exact median, median absolute
    deviation (MAD), and the count of |v − median| > 3·MAD outliers —
    the robust-statistics twin of q_anomaly_zscore (MAD has a 50%
    breakdown point; stddev has 0%, so one corrupt shard can't move
    the fence).

    Scale rationale: three passes over the same event_type
    partitioning — median groupBy, deviation join (the 5-row median
    table broadcasts), MAD groupBy + outlier count — each
    partial-aggregable except the exact quantiles, which at 100 TB you
    swap for the registry's KLL-sketch quantiles (q_kll_quantiles) with
    the identical dataflow.  Micro-unit integers make the quantile
    interpolation exact in both engines (Spark ``percentile`` and
    DuckDB ``quantile_cont`` both interpolate at (n−1)·p over doubles
    that hold integers ≤ 2^53 exactly; deviations are dyadic halves,
    also exact).
    """
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        F.round(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("v"),
    )
    med = m.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    dev = m.join(F.broadcast(med), "event_type").select(
        "event_type", "v", "med", F.abs(F.col("v") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("med") / F.lit(1_000_000.0), 6).alias("median"),
            F.round(F.min("mad") / F.lit(1_000_000.0), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average (step interpolation) per user.
# ---------------------------------------------------------------------------


@register(
    "q_time_weighted_avg",
    tags=("W2", "A1", "FN-datetime"),
    oracle=f"""
{_EV}
, p AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 1000.0) AS BIGINT) AS v_milli
  FROM ev WHERE event_type = 'purchase'
),
seg AS (
  SELECT user_id, v_milli,
         (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dur_s
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(dur_s) AS BIGINT) AS total_s,
       CAST(SUM(v_milli * dur_s) // SUM(dur_s) AS BIGINT) AS twa_milli
FROM seg WHERE dur_s IS NOT NULL
GROUP BY user_id HAVING SUM(dur_s) > 0
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average with step (last-observation-carried-
    forward) interpolation: each purchase value holds until the user's
    next purchase, and the average weights each value by how long it
    held — the TWAP/time-weighted-gauge primitive irregular time
    series need (a plain AVG over-counts bursts).

    Scale rationale: one window pass per user computes segment
    durations (lead over the per-user timeline — the single shuffle),
    then a partial-aggregable groupBy on the same key closes the
    weighted mean; AQE reuses the partitioning so the data moves once.
    All integer: milli-unit values × whole-second durations keep
    Σ(v·dur) ≤ ~3.3e5·8e6·rows-per-user ≈ 2.6e12·n — int64-safe past
    a million purchases per user; the final mean is one BIGINT floor
    division, engine-exact.
    """
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * F.lit(1000.0)).cast("long").alias("v_milli"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = p.select(
        "user_id",
        "v_milli",
        F.expr(
            "(unix_micros(lead(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id)) - unix_micros(ts)) div 1000000"
        ).alias("dur_s"),
    )
    return (
        seg.filter(F.col("dur_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_s").alias("total_s"),
            F.expr(
                "CAST(SUM(v_milli * dur_s) div SUM(dur_s) AS BIGINT)"
            ).alias("twa_milli"),
        )
        .filter(F.col("total_s") > 0)
    )


# ---------------------------------------------------------------------------
# OHLC candlestick bars per (event_type, day).
# ---------------------------------------------------------------------------


@register(
    "q_ohlc_bars",
    tags=("A5", "W2", "A1"),
    oracle=f"""
{_EV}
, m AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         ts, event_id,
         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
  FROM ev
),
r AS (
  SELECT event_type, day, v,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM m
)
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_e6,
       CAST(MAX(v) AS BIGINT) AS high_e6,
       CAST(MIN(v) AS BIGINT) AS low_e6,
       CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_e6,
       CAST(COUNT(*) AS BIGINT) AS volume,
       CAST(SUM(v) AS BIGINT) AS sum_e6
FROM r GROUP BY event_type, day
""",
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars: per (event_type, day), the opening and
    closing values (first/last by the (ts, event_id) total order —
    row_number both directions makes the tie-break explicit), the
    high/low extremes, and volume — the downsampling primitive every
    time-series store ships as its rollup.

    Scale rationale: both row_numbers share ONE window partitioning
    ((event_type, day) — Catalyst evaluates them in a single sort),
    and the closing groupBy lands on the identical key, so the whole
    bar build is one exchange of the fact stream.  On a cluster this
    is the map-side-heavy shape you want for 100 TB downsampling; for
    continuous ingest the same bar spec runs as the streaming tumbling
    window (q_events_tumbling's path) with these aggregates.  Values
    are micro-unit BIGINT throughout — bars compare bit-for-bit.
    """
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("v"),
    )
    wa = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = m.select(
        "event_type",
        "day",
        "v",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v"))).alias("open_e6"),
        F.max("v").alias("high_e6"),
        F.min("v").alias("low_e6"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v"))).alias("close_e6"),
        F.count(F.lit(1)).alias("volume"),
        F.sum("v").alias("sum_e6"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition membership (iterative peel, unique fixpoint;
# oracle: DuckDB recursive CTE carrying the shrinking edge set).
# ---------------------------------------------------------------------------


@register(
    "q_kcore",
    tags=("J5", "A1", "X2"),
    oracle="""
WITH RECURSIVE
li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
edges AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok
  WHERE a.pk <> b.pk
),
-- Iterative peel as a recursive CTE: each round re-emits the edges
-- whose BOTH endpoints keep degree >= k in the previous round's set,
-- tagged with an incremented round number; the n < prev_n guard stops
-- the recursion at the fixpoint (re-emitting an unchanged set forever
-- would otherwise never terminate under UNION ALL).
peel(u, v, r, n) AS (
  SELECT u, v, 0, COUNT(*) OVER () FROM edges
  UNION ALL
  SELECT u, v, r, n FROM (
    SELECT u, v, r, COUNT(*) OVER () AS n, prev_n FROM (
      SELECT u, v, r + 1 AS r, n AS prev_n,
             COUNT(*) OVER (PARTITION BY u) AS du,
             COUNT(*) OVER (PARTITION BY v) AS dv
      FROM peel
    ) s WHERE du >= 16 AND dv >= 16
  ) t WHERE n < prev_n
),
last AS (
  SELECT u, v FROM peel WHERE r = (SELECT MAX(r) FROM peel)
),
chk AS (
  SELECT u, v,
         COUNT(*) OVER (PARTITION BY u) AS du,
         COUNT(*) OVER (PARTITION BY v) AS dv,
         COUNT(*) OVER () AS n
  FROM last
),
-- The recursion stops either at a stable set (last round IS the core)
-- or because the next filter would drop EVERYTHING (core is empty —
-- zero rows cannot be emitted, so 'last' is the pre-collapse round).
-- Emit rows only in the stable case.
stable AS (
  SELECT u, v FROM chk
  WHERE (SELECT COUNT(*) FROM chk WHERE du >= 16 AND dv >= 16)
        = (SELECT MAX(n) FROM chk)
)
SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM stable GROUP BY u ORDER BY node
""",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes of the 16-core of the co-purchase graph with their
    in-core degree — the density-tier primitive for community mining
    and for deciding which subgraph is worth running expensive kernels
    (triangles, embeddings) on.

    Oracle: DuckDB recursive CTE that carries the shrinking edge set
    round by round (round counter + a strictly-decreasing-count guard
    for termination; k-core is a unique fixpoint so the peel order
    cannot matter).  Additionally pinned by
    tests/test_properties.py::test_kcore_matches_model, which
    checks the operator's fixpoint against a brute-force Python peel
    on randomized graphs plus invariants (every returned degree ≥ k,
    result unchanged under repartitioning).

    Scale rationale: documented on the operator — per-round work is
    O(|E_round|) on a strictly shrinking edge set, lineage cut per
    round, convergence via one count per round.
    """
    from ..operators.graph import kcore
    from .copurchase import copurchase_edges_undirected

    # r15: feed the undirected half (u < v) — kcore symmetrizes its
    # input internally, so the fixpoint is identical, and its two
    # setup dedup shuffles now run over half the rows (guide §2.3).
    # input_distinct_half declares basket_pairs' contract (distinct,
    # u < v, no self-loops), letting the setup skip BOTH dedup
    # shuffles outright — lazy mirror union, one checkpoint (A/B'd
    # 0.891x in tools/ab_kcore.py; equivalence pinned in
    # tests/test_properties.py).
    edges = copurchase_edges_undirected(spark, sf_dir)
    return kcore(edges, k=16, input_distinct_half=True).orderBy("node")


# ---------------------------------------------------------------------------
# Zipf exponent fit over the corpus token-frequency distribution.
# ---------------------------------------------------------------------------


@register(
    "q_zipf_fit",
    tags=("X5", "A1", "FN-math"),
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok
  WHERE tok <> '' GROUP BY tok
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
  FROM cnt
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4)
         AS zipf_slope,
       round(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4)
         AS r2
FROM ranked WHERE rank <= 500 AND c >= 2
""",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: regress ln(frequency) on ln(rank) over the
    corpus's top-500 token frequencies — the one-number diagnostic
    (slope ≈ −1 for natural language) that data-quality pipelines use
    to flag machine-generated or template-heavy crawl shards before
    they reach training.

    Scale rationale: token counting is the partial-aggregable explode +
    groupBy every text query here shares; only the 500-row Zipf head
    is ever ranked, so the head is taken FIRST with a distributed
    top-500 (TakeOrderedAndProject) and the rank window runs over
    those 500 rows — lossless (they ARE the first 500 of the total
    order), so no vocab-sized single-partition pass exists (the
    q_vocab_coverage discipline).  The fit is a one-pass covariance
    aggregate (regr_slope/regr_r2) over ≤500 rows.  Rank ties are
    broken by token string so both engines assign identical ranks;
    the regression is rounded to 4 decimals, the registry's
    cross-engine float-aggregate doctrine (cf. q_regression_aggs).
    """
    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    head = cnt.orderBy(F.col("c").desc(), "tok").limit(500)
    ranked = head.select(
        "c",
        "tok",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
        .alias("rank"),
    ).filter(F.col("c") >= 2)
    lnc = F.log(F.col("c").cast("double"))
    lnr = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.regr_slope(lnc, lnr), 4).alias("zipf_slope"),
        F.round(F.regr_r2(lnc, lnr), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over each user's event sequence.
# ---------------------------------------------------------------------------


@register(
    "q_transition_matrix",
    tags=("W2", "A1"),
    oracle=f"""
{_EV}
, seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM ev
),
cnt AS (
  SELECT prev, event_type AS cur, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur
)
SELECT prev, cur, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev) AS BIGINT)
         AS p_ppm
FROM cnt
""",
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (previous event type → next event type) pair, the transition count
    and its conditional probability in integer ppm — the
    substrate for next-action prediction, bot detection (improbable
    chains), and funnel design.

    Scale rationale: ONE window shuffle on user_id builds the lag
    pairs, one partial-aggregable groupBy counts them, and the
    row-normalization window runs over the TYPE×TYPE matrix (25 rows),
    not over events — the window-over-aggregate pattern from
    q_share_of_total.  Probabilities are BIGINT floor-ppm, so the
    matrix compares bit-for-bit across engines and partitionings.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    cnt = seq.groupBy("prev", F.col("event_type").alias("cur")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev")
    return cnt.select(
        "prev",
        "cur",
        "n",
        F.expr(
            "CAST(n * 1000000 div SUM(n) OVER (PARTITION BY prev) AS BIGINT)"
        ).alias("p_ppm"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation: quartile scores on recency/frequency/monetary.
# ---------------------------------------------------------------------------


@register(
    "q_rfm_segments",
    tags=("W1", "A1", "FN-datetime"),
    oracle=f"""
{_EV}
, rfm AS (
  SELECT user_id,
         MAX(epoch_us(ts)) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS monet_e6
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id
),
scored AS (
  SELECT user_id, freq, monet_e6,
         ntile(4) OVER (ORDER BY last_us DESC, user_id) AS r_score,
         ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_score,
         ntile(4) OVER (ORDER BY monet_e6 DESC, user_id) AS m_score
  FROM rfm
)
SELECT user_id, freq, monet_e6,
       CAST(r_score AS INT) AS r_score,
       CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_cell
FROM scored
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile-score every purchaser on
    Recency (latest purchase), Frequency (purchase count), and
    Monetary (exact micro-unit spend), then combine into the classic
    3-digit RFM cell (111 = best) — the workhorse segmentation behind
    retention campaigns.

    Scale rationale: the per-user rollup is one partial-aggregable
    groupBy over the purchase stream, pinned once with a lineage cut
    (localCheckpoint — the ranking kernels' own discipline) because
    four plan branches consume it; the three quartile assignments
    FAN OUT from it through operators/ranking.global_ntile
    (range-partitioned two-phase rank + broadcast total per
    ordering), each over a NARROW (user_id, metric) projection, and
    the integer scores join back on user_id (user-cardinality; AQE
    broadcasts locally, co-partitions at scale).  The fan-out beats
    the r5 chained form 0.794× (tools/ab_rfm.py, identity asserted):
    the three range shuffles carry 2 columns instead of the
    ever-widening full row, and the three sort barriers are
    independent subtrees Spark schedules concurrently instead of
    sequentially.  Every ordering carries a user_id tie-break, so
    quartile boundaries are engine-identical; all inputs are BIGINT
    (µs epochs, counts, micro-units).  At extreme user counts a
    percentile-sketch cut is the sampling alternative with the same
    output contract.
    """
    e = _t(spark, sf_dir, "events")
    rfm = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.round(F.col("value") * F.lit(1_000_000.0)).cast("long")
            ).alias("monet_e6"),
        )
    ).localCheckpoint(eager=False)
    orders = {
        "r_score": ("last_us", [F.col("last_us").desc(), F.col("user_id")]),
        "f_score": ("freq", [F.col("freq").desc(), F.col("user_id")]),
        "m_score": (
            "monet_e6",
            [F.col("monet_e6").desc(), F.col("user_id")],
        ),
    }
    scored = rfm
    for out, (metric, cols) in orders.items():
        ranked = global_ntile(
            rfm.select("user_id", metric), 4, cols, out=out
        ).select("user_id", out)
        scored = scored.join(ranked, "user_id")
    scored = scored.select(
        "user_id", "freq", "monet_e6", "r_score", "f_score", "m_score"
    )
    return scored.select(
        "user_id",
        "freq",
        "monet_e6",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int")
        .alias("rfm_cell"),
    )


# ---------------------------------------------------------------------------
# posexplode — ordinal-preserving array expansion.
# ---------------------------------------------------------------------------


@register(
    "q_posexplode",
    tags=("FN-array", "P1"),
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
x AS (
  SELECT doc_id,
         CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
         unnest(toks) AS tok
  FROM t
)
SELECT doc_id, pos, tok, CAST(length(tok) AS BIGINT) AS tok_len
FROM x WHERE pos <= 3 AND tok <> ''
""",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving array expansion: posexplode the token array
    and keep each document's first three tokens WITH their positions —
    the expansion every sequence-aware pipeline needs (plain explode
    loses the ordinal; Spark's posexplode and DuckDB's
    generate_subscripts both recover it, 0- vs 1-based reconciled
    explicitly).

    Scale rationale: posexplode is a zero-shuffle generator — rows fan
    out within their input partition, the position filter lands before
    anything moves, and Catalyst prunes the documents scan to the text
    column.  The ordinal lets downstream context-window and
    sequence-packing ops (plans/advanced) keep token order without a
    sort.
    """
    d = _t(spark, sf_dir, "documents")
    x = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
    )
    return (
        x.filter((F.col("pos0") <= 2) & (F.col("tok") != ""))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            "tok",
            F.length("tok").cast("long").alias("tok_len"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling trend: windowed OLS slope from integer rolling moments.
# ---------------------------------------------------------------------------


@register(
    "q_rolling_slope",
    tags=("W3", "FN-math", "A1"),
    oracle=f"""
{_EV}
, p AS (
  SELECT user_id, event_id,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS x,
         CAST(ROUND(value * 1000000.0) AS BIGINT) AS y
  FROM ev WHERE event_type = 'purchase'
),
m AS (
  SELECT user_id, event_id, x, y,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x*y) OVER w AS BIGINT) AS sxy,
         CAST(SUM(x*x) OVER w AS BIGINT) AS sxx
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY x
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, n,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE) / 1000000.0, 6) AS slope
FROM m WHERE n >= 3
""",
)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trend detector: the OLS slope of each user's last 8
    purchase values against their sequence position, emitted per event
    — "is this user's spend trending up RIGHT NOW", the
    feature-engineering twin of the global q_regression_aggs.

    Built from INTEGER rolling moments (n, Σx, Σy, Σxy, Σx² over a
    ROWS frame — all BIGINT window sums on the same user partitioning)
    with the closed-form slope assembled in one final double division,
    rather than a windowed regr_slope whose internal covariance
    accumulation differs between engines.  One window sort per user =
    ONE exchange for all five moments (Catalyst shares the
    windowspec); BIGINT envelope: Σxy ≤ n²·3.3e8 — int64-safe to
    millions of purchases per user.
    """
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.row_number().over(wseq).cast("long").alias("x"),
        F.round(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("y"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-7, Window.currentRow)
    )
    m = p.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    return m.filter(F.col("n") >= 3).select(
        "user_id",
        "event_id",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / F.lit(1_000_000.0),
            6,
        ).alias("slope"),
    )


# ---------------------------------------------------------------------------
# Max concurrency: sweep-line over half-open activity intervals.
# ---------------------------------------------------------------------------


@register(
    "q_max_concurrency",
    tags=("W3", "A1", "U1", "FN-datetime"),
    oracle=f"""
{_EV}
, iv AS (
  SELECT event_type, epoch_us(ts) AS s_us,
         epoch_us(ts) + 300000000 AS e_us
  FROM ev
),
d AS (
  SELECT event_type, s_us AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT event_type, e_us AS t, -1 AS delta FROM iv
),
net AS (
  SELECT event_type, t, CAST(SUM(delta) AS BIGINT) AS net
  FROM d GROUP BY event_type, t
),
run AS (
  SELECT event_type, t,
         SUM(net) OVER (PARTITION BY event_type ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM net
),
mx AS (
  SELECT event_type, MAX(conc) AS max_concurrent FROM run
  GROUP BY event_type
)
SELECT run.event_type,
       CAST(mx.max_concurrent AS BIGINT) AS max_concurrent,
       CAST(MIN(run.t) AS BIGINT) AS first_peak_us
FROM run JOIN mx ON run.event_type = mx.event_type
               AND run.conc = mx.max_concurrent
GROUP BY run.event_type, mx.max_concurrent
""",
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep-line: treat each event as a half-open
    5-minute activity interval [ts, ts+5m), emit +1/−1 boundary
    deltas, net them per timestamp (half-open semantics fall out —
    an interval ending exactly when another starts never overlaps it),
    and take the running sum's maximum per event type with the first
    instant it is reached — the "peak concurrent sessions" primitive
    behind capacity planning and rate-limit audits.

    Scale rationale: the sweep is the O(n log n) answer to interval
    overlap (the naive self-join is O(n²) on dense periods).  Net
    deltas collapse in a partial-aggregable groupBy BEFORE the window,
    so the running sum touches one row per distinct boundary; all
    three stages share the event_type partitioning — one exchange
    plus the per-type boundary sort.  Pure µs-integer arithmetic.
    """
    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("e_us"),
    )
    d = iv.select("event_type", F.col("s_us").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select("event_type", F.col("e_us").alias("t"), F.lit(-1).alias("delta"))
    )
    net = d.groupBy("event_type", "t").agg(F.sum("delta").cast("long").alias("net"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.select("event_type", "t", F.sum("net").over(w).alias("conc"))
    mx = run.groupBy("event_type").agg(F.max("conc").alias("max_concurrent"))
    return (
        run.join(mx, "event_type")
        .filter(F.col("conc") == F.col("max_concurrent"))
        .groupBy("event_type", "max_concurrent")
        .agg(F.min("t").alias("first_peak_us"))
        .select("event_type", "max_concurrent", "first_peak_us")
    )


# ---------------------------------------------------------------------------
# Readability scoring (Flesch-style, deterministic syllable proxy).
# ---------------------------------------------------------------------------


@register(
    "q_readability",
    tags=("X5", "FN-string"),
    oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS words,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sents,
         CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
              AS BIGINT) AS sylls
  FROM documents
)
SELECT doc_id, words, sents, sylls,
       CAST(206835 - (1015 * words) // sents - (84600 * sylls) // words
            AS BIGINT) AS flesch_e3
FROM m WHERE words > 0
""",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document in fixed-point milli-units,
    with a deterministic syllable proxy (vowel-group count — the
    standard dictionary-free stand-in): 206.835 − 1.015·(words/sent)
    − 84.6·(syll/word), all three ratios as BIGINT floor divisions —
    the readability band is a text-quality feature most corpus filters
    carry next to perplexity (q_bigram_lm_score).

    Scale rationale: three regexp/split counts per row — a pure
    zero-shuffle JVM map stage over the pruned text column; the scan
    parallelizes with input splits and nothing ever leaves its
    partition.
    """
    d = _t(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("long").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
            F.lit(1),
        ).cast("long").alias("sents"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiou]+"), F.lit(0))
        ).cast("long").alias("sylls"),
    )
    return m.filter(F.col("words") > 0).select(
        "doc_id",
        "words",
        "sents",
        "sylls",
        F.expr(
            "CAST(206835 - (1015 * words) div sents - (84600 * sylls) div words"
            " AS BIGINT)"
        ).alias("flesch_e3"),
    )


# ---------------------------------------------------------------------------
# Per-group frequency-sketch top-k with an exact small-domain twin.
# ---------------------------------------------------------------------------


@register(
    "q_approx_topk_per_group",
    tags=("A3", "O2", "X5"),
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
c AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok WHERE tok <> '' GROUP BY lang, tok
),
r AS (
  SELECT lang, tok, cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, tok) AS rn
  FROM c
)
SELECT lang, tok, cnt, CAST(rn AS INT) AS rn
FROM r WHERE rn <= 3
""",
)
def q_approx_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters via one ``approx_top_k`` sketch PER
    GROUP (grouped aggregation over the frequency sketch), re-ranked
    under an explicit (count desc, token) total order.  Each
    language's token domain sits far below the sketch's tracked-item
    capacity (raised to 10⁵ so the envelope holds at sf≥0.1 vocab
    growth too), so the sketch counts are provably exact and the plain
    groupBy top-3 oracle matches bit-for-bit — the same
    exactness-envelope doctrine as q_approx_topk_events, extended to
    the grouped form.

    Scale rationale: this is the sketch shape that matters at 100 TB —
    per-key top-k WITHOUT materializing per-key full counts: one
    fixed-size sketch per group merges map-side (partial-aggregable),
    so the shuffle carries |groups| sketches instead of |groups|×|vocab|
    count rows.  The over-fetch (k=50 ≫ 3) + re-rank guards the
    k-boundary tie order, which the sketch leaves unspecified.
    """
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    sk = tok.groupBy("lang").agg(
        F.expr("approx_top_k(tok, 50, 100000)").alias("tk")
    )
    x = sk.select("lang", F.explode("tk").alias("x")).select(
        "lang", F.col("x.item").alias("tok"), F.col("x.count").alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("tok"))
    return (
        x.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "tok", "cnt", F.col("rn").cast("int").alias("rn"))
    )


# ---------------------------------------------------------------------------
# Distributed global ranking — two-phase range-partitioned row_number.
# ---------------------------------------------------------------------------


@register(
    "q_global_rank_distributed",
    tags=("W1", "O1", "O3"),
    oracle="""
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rn
FROM orders
""",
)
def q_global_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row_number over every order by (price desc, key) —
    computed WITHOUT a single-partition sort: range-partition on the
    order key, rank locally in parallel, add broadcast per-partition
    offsets (operators/ranking.py).  The oracle is the textbook
    single-sort window; exact equality of all 15k ranks IS the proof
    that the two-phase decomposition is lossless.

    Scale rationale: this is the operator the global-ntile/rank
    caveats elsewhere (q_rfm_segments, q_auc_ranksum,
    q_calibration_bins) point at — at 10⁹+ rows a bare
    Window.orderBy funnels everything through one task, while this
    shape keeps sorting fully parallel (the same range-exchange ORDER
    BY uses) and moves only a partition-count-sized offset table to
    the driver/broadcast.  Requires a TOTAL order (unique tie-break),
    which every ranked query in this registry already carries.
    """
    from ..operators.ranking import global_row_number

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(
        o,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        out="rn",
    )
    return ranked.select("o_orderkey", "rn")


# ---------------------------------------------------------------------------
# Top user journeys: ordered event-type paths per user-day.
# ---------------------------------------------------------------------------


@register(
    "q_top_paths",
    tags=("W1", "A1", "FN-string", "O2"),
    oracle=f"""
{_EV}
, seq AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS day,
         event_type,
         row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
                            ORDER BY ts, event_id) AS rn
  FROM ev
),
paths AS (
  SELECT user_id, day,
         concat_ws('>',
           MAX(CASE WHEN rn = 1 THEN event_type END),
           MAX(CASE WHEN rn = 2 THEN event_type END),
           MAX(CASE WHEN rn = 3 THEN event_type END),
           MAX(CASE WHEN rn = 4 THEN event_type END)) AS path
  FROM seq WHERE rn <= 4 GROUP BY user_id, day
),
c AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM paths GROUP BY path
)
SELECT path, n_sessions, n_users FROM c
ORDER BY n_sessions DESC, path LIMIT 10
""",
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user-day's first four event types in
    time order, concatenated into a path string ('view>click>…'), then
    the ten most common paths with session and unique-user counts —
    the "what do people actually do" query behind every product-
    analytics flow diagram.

    Determinism: path assembly uses rank-pinned conditional MAX (never
    collect_list, whose intra-group order is partition-dependent), so
    the path string is a pure function of the (ts, event_id) total
    order; the top-10 breaks count ties on the path string.

    Scale rationale: one window sort per (user, day) partition — the
    sessionization shuffle — then two partial-aggregable groupBys over
    strictly smaller cardinalities (sessions, then paths), and the
    final top-10 is a TakeOrderedAndProject over path-cardinality
    rows.  No joins, no explode; at 100 TB the user-day key is already
    skew-free.
    """
    e = _t(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy(
                "user_id", F.expr("unix_micros(ts) div 86400000000")
            ).orderBy("ts", "event_id")
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 4)

    def at(k: int):
        return F.max(F.when(F.col("rn") == k, F.col("event_type")))

    paths = seq.groupBy("user_id", "day").agg(
        F.concat_ws(">", at(1), at(2), at(3), at(4)).alias("path")
    )
    c = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return c.orderBy(F.col("n_sessions").desc(), "path").limit(10)


# ---------------------------------------------------------------------------
# Funnel timing: time-to-convert distribution between funnel stages.
# ---------------------------------------------------------------------------


@register(
    "q_funnel_timing",
    tags=("A1", "FN-datetime", "FN-math"),
    oracle=f"""
{_EV}
, u AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase
  FROM ev GROUP BY user_id
),
d AS (
  SELECT (t_purchase - t_signup) // 1000000 AS delta_s
  FROM u WHERE t_signup IS NOT NULL AND t_purchase > t_signup
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(delta_s) AS BIGINT) AS min_s,
       quantile_cont(delta_s, 0.5) AS median_s,
       quantile_cont(delta_s, 0.9) AS p90_s,
       CAST(MAX(delta_s) AS BIGINT) AS max_s
FROM d
""",
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: for every user who signed up and later
    purchased, the signup→first-purchase latency distribution
    (count/min/median/p90/max in whole seconds) — the companion to
    q_funnel's conversion COUNTS that tells you how long the funnel
    actually takes.

    Scale rationale: stage timestamps come from one conditional-MIN
    groupBy over events (partial-aggregable, single shuffle on
    user_id — the q_funnel shape); deltas are integer µs differences
    floored to seconds, and the exact interpolated percentiles run
    over the CONVERTED-USER table.  At 100 TB swap the exact quantile
    for the KLL sketch (q_kll_quantiles) with the same dataflow.
    """
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("t_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("t_purchase"),
    )
    d = u.filter(
        F.col("t_signup").isNotNull()
        & (F.col("t_purchase") > F.col("t_signup"))
    ).select(
        F.expr("(t_purchase - t_signup) div 1000000").alias("delta_s")
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("delta_s").alias("min_s"),
        F.expr("percentile(delta_s, 0.5)").alias("median_s"),
        F.expr("percentile(delta_s, 0.9)").alias("p90_s"),
        F.max("delta_s").alias("max_s"),
    )


# ---------------------------------------------------------------------------
# Growth accounting: new / retained / resurrected / churned per week.
# ---------------------------------------------------------------------------


@register(
    "q_growth_accounting",
    tags=("W2", "A1", "FN-datetime"),
    oracle=f"""
{_EV}
, wk AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM ev
),
lagged AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
         min(week) OVER (PARTITION BY user_id) AS first_week
  FROM wk
),
labeled AS (
  SELECT week,
         CASE WHEN week = first_week THEN 'new'
              WHEN prev_week = week - 1 THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM lagged
),
active AS (
  SELECT week, status, CAST(COUNT(*) AS BIGINT) AS n
  FROM labeled GROUP BY week, status
),
churn AS (
  SELECT week + 1 AS week, 'churned' AS status,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT user_id, week,
           lead(week) OVER (PARTITION BY user_id ORDER BY week) AS nxt,
           max(week) OVER () AS last_week
    FROM wk
  )
  WHERE (nxt IS NULL OR nxt > week + 1) AND week < last_week
  GROUP BY week + 1
)
SELECT CAST(week AS BIGINT) AS week, status, n FROM active
UNION ALL
SELECT CAST(week AS BIGINT) AS week, status, n FROM churn
""",
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user-week labeled new
    (first week ever), retained (active previous week), or resurrected
    (returning after a gap), plus the churned count (active in week w,
    absent in w+1) — the standard DAU/WAU decomposition every growth
    team reports.

    Scale rationale: distinct user-weeks collapse map-side; one window
    pass per user partition labels transitions (lag/lead/min share ONE
    windowspec sort); weekly rollups are partial-aggregable over
    user-week cardinality.  Weeks are pure integer µs-epoch divisions
    — engine-exact.  The `max(week) OVER ()` guard keeps the final
    (right-censored) week out of churn, matching the oracle exactly.
    """
    e = _t(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("week")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    wu = Window.partitionBy("user_id")
    lagged = wk.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.min("week").over(wu).alias("first_week"),
    )
    labeled = lagged.select(
        "week",
        F.when(F.col("week") == F.col("first_week"), F.lit("new"))
        .when(F.col("prev_week") == F.col("week") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("status"),
    )
    active = labeled.groupBy("week", "status").agg(
        F.count(F.lit(1)).alias("n")
    )
    # last_week as a broadcast 1-row aggregate, NOT max() OVER () —
    # the empty-partition window would funnel the full user-week
    # relation through one task (the same liability class as the
    # round-4 triangle broadcasts; every other OVER () in this repo
    # runs over already-aggregated tiny tables)
    last = wk.agg(F.max("week").alias("last_week"))
    churn_base = wk.select(
        "user_id",
        "week",
        F.lead("week").over(w).alias("nxt"),
    ).crossJoin(F.broadcast(last))
    churn = (
        churn_base.filter(
            (F.col("nxt").isNull() | (F.col("nxt") > F.col("week") + 1))
            & (F.col("week") < F.col("last_week"))
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("week", F.lit("churned").alias("status"), "n")
    )
    return active.select("week", "status", "n").unionAll(churn)


# ---------------------------------------------------------------------------
# Cohort LTV: cumulative revenue per signup cohort by cohort age.
# ---------------------------------------------------------------------------


@register(
    "q_cohort_ltv",
    tags=("W3", "A1", "FN-datetime"),
    oracle=f"""
{_EV}
, p AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS week,
         CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
  FROM ev WHERE event_type = 'purchase'
),
cohorted AS (
  SELECT user_id, week, v,
         min(week) OVER (PARTITION BY user_id) AS cohort
  FROM p
),
wk AS (
  SELECT cohort, week - cohort AS age,
         CAST(SUM(v) AS BIGINT) AS rev_e6,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
  FROM cohorted GROUP BY cohort, week - cohort
),
sized AS (
  SELECT cohort, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort_size
  FROM cohorted GROUP BY cohort
)
SELECT CAST(wk.cohort AS BIGINT) AS cohort,
       CAST(wk.age AS BIGINT) AS age,
       wk.active_users,
       CAST(SUM(wk.rev_e6) OVER (PARTITION BY wk.cohort ORDER BY wk.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_e6,
       CAST(SUM(wk.rev_e6) OVER (PARTITION BY wk.cohort ORDER BY wk.age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            // sized.cohort_size AS BIGINT) AS ltv_per_user_e6
FROM wk JOIN sized ON wk.cohort = sized.cohort
""",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users grouped by first-purchase week, then
    each cohort's cumulative revenue by cohort age (weeks since
    cohort) and per-user LTV — the payback-period table every
    subscription/commerce business lives by.

    Scale rationale: cohort assignment is a per-user window MIN (one
    user-key shuffle); the age rollup is partial-aggregable; the
    cumulative window runs over cohort×age cardinality (tiny), and
    cohort sizes broadcast back.  Revenue is exact micro-unit BIGINT
    end to end; LTV is one floor division per output row.
    """
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
        F.round(F.col("value") * F.lit(1_000_000.0)).cast("long").alias("v"),
    )
    cohorted = p.select(
        "user_id",
        "week",
        "v",
        F.min("week").over(Window.partitionBy("user_id")).alias("cohort"),
    )
    wk = cohorted.groupBy(
        "cohort", (F.col("week") - F.col("cohort")).alias("age")
    ).agg(
        F.sum("v").alias("rev_e6"),
        F.countDistinct("user_id").alias("active_users"),
    )
    sized = cohorted.groupBy("cohort").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = wk.join(F.broadcast(sized), "cohort")
    return j.select(
        "cohort",
        "age",
        "active_users",
        F.sum("rev_e6").over(wcum).alias("cum_rev_e6"),
        F.expr(
            "CAST(SUM(rev_e6) OVER (PARTITION BY cohort ORDER BY age "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "div cohort_size AS BIGINT)"
        ).alias("ltv_per_user_e6"),
    )


# ---------------------------------------------------------------------------
# Geospatial nearest neighbor (haversine over synthetic coordinates).
# ---------------------------------------------------------------------------

#: Synthetic but deterministic geo grid: both engines derive identical
#: micro-degree coordinates from the integer keys, so the float
#: haversine inputs are bit-identical.
_GEO_CUST = """
  SELECT c_custkey,
         CAST((c_custkey * 7919) % 160000000 - 80000000 AS BIGINT) AS lat_e6,
         CAST((c_custkey * 104729) % 360000000 - 180000000 AS BIGINT) AS lon_e6
  FROM customer
"""
_GEO_SUPP = """
  SELECT s_suppkey,
         CAST((s_suppkey * 7919) % 160000000 - 80000000 AS BIGINT) AS lat_e6,
         CAST((s_suppkey * 104729) % 360000000 - 180000000 AS BIGINT) AS lon_e6
  FROM supplier
"""


@register(
    "q_geo_nearest",
    tags=("J6", "W1", "FN-math"),
    oracle=f"""
WITH c AS ({_GEO_CUST}),
s AS ({_GEO_SUPP}),
pairs AS (
  SELECT c.c_custkey, s.s_suppkey,
         2.0 * 6371000.0 * asin(sqrt(
           pow(sin(radians((s.lat_e6 - c.lat_e6) / 1000000.0) / 2.0), 2)
           + cos(radians(c.lat_e6 / 1000000.0))
             * cos(radians(s.lat_e6 / 1000000.0))
             * pow(sin(radians((s.lon_e6 - c.lon_e6) / 1000000.0) / 2.0), 2)
         )) AS dist_m
  FROM c, s
),
ranked AS (
  SELECT c_custkey, s_suppkey, dist_m,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY dist_m, s_suppkey) AS rn
  FROM pairs
)
SELECT c_custkey, s_suppkey AS nearest_supp,
       CAST(ROUND(dist_m) AS BIGINT) AS dist_m
FROM ranked WHERE rn = 1 AND c_custkey <= 300
""",
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial nearest neighbor: each customer's closest supplier
    by great-circle (haversine) distance over deterministic synthetic
    coordinates — the store-assignment / nearest-warehouse primitive.

    Determinism: coordinates are integer micro-degrees derived from
    the keys with the same modular arithmetic in both engines, the
    haversine chain is written term-for-term identically (sin/cos/
    asin/sqrt on bit-identical doubles), distance rounds to whole
    meters only in the output, and the argmin carries a supplier-key
    tie-break.

    Scale rationale: the supplier side (dimension-sized) broadcasts
    into a bounded cross product; the per-customer argmin is a
    group-limit window.  At planetary fact scale you first bucket both
    sides into geohash/Z-order cells (the q_zorder_stats layout) and
    join only neighboring cells — same argmin tail, candidate set
    bounded by cell occupancy instead of |suppliers|.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(
            "CAST((c_custkey * 7919) % 160000000 - 80000000 AS BIGINT)"
        ).alias("lat_e6"),
        F.expr(
            "CAST((c_custkey * 104729) % 360000000 - 180000000 AS BIGINT)"
        ).alias("lon_e6"),
    ).filter(F.col("c_custkey") <= 300)
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(
            "CAST((s_suppkey * 7919) % 160000000 - 80000000 AS BIGINT)"
        ).alias("s_lat_e6"),
        F.expr(
            "CAST((s_suppkey * 104729) % 360000000 - 180000000 AS BIGINT)"
        ).alias("s_lon_e6"),
    )
    pairs = c.crossJoin(F.broadcast(s)).select(
        "c_custkey",
        "s_suppkey",
        (
            F.lit(2.0 * 6371000.0)
            * F.asin(
                F.sqrt(
                    F.pow(
                        F.sin(
                            F.radians(
                                (F.col("s_lat_e6") - F.col("lat_e6"))
                                / F.lit(1_000_000.0)
                            )
                            / F.lit(2.0)
                        ),
                        F.lit(2.0),
                    )
                    + F.cos(F.radians(F.col("lat_e6") / F.lit(1_000_000.0)))
                    * F.cos(F.radians(F.col("s_lat_e6") / F.lit(1_000_000.0)))
                    * F.pow(
                        F.sin(
                            F.radians(
                                (F.col("s_lon_e6") - F.col("lon_e6"))
                                / F.lit(1_000_000.0)
                            )
                            / F.lit(2.0)
                        ),
                        F.lit(2.0),
                    )
                )
            )
        ).alias("dist_m"),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_m", "s_suppkey")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_supp"),
            F.round("dist_m").cast("long").alias("dist_m"),
        )
    )


# ---------------------------------------------------------------------------
# Association rules: support / confidence / lift over 2-itemsets.
# ---------------------------------------------------------------------------


@register(
    "q_association_rules",
    tags=("J4", "A1", "O2"),
    oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM baskets),
di AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS d FROM baskets GROUP BY item
),
co AS (
  SELECT a.item AS ante, b.item AS cons, CAST(COUNT(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.item <> b.item
  GROUP BY a.item, b.item
),
rules AS (
  SELECT co.ante, co.cons, co.co,
         CAST(co.co * 1000000 // n.n_baskets AS BIGINT) AS support_ppm,
         CAST(co.co * 1000000 // da.d AS BIGINT) AS confidence_ppm,
         CAST(co.co * n.n_baskets * 1000000 // (da.d * dc.d) AS BIGINT)
           AS lift_ppm
  FROM co
  JOIN di da ON co.ante = da.item
  JOIN di dc ON co.cons = dc.item
  CROSS JOIN n
)
SELECT ante, cons, co, support_ppm, confidence_ppm, lift_ppm
FROM rules WHERE co >= 3 AND lift_ppm > 1000000
ORDER BY lift_ppm DESC, confidence_ppm DESC, ante, cons
LIMIT 25
""",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased part pairs:
    support (P(ante∧cons)), confidence (P(cons|ante)), and lift
    (observed/expected co-occurrence) in integer ppm, keeping the 25
    strongest positive-lift rules with ≥3 supporting baskets — the
    Apriori 2-itemset core behind "frequently bought together".

    Scale rationale: same basket self-join skeleton as q_collab_filter
    (cost bounded by the largest basket — cap mega-baskets at real
    scale); item frequencies and the 1-row basket count broadcast onto
    the pair list; thresholds prune BEFORE the global top-25
    TakeOrderedAndProject.  All three metrics are chained BIGINT
    floor-ppm divisions — no float crosses the gate, and the rule
    ordering carries a full (lift, confidence, ante, cons) tie-break.
    """
    from ..operators.graph import basket_pairs

    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    n = baskets.agg(F.countDistinct("ok").alias("n_baskets"))
    di = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("d"))
    # r15 (guide §2.3): same half-count + mirrored-counts scheme as
    # q_collab_filter — co(ante, cons) is symmetric, so count each
    # unordered pair once and mirror the counts (ReusedExchange on the
    # swap branch); bit-identical, half the count-shuffle bytes.
    co_h = (
        basket_pairs(
            li, "l_orderkey", "l_partkey",
            distinct_pairs=False, directed=False,
        )
        .toDF("ante", "cons")
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    co = co_h.union(
        co_h.select(
            F.col("cons").alias("ante"), F.col("ante").alias("cons"), "co"
        )
    )
    rules = (
        co.join(F.broadcast(di.toDF("ante", "d_a")), "ante")
        .join(F.broadcast(di.toDF("cons", "d_c")), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ante",
            "cons",
            "co",
            F.expr("CAST(co * 1000000 div n_baskets AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr("CAST(co * 1000000 div d_a AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                "CAST(co * n_baskets * 1000000 div (d_a * d_c) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return (
        rules.filter((F.col("co") >= 3) & (F.col("lift_ppm") > 1_000_000))
        .orderBy(
            F.col("lift_ppm").desc(),
            F.col("confidence_ppm").desc(),
            "ante",
            "cons",
        )
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Audience overlap: Jaccard between event-type user sets.
# ---------------------------------------------------------------------------


@register(
    "q_audience_overlap",
    tags=("A2", "J4", "FN-math"),
    oracle=f"""
{_EV}
, s AS (SELECT DISTINCT event_type, user_id FROM ev),
sizes AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM s a JOIN s b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT inter.et_a, inter.et_b, inter.n_both,
       sa.n AS n_a, sb.n AS n_b,
       CAST(inter.n_both * 1000000 // (sa.n + sb.n - inter.n_both) AS BIGINT)
         AS jaccard_ppm
FROM inter
JOIN sizes sa ON inter.et_a = sa.event_type
JOIN sizes sb ON inter.et_b = sb.event_type
""",
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, how
    many users do both and the Jaccard similarity of the two user
    sets in integer ppm — the segment-overlap diagnostic behind
    campaign targeting and cannibalization analysis.

    Scale rationale: the distinct (type, user) set collapses map-side;
    the intersection is a self-join on user_id (each user contributes
    |their types|² pairs — bounded by the type cardinality, so no
    blow-up) and the union size falls out of |A|+|B|−|A∩B| with the
    tiny per-type size table broadcast.  At billions of users swap the
    exact intersection for the theta-sketch set ops already shipped
    (q_theta_setops) with this same output contract.
    """
    e = _t(spark, sf_dir, "events")
    s = e.select("event_type", "user_id").distinct()
    sizes = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = s.toDF("et_a", "user_id")
    b = s.toDF("et_b", "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        inter.join(F.broadcast(sizes.toDF("et_a", "n_a")), "et_a")
        .join(F.broadcast(sizes.toDF("et_b", "n_b")), "et_b")
        .select(
            "et_a",
            "et_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_both * 1000000 div (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Spatial cell density: integer-degree grid aggregation.
# ---------------------------------------------------------------------------


@register(
    "q_geo_cell_density",
    tags=("A1", "O2", "FN-math"),
    oracle=f"""
WITH c AS ({_GEO_CUST}),
cells AS (
  SELECT CASE WHEN lat_e6 >= 0 THEN lat_e6 // 10000000
              ELSE -((-lat_e6 + 9999999) // 10000000) END AS cell_lat,
         CASE WHEN lon_e6 >= 0 THEN lon_e6 // 10000000
              ELSE -((-lon_e6 + 9999999) // 10000000) END AS cell_lon
  FROM c
)
SELECT CAST(cell_lat AS BIGINT) AS cell_lat,
       CAST(cell_lon AS BIGINT) AS cell_lon,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM cells GROUP BY cell_lat, cell_lon
ORDER BY n_points DESC, cell_lat, cell_lon LIMIT 15
""",
)
def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid: bucket the synthetic customer coordinates
    into 10°×10° cells with a floor-toward-−∞ integer division (the
    grid must be consistent across the sign boundary — truncation
    toward zero would make cell 0 twice as wide) and rank the 15
    densest cells — the binning that precedes any geo join/heatmap at
    scale (the cell id IS the join/partition key q_geo_nearest's
    docstring promises).

    Scale rationale: pure integer per-row math + one partial-
    aggregable groupBy + TakeOrderedAndProject; the explicit
    floor-division CASE keeps Spark's `div` (truncating) and DuckDB's
    `//` (also truncating on BIGINT) in exact agreement for negative
    coordinates.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.expr(
            "CAST((c_custkey * 7919) % 160000000 - 80000000 AS BIGINT)"
        ).alias("lat_e6"),
        F.expr(
            "CAST((c_custkey * 104729) % 360000000 - 180000000 AS BIGINT)"
        ).alias("lon_e6"),
    )
    def cell(col):
        return (
            F.when(
                F.col(col) >= 0, F.expr(f"{col} div 10000000")
            ).otherwise(-F.expr(f"(-{col} + 9999999) div 10000000"))
        )
    cells = c.select(
        cell("lat_e6").cast("long").alias("cell_lat"),
        cell("lon_e6").cast("long").alias("cell_lon"),
    )
    return (
        cells.groupBy("cell_lat", "cell_lon")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy(F.col("n_points").desc(), "cell_lat", "cell_lon")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity revenue via correlated avg subquery.
# ---------------------------------------------------------------------------


@register(
    "q_small_qty_revenue",
    tags=("P5", "J4", "A1"),
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) // 7 AS BIGINT)
         AS yearly_rev_c
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2
           WHERE l2.l_partkey = p.p_partkey)
      < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
         WHERE l2.l_partkey = p.p_partkey)
""",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would vanish if sub-20%-of-
    average-quantity orders for one brand's parts were dropped — the
    classic CORRELATED-AGGREGATE-subquery benchmark (qty < 0.2·avg
    over the same part, cleared to the all-integer
    5·qty·cnt < Σqty so no float average sits on the comparison
    boundary).

    Scale rationale: Catalyst decorrelates both correlated scalar
    subqueries into ONE per-part aggregate joined back (asserted for
    the same decorrelation pattern by
    tests/test_plans.py::test_correlated_subquery_decorrelates); at
    100 TB that is a single partial-agg over lineitem plus a
    broadcast-or-shuffle join on partkey — never a per-row re-scan,
    which is exactly what this TPC-H query exists to punish.
    """
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("r5q17_l")
    _t(spark, sf_dir, "part").createOrReplaceTempView("r5q17_p")
    return spark.sql(
        """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) div 7 AS BIGINT)
         AS yearly_rev_c
FROM r5q17_l l JOIN r5q17_p p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT COUNT(*) FROM r5q17_l l2
           WHERE l2.l_partkey = p.p_partkey)
      < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM r5q17_l l2
         WHERE l2.l_partkey = p.p_partkey)
"""
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (groupBy-HAVING feeding a join).
# ---------------------------------------------------------------------------


@register(
    "q_large_volume_orders",
    tags=("A1", "J4", "O2"),
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 220
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_c,
       big.qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_c DESC, o.o_orderkey LIMIT 20
""",
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the 20 priciest orders whose total line
    quantity exceeds 220 units, with their customers — the
    groupBy-HAVING-feeds-join benchmark (the original phrases it as
    IN (GROUP BY … HAVING); the semi-equivalent join form is what
    every engine plans it to).

    Scale rationale: the HAVING aggregate collapses lineitem map-side
    to order-cardinality BEFORE any join (integer quantity sums), the
    orders join is key-aligned on that same key, the customer dim
    broadcasts, and the final top-20 is a TakeOrderedAndProject with
    an orderkey tie-break.  One fact shuffle total.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 220)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_c"),
            "qty",
        )
        .orderBy(F.col("total_c").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by a scalar-MAX subquery over a view.
# ---------------------------------------------------------------------------


@register(
    "q_top_supplier",
    tags=("A1", "P5", "J4"),
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_rev_e4
FROM supplier s JOIN rev ON s.s_suppkey = rev.supplier_no
WHERE rev.total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
ORDER BY s.s_suppkey
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue,
    selected by comparing each supplier's revenue to a scalar MAX
    subquery over the same derived view — the
    reuse-one-aggregate-twice benchmark.  Revenue is exact 1e-4-unit
    integer (price×(1−discount) rounds once per line), so the MAX
    comparison has no float boundary and genuine ties all surface
    (ordered by supplier key).

    Scale rationale: the revenue view aggregates lineitem once
    (partial-agg, date filter pushed to the scan); Catalyst plans the
    scalar MAX as a 1-row subquery result reused against the SAME
    aggregated relation, and the supplier dim broadcasts.  At 100 TB
    the view materializes once — not once per reference — which this
    query shape exists to verify.
    """
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("total_rev_e4")
        )
    )
    s = _t(spark, sf_dir, "supplier")
    mx = rev.agg(F.max("total_rev_e4").alias("mx"))
    return (
        s.join(rev, s["s_suppkey"] == rev["supplier_no"])
        .join(F.broadcast(mx), rev["total_rev_e4"] == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev_e4")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-clause predicate over a join.
# ---------------------------------------------------------------------------


@register(
    "q_disjunctive_revenue",
    tags=("P2", "J4", "A1"),
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/
    quantity conjunct groups — the disjunctive-predicate benchmark
    that punishes engines which cannot (a) push the common
    `p_brand IN (…)` / size bounds down to the part scan or (b) keep
    the residual OR inside the join's codegen.

    Scale rationale: Catalyst extracts the disjuncts' common
    constraints (brand IN-list, size ≤ 50) below the join, so the part
    scan prunes; the join stays a single equi-join on partkey with the
    OR as residual — never a union of three scans.  Revenue is the
    exact 1e-4-unit integer used registry-wide.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long")
        ).alias("revenue_e4"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: top customers by returned-item revenue.
# ---------------------------------------------------------------------------


@register(
    "q_returned_revenue",
    tags=("J4", "A1", "O2", "P2"),
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS BIGINT) AS lost_rev_e4,
       CAST(COUNT(*) AS BIGINT) AS n_returned_lines
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_rev_e4 DESC, c.c_custkey LIMIT 20
""",
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    (returnflag = 'R'), with their nation — the returned-merchandise
    triage report and the canonical 4-table star join benchmark.

    Scale rationale: the returnflag filter pushes to the lineitem
    scan (dictionary-encoded column → row-group skipping); the
    order⋈lineitem fact join shuffles on the shared orderkey; customer
    and nation broadcast; the aggregate is partial and the top-20 a
    TakeOrderedAndProject with a custkey tie-break.  Revenue is the
    registry's exact 1e-4-unit integer.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                ).cast("long")
            ).alias("lost_rev_e4"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.col("lost_rev_e4").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Bounce rate: share of single-event user-days.
# ---------------------------------------------------------------------------


@register(
    "q_bounce_rate",
    tags=("A1", "W2", "FN-datetime"),
    oracle=f"""
{_EV}
, s AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY user_id, day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS bounce_ppm
FROM s GROUP BY day
""",
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of user-day sessions containing
    exactly one event, in integer ppm — the engagement-health metric
    every analytics dashboard leads with.

    Scale rationale: two stacked partial-aggregable groupBys (events →
    user-day sessions → day), both map-side combining; no window, no
    join.  Day bucketing and the ppm ratio are pure BIGINT ops.
    """
    e = _t(spark, sf_dir, "events")
    s = e.groupBy(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return s.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("n_events") == 1, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("n_bounces"),
        F.expr(
            "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000 "
            "div COUNT(*) AS BIGINT)"
        ).alias("bounce_ppm"),
    )
