"""Round-10 additions: fresh oracle-checked queries in the §2
families whose existing members have ALL already earned driver
CORRECTNESS rows (A4, A6, A7, A9, P4, J6, FN-map).  The driver
hash-checks only the first 50 registry entries per round, and by r10
these families had no never-checked member left to rotate in — so the
rotation program itself (plans/registry.py CURATED_FIRST docstring)
needs new members here to keep earning hard signal while the panel
cycles the long tail.  Each query is a genuinely different surface
from its checked siblings (grouping_id bitmask vs per-column
GROUPING; sum-pivot vs count-pivot; 2h/1h keyed sliding windows vs
1h/30m global; 10-min gap sessions with exact value sums vs 5-min
counts; floor-guarded overflow casts vs string try_casts; a
broadcast band (theta range) join vs point theta joins; the
map_filter/map_zip_with/map_concat HOF trio vs transform_keys).
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
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A4 — rollup with the combined grouping_id bitmask
# ---------------------------------------------------------------------------


@register(
    "q_rollup_orders",
    tags=("A4", "A1"),
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP disambiguated by the combined ``grouping_id()`` BITMASK
    (one long per row) rather than per-column GROUPING() flags
    (q_rollup/q_cube) — the form BI layers emit.  The oracle rebuilds
    the bitmask from DuckDB's per-column GROUPING()."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        exact_sum("o_totalprice", MONEY).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A9 — pivot with a SUM aggregate (q_pivot pivots counts)
# ---------------------------------------------------------------------------

_PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]
_PRIORITY_ALIASES = ["urgent", "high", "medium", "notspec", "low"]


@register(
    "q_pivot_priority",
    tags=("A9", "A1"),
    oracle="""
SELECT o_orderstatus,
       """
    + ",\n       ".join(
        oracle_exact_sum(
            f"CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END",
            MONEY,
        )
        + f" AS {a}"
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
    )
    + """
FROM orders
GROUP BY o_orderstatus
""",
)
def q_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot REVENUE (not counts — q_pivot covers that) to one column
    per order priority, explicit value list for a static schema, then
    rename to SQL-safe aliases.  Same exact fixed-point sum as every
    other money aggregate, so the hash compare is bit-stable."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(exact_sum("o_totalprice", MONEY))
    )
    renamed = piv
    for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES):
        renamed = renamed.withColumnRenamed(p, a)
    return renamed


# ---------------------------------------------------------------------------
# A6 — keyed sliding window (2 h window, 1 h slide, per event type)
# ---------------------------------------------------------------------------

_SLIDE10_US = 60 * 60 * 1_000_000  # 1 h in µs


@register(
    "q_sliding_type_windows",
    tags=("A6", "A1"),
    oracle=f"""
WITH ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
  FROM events
), starts AS (
  SELECT event_type, value,
         make_timestamp((epoch_us(ts) // {_SLIDE10_US}) * {_SLIDE10_US}) AS s1,
         make_timestamp((epoch_us(ts) // {_SLIDE10_US}) * {_SLIDE10_US}
                        - {_SLIDE10_US}) AS s2
  FROM ev
)
SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM (
  SELECT unnest([s1, s2]) AS window_start,
         unnest([event_type, event_type]) AS event_type,
         unnest([value, value]) AS value
  FROM starts
)
GROUP BY window_start, event_type
""",
)
def q_sliding_type_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding hourly, KEYED by event type (the checked
    A6 sibling q_events_sliding is global 1h/30m) — each event lands
    in exactly 2 windows, which the oracle expands explicitly."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# A7 — session window with exact value sums (10-minute gap)
# ---------------------------------------------------------------------------


@register(
    "q_session_value",
    tags=("A7", "A1"),
    oracle=f"""
WITH ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id, value
  FROM events
), flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {oracle_exact_sum('value', VALUE)} AS session_value
FROM sessions
GROUP BY user_id, sid
""",
)
def q_session_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization at a 10-minute gap carrying an EXACT
    per-session value sum (the checked sibling q_session_window counts
    a 5-minute gap).  Oracle: lag/cumsum session assignment."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", VALUE).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


# ---------------------------------------------------------------------------
# P4 — cast battery over numeric/temporal edges
# ---------------------------------------------------------------------------


@register(
    "q_cast_battery2",
    tags=("P4", "P5"),
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(len(CAST(o_orderkey AS VARCHAR)) AS INT) AS key_len,
       TRY_CAST(o_orderstatus AS BOOLEAN) AS status_bool,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_rt,
       TRY_CAST(FLOOR(o_totalprice) AS SMALLINT) AS price_small
FROM orders
""",
)
def q_cast_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric/temporal cast edges the checked sibling (q_try_casts —
    string coercions) does not touch: timestamp→date truncation,
    timestamp→epoch seconds, int→string length, an always-NULL
    try_cast to boolean, a decimal(12,2) round-trip (exact — the
    column carries 2 decimals), and an overflow-guarded smallint cast.
    The smallint cast floors FIRST on both sides: Spark truncates
    in-range fractional casts where DuckDB rounds, so the fraction
    must be gone before the cast for the oracle to be meaningful."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_date"),
        F.col("o_orderdate").cast("long").alias("epoch_s"),
        F.length(F.col("o_orderkey").cast("string")).alias("key_len"),
        F.col("o_orderstatus").try_cast("boolean").alias("status_bool"),
        F.col("o_totalprice")
        .cast("decimal(12,2)")
        .cast("double")
        .alias("price_rt"),
        F.floor("o_totalprice").try_cast("smallint").alias("price_small"),
    )


# ---------------------------------------------------------------------------
# J6 — broadcast band join (range-predicate theta join)
# ---------------------------------------------------------------------------

_BANDS = [
    ("small", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("large", 150_000.0, 300_000.0),
    ("jumbo", 300_000.0, 1e12),
]


@register(
    "q_band_join",
    tags=("J6", "A1"),
    oracle=f"""
WITH bands(band, lo, hi) AS (
  VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)}
)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS revenue
FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""",
)
def q_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join of the fact table against a tiny BAND dimension on a
    range predicate (lo <= price < hi) — the binning-by-join shape.
    The band side is 4 rows and explicitly broadcast, so the plan is a
    BroadcastNestedLoopJoin streaming the fact side once; at 100 TB
    this is the only sane physical strategy for a non-equi predicate
    and Spark picks it because we declared the small side."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        _BANDS, "band string, lo double, hi double"
    )
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# FN-map — map_filter / map_zip_with / map_concat
# ---------------------------------------------------------------------------


@register(
    "q_map_battery2",
    tags=("FN-map",),
    oracle="""
SELECT doc_id,
       CAST((CASE WHEN len(string_split(text, ' ')) > 40 THEN 1 ELSE 0 END
           + CASE WHEN n_chars > 40 THEN 1 ELSE 0 END) AS INT) AS n_big,
       CAST(len(string_split(text, ' ')) * 2 AS BIGINT) AS toks_x2,
       CAST(n_chars * 3 AS BIGINT) AS chars_x3,
       CAST(len(lang) AS BIGINT) AS lang_len,
       'chars,lang,toks' AS keys_sorted
FROM documents WHERE doc_id < 200
""",
)
def q_map_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map-HOF trio the checked FN-map siblings don't cover:
    map_filter (count of entries above a bound), map_zip_with
    (per-key multipliers), map_concat (+ map_keys/array_sort for a
    deterministic key listing).  Outputs are extracted to scalars —
    map cells don't hash — and the oracle recomputes the arithmetic
    directly from the base columns."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    m1 = F.create_map(
        F.lit("toks"), F.size(F.split("text", " ")).cast("long"),
        F.lit("chars"), F.col("n_chars"),
    )
    big = F.map_filter(m1, lambda _, v: v > 40)
    mult = F.create_map(
        F.lit("toks"), F.lit(2).cast("long"),
        F.lit("chars"), F.lit(3).cast("long"),
    )
    scaled = F.map_zip_with(m1, mult, lambda _, v, m: v * m)
    both = F.map_concat(m1, F.create_map(F.lit("lang"), F.length("lang").cast("long")))
    return d.select(
        "doc_id",
        F.size(big).alias("n_big"),
        F.element_at(scaled, "toks").alias("toks_x2"),
        F.element_at(scaled, "chars").alias("chars_x3"),
        F.element_at(both, "lang").alias("lang_len"),
        F.array_join(F.array_sort(F.map_keys(both)), ",").alias(
            "keys_sorted"
        ),
    )
