"""Round-19 rotation stock (authored in round 12, third tranche): one
fresh shape for each family that the projected r13 panel (NOTES_r12.md
shortlist) would leave a SINGLE never-checked candidate — J1, J8, J10,
J11, O3, P3 and W4 — so the larder stays two panels deep through r14
without authoring mid-round, plus q_temperature_mix, a new
curation-family op (temperature-scaled multi-source sampling).  Same
program as plans/round10-18.py: every query is a different SHAPE from
its checked siblings (noted per docstring), integer-exact or
convention-pinned so the DuckDB twin hashes equal at any
partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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
# J1 — stream-static enrichment where the STATIC side is itself an
# aggregate (a per-user profile), not a stored dimension
# ---------------------------------------------------------------------------


@register(
    "q_stream_static_profile",
    tags=("J1", "A1", "P5"),
    oracle=f"""
{EV_CTE}
, prof AS (
  SELECT o_custkey,
         CASE WHEN COUNT(*) >= 12 THEN 'heavy'
              WHEN COUNT(*) >= 9 THEN 'mid'
              ELSE 'light' END AS bucket
  FROM orders GROUP BY o_custkey
)
SELECT event_type, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM ev JOIN prof ON user_id = o_custkey
GROUP BY event_type, bucket
""",
)
def q_stream_static_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join whose static side is a DERIVED per-user
    profile (order-count bucket aggregated from a second fact table),
    not a stored dimension — the feature-store enrichment shape.  The
    checked J1 siblings join stored dims (customer, nation) or
    left-join with defaults; aggregating the static side first is the
    pattern that keeps the broadcast small at 100 TB (profile rows ≤
    distinct users, far below order rows).  Bucket cuts (9/12) sit
    inside the per-tier orders-per-customer spread (min 1-2, median
    10, max 18-25 across sf0.001-0.1), so all three buckets are
    non-vacuous at every tier."""
    e = _t(spark, sf_dir, "events")
    prof = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "o_custkey",
            F.when(F.col("_n") >= 12, F.lit("heavy"))
            .when(F.col("_n") >= 9, F.lit("mid"))
            .otherwise(F.lit("light"))
            .alias("bucket"),
        )
    )
    return (
        e.join(prof, e["user_id"] == prof["o_custkey"])
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# J8 — BACKWARD as-of with a tolerance bound (the match expires)
# ---------------------------------------------------------------------------

_ASOF_BACKWARD_TOL_US = 24 * 3600 * 1_000_000  # 24 h


@register(
    "q_asof_backward_tol",
    tags=("J8", "W2"),
    oracle=f"""
{EV_CTE}
, u AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         CASE WHEN event_type = 'click' THEN event_id END AS c_id,
         CASE WHEN event_type = 'error' THEN event_id END AS e_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
  FROM ev WHERE event_type IN ('click', 'error')
), w AS (
  SELECT user_id, t_us, e_id,
         last_value(c_id IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t_us, kind
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
         last_value(CASE WHEN c_id IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_us, kind
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prev_t
  FROM u
)
SELECT user_id, CAST(e_id AS BIGINT) AS error_id,
       CAST(CASE WHEN t_us - prev_t <= {_ASOF_BACKWARD_TOL_US}
                 THEN prev_id END AS BIGINT) AS match_id,
       CAST(CASE WHEN t_us - prev_t <= {_ASOF_BACKWARD_TOL_US}
                 THEN t_us - prev_t END AS BIGINT) AS gap_us
FROM w WHERE e_id IS NOT NULL
""",
)
def q_asof_backward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKWARD as-of with a tolerance: each error matched to the
    user's most recent PRIOR click, but only if it happened within the
    last 24 h — older matches expire to NULL (pandas merge_asof's
    ``direction='backward', tolerance=...``).  The checked J8 siblings
    are plain backward, forward-with-tolerance, and nearest; the
    expiring-backward form is the session-attribution shape.  One
    shuffle on the user key (tagged union + running window), no join;
    clicks sort before errors at equal µs so a same-instant click is a
    gap-0 match in both engines.  24 h splits matched/unmatched
    non-vacuously at every tier (85/116 at sf0.001 → 7.0k/12.8k at
    sf0.1)."""
    e = _t(spark, sf_dir, "events")
    u = e.filter(F.col("event_type").isin("click", "error")).select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "c_id"
        ),
        F.when(F.col("event_type") == "error", F.col("event_id")).alias(
            "e_id"
        ),
        F.when(F.col("event_type") == "click", F.lit(0))
        .otherwise(F.lit(1))
        .alias("kind"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c_t = F.when(F.col("c_id").isNotNull(), F.col("t_us"))
    w = u.select(
        "user_id",
        "t_us",
        "e_id",
        F.last("c_id", ignorenulls=True).over(back).alias("prev_id"),
        F.last(c_t, ignorenulls=True).over(back).alias("prev_t"),
    ).filter(F.col("e_id").isNotNull())
    in_tol = (F.col("t_us") - F.col("prev_t")) <= F.lit(
        _ASOF_BACKWARD_TOL_US
    )
    return w.select(
        "user_id",
        F.col("e_id").alias("error_id"),
        F.when(in_tol, F.col("prev_id")).alias("match_id"),
        F.when(in_tol, F.col("t_us") - F.col("prev_t"))
        .cast("long")
        .alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# J10 — RIGHT outer join preserving the dimension side
# ---------------------------------------------------------------------------


@register(
    "q_unsold_parts_right",
    tags=("J10", "A1", "FN-datetime"),
    oracle=f"""
WITH li AS (
  SELECT l_partkey, l_extendedprice, l_discount FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1996-01-01'
)
SELECT p_brand,
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_sold,
       {oracle_exact_sum('l_extendedprice * (1 - l_discount)', VALUE)}
         AS revenue
FROM li RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q_unsold_parts_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT outer join preserving the DIMENSION side: every part kept
    even when the 1995 shipment slice sold none of it, so per-brand
    n_parts vs n_sold exposes the unsold tail (6/26/244 unsold parts
    across sf0.001-0.1 — the outer leg is non-vacuous at every tier).
    The checked J10 siblings are left joins against calendars
    (gap-fill/interpolate) and a dims-grid outer; an explicit RIGHT
    join with the fact table on the LEFT is the facet Spark plans as
    its own join type (and flips to a left join under AQE only when
    legal).  Revenue sums exactly at the 6-dp scale (price 2 dp ×
    (1 − discount) 4 dp); all-NULL brands agree as NULL in both
    engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"], "right")
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.countDistinct("l_partkey").alias("n_sold"),
            exact_sum(rev, VALUE).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J11 — bounded region × quarter coverage grid
# ---------------------------------------------------------------------------


@register(
    "q_region_quarter_grid",
    tags=("J11", "J5", "A1", "FN-datetime"),
    oracle="""
WITH grid AS (
  SELECT r_name, q FROM region CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS q)
), f AS (
  SELECT r_name, CAST(quarter(o_orderdate) AS INT) AS q,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    AND o_orderdate <  TIMESTAMP '2001-01-01'
  GROUP BY r_name, quarter(o_orderdate)
)
SELECT g.r_name, CAST(g.q AS INT) AS qtr,
       COALESCE(f.n, 0) AS n_orders
FROM grid g LEFT JOIN f ON g.r_name = f.r_name AND g.q = f.q
""",
)
def q_region_quarter_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region × calendar-quarter coverage matrix for year-2000 orders:
    a bounded 5×4 grid (5 regions cross a GENERATED quarter sequence)
    left-joined onto the 3-dim-deep fact rollup, zero-filled — the
    report shape that must show empty cells.  The checked J11 siblings
    grid stored categorical pairs (nation × status, region ×
    priority); generating one axis with ``sequence`` + explode and
    reaching the other through a customer→nation→region join chain is
    the new facet.  The cross join multiplies two dims-only relations
    (≤ 5 rows each) — bounded by construction; the fact side joins on
    equi keys only."""
    r = _t(spark, sf_dir, "region").select("r_name")
    quarters = (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(1), F.lit(4))).alias("q"))
        .select(F.col("q").cast("int").alias("qtr"))
    )
    grid = r.crossJoin(F.broadcast(quarters))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    f = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(reg, n["n_regionkey"] == reg["r_regionkey"])
        .groupBy(
            reg["r_name"].alias("f_name"),
            F.quarter("o_orderdate").cast("int").alias("f_qtr"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(
            f,
            (grid["r_name"] == f["f_name"]) & (grid["qtr"] == f["f_qtr"]),
            "left",
        )
        .select(
            "r_name",
            "qtr",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# O3 — HASH-bucketed layout (repartition by key, not by range)
# ---------------------------------------------------------------------------


@register(
    "q_hash_bucket_layout",
    tags=("O3", "T5", "P2"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_suppkey,
       CAST(l_shipdate AS TIMESTAMP) AS l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
""",
)
def q_hash_bucket_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-bucketed write layout: ``repartition(8, l_suppkey)`` +
    ``sortWithinPartitions(l_suppkey, l_shipdate)`` over the 1998
    shipment slice — the bucketed-table writer shape (co-locates a
    future supplier equi-join with zero shuffle, and clusters each
    bucket file for supplier+date range scans).  The checked O3
    siblings all range-partition (stored, z-order, derived-month,
    composite keys); hashing the key is the other half of the layout
    toolbox and the one bucketing uses.  Content pinned by the
    order-insensitive oracle hash: layout ops must never change the
    row set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    m = li.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate", "l_quantity"
    )
    return m.repartition(8, "l_suppkey").sortWithinPartitions(
        "l_suppkey", "l_shipdate"
    )


# ---------------------------------------------------------------------------
# P3 — JSON parsed as a MAP (schema-free key space), not a struct/path
# ---------------------------------------------------------------------------


@register(
    "q_json_map_parse",
    tags=("P3", "FN-map", "A1"),
    oracle=f"""
{EV_CTE}
, k AS (
  SELECT event_type, UNNEST(json_keys(props)) AS key,
         CAST(props->>'$.k' AS BIGINT) AS kval,
         len(json_keys(props)) AS n_keys
  FROM ev
)
SELECT event_type,
       CAST(COUNT(DISTINCT key) AS BIGINT) AS n_distinct_keys,
       CAST(SUM(kval) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN n_keys = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_key
FROM k GROUP BY event_type
""",
)
def q_json_map_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsed as a MAP<string,bigint> — the schema-free form for
    payloads whose key space isn't known up front — then interrogated
    with map functions (map_keys exploded for the distinct-key count,
    a key lookup summed, size() filtered).  The checked P3 siblings
    parse to a typed struct, extract by path, or exercise malformed
    rows; map-typed ``from_json`` is the remaining parse mode and the
    one log pipelines use before schema inference.  Integer values sum
    exactly; the per-row key explode matches DuckDB's
    ``UNNEST(json_keys(...))``."""
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("pm"),
    ).select(
        "event_type",
        F.explode(F.map_keys("pm")).alias("key"),
        F.col("pm")["k"].alias("kval"),
        F.size("pm").alias("n_keys"),
    )
    return m.groupBy("event_type").agg(
        F.countDistinct("key").alias("n_distinct_keys"),
        F.sum("kval").cast("long").alias("sum_k"),
        F.sum(F.when(F.col("n_keys") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_single_key"),
    )


# ---------------------------------------------------------------------------
# W4 — top-k per group over a JOINED grouping key
# ---------------------------------------------------------------------------


@register(
    "q_top_parts_per_nation",
    tags=("W4", "J4", "A1"),
    oracle=f"""
WITH rev AS (
  SELECT n_name, l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                             * 1000000.0) AS BIGINT)) AS BIGINT)
           AS rev_micros
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_partkey
)
SELECT n_name, CAST(l_partkey AS BIGINT) AS partkey, rev_micros
FROM rev
QUALIFY row_number() OVER
  (PARTITION BY n_name ORDER BY rev_micros DESC, l_partkey) <= 2
""",
)
def q_top_parts_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 revenue parts per SUPPLIER NATION — top-k per group where
    the grouping key arrives through a two-dim join chain
    (supplier→nation) rather than living on the fact row, the shape
    that forces the partial agg to run on the joined relation.  The
    checked W4 siblings rank stored keys (users, documents, baskets).
    Revenue is carried as the exact integer micro-unit sum (6-dp scale:
    price 2 dp × (1 − discount) 4 dp), so the ORDER BY that picks the
    top 2 is integer-deterministic; ties break on partkey.  Spark
    executes the rank-filter as a WindowGroupLimit (top-k per group
    never materializes the full ranking)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev_micros = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000.0
    ).cast("long")
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(rev_micros).alias("rev_micros"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("rev_micros").desc(), "l_partkey"
    )
    return (
        rev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
        .select(
            "n_name",
            F.col("l_partkey").alias("partkey"),
            F.col("rev_micros").cast("long").alias("rev_micros"),
        )
    )


# ---------------------------------------------------------------------------
# X5 — temperature-scaled source mixing (the pretraining data recipe)
# ---------------------------------------------------------------------------


@register(
    "q_temperature_mix",
    tags=("X5", "A1", "FN-math"),
    oracle="""
WITH st AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(floor(sqrt(COUNT(*)) * 1000000.0) AS BIGINT) AS s_int
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(SUM(s_int) AS BIGINT) AS sum_s,
         CAST(SUM(n_docs) AS BIGINT) AS n_total
  FROM st
), d AS (
  SELECT lang,
         CAST(('0x' || substr(md5('mix7:' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) AS u32
  FROM documents
)
SELECT d.lang, st.n_docs,
       CAST(SUM(CASE WHEN CAST(u32 AS HUGEINT)
                          * CAST(sum_s AS HUGEINT)
                          * CAST(st.n_docs AS HUGEINT)
                        < CAST(s_int AS HUGEINT)
                          * CAST(n_total // 2 AS HUGEINT)
                          * CAST(4294967296 AS HUGEINT)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM d JOIN st USING (lang) CROSS JOIN tot
GROUP BY d.lang, st.n_docs
""",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing — the multi-source sampling
    recipe pretraining mixes use (upweight minority sources relative
    to their natural share): target share q_s ∝ n_s^T with T = 0.5,
    sample half the corpus, so source s keeps each doc with rate
    r_s = (√n_s / Σ√n) · (N/2) / n_s.  On this corpus the en majority
    (~40 %) keeps ~36 % of its docs while each minority language keeps
    ~59 % — the flattening T exists to produce.

    Engine-portable determinism, same discipline as q_shard_assign:
    the per-doc uniform is the first 8 hex chars of md5('mix7:'‖id)
    (a 32-bit integer both engines parse identically), and the
    acceptance test u/2³² < r_s is cleared of ALL float arithmetic by
    cross-multiplying into one exact integer comparison
    u·Σs·n_s < s·⌊N/2⌋·2³² evaluated in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — no float sum across sources (5-double Σ is
    order-dependent!), no pow() convention risk: the only float step
    is ⌊√n·10⁶⌋ per source, one correctly-rounded op in both engines.
    Rates above 1 degrade gracefully to keep-everything (no cap
    needed: the inequality is vacuously true).

    Scale: two passes — a partial-agg'd per-source count (tiny), then
    one scan with the broadcast stats joined on; the 1-row totals
    relation is a scalar-broadcast BNLJ (allowlisted).  At 100 TB the
    per-source stats are a handful of rows regardless of corpus
    size."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    st = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    st = st.withColumn(
        "s_int", F.floor(F.sqrt("n_docs") * 1000000.0).cast("long")
    )
    tot = st.agg(
        F.sum("s_int").alias("sum_s"),
        F.sum("n_docs").alias("n_total"),
    )
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix7:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    j = (
        d.join(F.broadcast(st), "lang")
        .join(F.broadcast(tot))
        .withColumn("u32", u32)
    )
    dec = "decimal(38,0)"
    accept = (
        F.col("u32").cast(dec)
        * F.col("sum_s").cast(dec)
        * F.col("n_docs").cast(dec)
    ) < (
        F.col("s_int").cast(dec)
        * F.expr("n_total div 2").cast(dec)
        * F.lit(4294967296).cast(dec)
    )
    return j.groupBy("lang", "n_docs").agg(
        F.sum(F.when(accept, 1).otherwise(0)).cast("long").alias("n_kept")
    )
