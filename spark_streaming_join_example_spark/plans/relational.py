"""Batch relational surface (SURVEY.md §2.2-2.8).

Each query is declared with the DataFrame DSL (Catalyst owns pushdown,
pruning, join selection) and carries a DuckDB-SQL oracle twin.  Column
aliases match exactly between both formulations — the driver's value
hash sorts columns by name.

Scale notes are inline per query; the common ones:
- dimension joins (region/nation/supplier/customer) are broadcast —
  no shuffle of the fact side;
- fact-fact joins rely on SMJ + AQE (skew split, partition coalesce);
- double aggregates use functions.numeric exact sums → results are
  partitioning-independent (same answer on 1 core or 1000 executors).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.numeric import (
    MONEY,
    RATE,
    VALUE,
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
)
from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A1/P1/P2 — hash aggregate with filter (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_PRICING_CUTOFF = "2000-12-01"


@register(
    "q_pricing_summary",
    tags=("A1", "P1", "P2"),
    bench=True,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {oracle_exact_sum('l_quantity', MONEY)} AS sum_qty,
       {oracle_exact_sum('l_extendedprice', MONEY)} AS sum_base_price,
       {oracle_exact_sum('l_extendedprice * (1 - l_discount)', VALUE)} AS sum_disc_price,
       {oracle_exact_avg('l_quantity', MONEY)} AS avg_qty,
       {oracle_exact_avg('l_extendedprice', MONEY)} AS avg_price,
       {oracle_exact_avg('l_discount', RATE)} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_PRICING_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filtered scan → partial+final hash agg.

    Scale: predicate + the 5 needed columns push into the parquet scan;
    map-side partial agg means the shuffle carries ≤ (groups × partitions)
    rows regardless of input size.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_PRICING_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", MONEY).alias("sum_qty"),
            exact_sum("l_extendedprice", MONEY).alias("sum_base_price"),
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), VALUE
            ).alias("sum_disc_price"),
            exact_avg("l_quantity", MONEY).alias("avg_qty"),
            exact_avg("l_extendedprice", MONEY).alias("avg_price"),
            exact_avg("l_discount", RATE).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J4/J5 — multi-way equi-join (TPC-H Q3 shape); the flagship
# ---------------------------------------------------------------------------


@register(
    "q_revenue_join3",
    tags=("J4", "J5", "A1"),
    bench=True,
    oracle=f"""
SELECT c_mktsegment,
       {oracle_exact_sum('l_extendedprice * (1 - l_discount)', VALUE)} AS revenue,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate  <  TIMESTAMP '1997-07-01'
GROUP BY c_mktsegment
""",
)
def q_revenue_join3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment: customer ⋈ orders ⋈ lineitem.

    Scale: customer is broadcast (≤ a few GB even at 100 TB TPC-H);
    orders⋈lineitem is the big join — equi-keys shuffle-partition both
    sides, AQE handles skew. Date filters push to both scans before the
    join, shrinking shuffle input.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), VALUE
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — broadcast-hash star join through the dimension chain
# ---------------------------------------------------------------------------


@register(
    "q_broadcast_enrich",
    tags=("J3", "J5", "A1"),
    oracle=f"""
SELECT r_name, n_name,
       {oracle_exact_sum('l_extendedprice * (1 - l_discount)', VALUE)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema enrichment: fact ⋈ 3 broadcast dims, zero fact shuffles
    before aggregation.

    Scale: supplier/nation/region stay broadcast-able at any TPC-H SF
    relative to lineitem; the only shuffle is the final 25-group agg.
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)  # bounded: region is a 5-row constant dimension
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), VALUE
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# P1/P2/P5 — projection, predicate, CASE WHEN
# ---------------------------------------------------------------------------


@register(
    "q_filter_project_case",
    tags=("P1", "P2", "P5"),
    oracle=f"""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
            ELSE 'low' END AS priority_class,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {oracle_exact_sum('o_totalprice', MONEY)} AS total_spend
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
GROUP BY 1
""",
)
def q_filter_project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + computed CASE column + agg; predicates push to the scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0))
        .withColumn(
            "priority_class",
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
            )
            .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
            .otherwise("low"),
        )
        .groupBy("priority_class")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice", MONEY).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# O1/O2 — global top-k (TakeOrderedAndProject)
# ---------------------------------------------------------------------------


@register(
    "q_top_orders",
    tags=("O1", "O2"),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price; unique-key tiebreak keeps it deterministic.

    Scale: orderBy().limit() compiles to TakeOrderedAndProject — per-
    partition top-k then a driver-side merge of k·partitions rows; no
    global sort materializes.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# W1/W4 — ranking window + top-k per group
# ---------------------------------------------------------------------------


@register(
    "q_window_rank",
    tags=("W1", "W4"),
    bench=True,
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number.

    Scale: rank-filter `rn <= k` triggers Catalyst's
    InferWindowGroupLimit — per-partition group-limit before the window
    sort, so state stays bounded per key.
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# W2 — analytic window (lag)
# ---------------------------------------------------------------------------


@register(
    "q_window_lag",
    tags=("W2",),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS prev_price,
       o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS price_diff
FROM orders
""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-over-order price delta (lag)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        (F.col("o_totalprice") - prev).alias("price_diff"),
    )


# ---------------------------------------------------------------------------
# W3 — window frame (running sum)
# ---------------------------------------------------------------------------


@register(
    "q_window_frame",
    tags=("W3",),
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 AS running_spend
FROM orders
""",
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend with an explicit ROWS frame (exact
    integer accumulation → partitioning-independent)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = F.round(F.col("o_totalprice") * F.lit(100.0)).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w).cast("double") / F.lit(100.0)).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# J9 — left-anti / left-semi
# ---------------------------------------------------------------------------


@register(
    "q_anti_join",
    tags=("J9",),
    oracle=f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_silent_customers,
       {oracle_exact_sum('c_acctbal', MONEY)} AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
GROUP BY c_mktsegment
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with zero events (left-anti) — also the corpus-dedup
    primitive (drop rows already present in another set)."""
    c = _t(spark, sf_dir, "customer")
    e = _t(spark, sf_dir, "events")
    return (
        c.join(e, c.c_custkey == e.user_id, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_silent_customers"),
            exact_sum("c_acctbal", MONEY).alias("total_acctbal"),
        )
    )


@register(
    "q_semi_join",
    tags=("J9", "J3"),
    oracle="""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY n_name
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 urgent order (left-semi), counted per nation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# J10 — outer join
# ---------------------------------------------------------------------------


@register(
    "q_outer_join",
    tags=("J10",),
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join; count(col) vs count(*) distinguishes null-padded
    rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# J6 — theta (non-equi) join
# ---------------------------------------------------------------------------


@register(
    "q_theta_join",
    tags=("J6",),
    oracle="""
SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_foreign_nations
FROM region JOIN nation ON n_regionkey <> r_regionkey
GROUP BY r_name
""",
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi join → BroadcastNestedLoopJoin; only sane when one
    side is tiny (both dims here)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, n.n_regionkey != r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_foreign_nations"))
    )


# ---------------------------------------------------------------------------
# J11 — cross join (bounded)
# ---------------------------------------------------------------------------


@register(
    "q_cross_join",
    tags=("J11",),
    oracle="""
SELECT r_name, o_orderpriority
FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
""",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (5 × 5); the dimension-scaffold pattern."""
    r = _t(spark, sf_dir, "region").select("r_name")
    p = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p)


# ---------------------------------------------------------------------------
# A4 — rollup with grouping indicators
# ---------------------------------------------------------------------------


@register(
    "q_rollup",
    tags=("A4",),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {oracle_exact_sum('l_quantity', MONEY)} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING() disambiguation of the
    NULL subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_quantity", MONEY).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# A9 — pivot
# ---------------------------------------------------------------------------


@register(
    "q_pivot",
    tags=("A9",),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
FROM orders
GROUP BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts to status columns (explicit value list so the
    output schema is static — required for any prod pipeline)."""
    o = _t(spark, sf_dir, "orders")
    piv = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).count()
    return piv.na.fill(0, ["O", "F", "P"])


# ---------------------------------------------------------------------------
# U1/U2/U3 — set operations
# ---------------------------------------------------------------------------


@register(
    "q_union_all",
    tags=("U1",),
    oracle=f"""
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS spend
FROM (
  SELECT 'urgent' AS label, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT 'bigticket' AS label, o_totalprice FROM orders WHERE o_totalprice > 400000.0
)
GROUP BY label
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two labeled branches (rows in both appear twice)."""
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("label"), "o_totalprice"
    )
    big = o.filter(F.col("o_totalprice") > 400000.0).select(
        F.lit("bigticket").alias("label"), "o_totalprice"
    )
    return (
        urgent.unionByName(big)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("spend"),
        )
    )


@register(
    "q_intersect_users",
    tags=("U2",),
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def q_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who clicked AND purchased (INTERSECT = distinct semantics)."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "q_except_users",
    tags=("U3",),
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
GROUP BY user_id HAVING COUNT(*) > 15
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
GROUP BY user_id HAVING COUNT(*) > 15
""",
)
def q_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy clickers who are not heavy purchasers (EXCEPT = distinct
    set-difference semantics, i.e. DataFrame.subtract)."""
    e = _t(spark, sf_dir, "events")

    def heavy(ev_type: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == ev_type)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 15)
            .select("user_id")
        )

    return heavy("click").subtract(heavy("purchase"))


# ---------------------------------------------------------------------------
# §2.8 — scalar function library
# ---------------------------------------------------------------------------


@register(
    "q_string_funcs",
    tags=("P1", "FN-string"),
    oracle="""
SELECT doc_id,
       upper(substring(text, 1, 12)) AS head_up,
       CAST(length(text) AS INT) AS n_len,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(strpos(text, 'spark') AS INT) AS spark_pos,
       CAST(levenshtein(lang, 'en') AS INT) AS lang_dist,
       lpad(lang, 5, '_') AS lang_pad,
       concat_ws('/', lang, source) AS lang_src
FROM documents
WHERE doc_id < 100
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: case, substring, length, split,
    position, edit distance, padding, concat."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_up"),
        F.length("text").alias("n_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.instr("text", "spark").alias("spark_pos"),
        F.levenshtein("lang", F.lit("en")).alias("lang_dist"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.concat_ws("/", "lang", "source").alias("lang_src"),
    )


@register(
    "q_datetime_scalar",
    tags=("P4", "FN-datetime"),
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(isodow(o_orderdate) - 1 AS INT) AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts
FROM orders
WHERE o_orderkey < 200
""",
)
def q_datetime_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function battery (weekday normalized to Monday=0 on
    both engines — Spark weekday ≡ DuckDB isodow-1)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.weekday("o_orderdate").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
    )


@register(
    "q_math_funcs",
    tags=("FN-math",),
    oracle="""
SELECT l_orderkey, l_linenumber,
       sqrt(l_quantity) AS sqrt_qty,
       round(ln(l_extendedprice), 6) AS log_price,
       round(pow(l_quantity, 1.5), 6) AS qty_pow,
       CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_floor,
       CAST(ceil(l_tax * 100.0) AS BIGINT) AS tax_ceil,
       abs(l_discount - l_tax) AS rate_gap,
       greatest(l_discount, l_tax) AS max_rate
FROM lineitem
WHERE l_orderkey < 100
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery; transcendentals rounded to 6dp (libm vs
    java.lang.Math may differ in the last ulp)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("qty_pow"),
        F.floor(F.col("l_discount") * 100.0).alias("disc_floor"),
        F.ceil(F.col("l_tax") * 100.0).alias("tax_ceil"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("rate_gap"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
    )


# ---------------------------------------------------------------------------
# P3 — JSON payload parsing (the canonical Kafka-payload step)
# ---------------------------------------------------------------------------


@register(
    "q_json_extract",
    tags=("P3",),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json over the events JSON payload — the parse step every
    Kafka pipeline runs after reading value:binary."""
    e = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# P4/P5 — casts + conditional bucketing
# ---------------------------------------------------------------------------


@register(
    "q_conditional_buckets",
    tags=("P4", "P5"),
    oracle="""
SELECT CASE WHEN value < 1.0 THEN 'tiny'
            WHEN value < 10.0 THEN 'small'
            WHEN value < 100.0 THEN 'mid'
            ELSE 'large' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1
""",
)
def q_conditional_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + floor-cast (floor first: Spark's double→int
    cast truncates while DuckDB's rounds — floor makes them agree)."""
    e = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 1.0, "tiny")
        .when(F.col("value") < 10.0, "small")
        .when(F.col("value") < 100.0, "mid")
        .otherwise("large")
    )
    return (
        e.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor("value").cast("long")).alias("sum_floor"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# A4 — cube + grouping sets
# ---------------------------------------------------------------------------


@register(
    "q_cube",
    tags=("A4",),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {oracle_exact_sum('l_extendedprice', MONEY)} AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (Catalyst
    expands to a single Expand + aggregate, not k scans)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_extendedprice", MONEY).alias("sum_price"),
    )


@register(
    "q_grouping_sets",
    tags=("A4",),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two rollup axes + grand total)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# W2 — full analytic-function battery
# ---------------------------------------------------------------------------


@register(
    "q_window_analytic",
    tags=("W2", "W3"),
    oracle="""
SELECT o_custkey, o_orderkey,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS last_price,
       nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS second_price,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value / last_value / nth_value / ntile over a
    deterministic per-customer ordering (full-frame variants use the
    explicit unbounded ROWS frame — the default frame stops at
    CURRENT ROW in both engines)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# W3 — RANGE frame (value-based moving window)
# ---------------------------------------------------------------------------


@register(
    "q_window_range_frame",
    tags=("W3",),
    oracle="""
SELECT o_custkey, o_orderkey, CAST(dd AS INT) AS dd,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY dd
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_orders_30d
FROM (
  SELECT o_custkey, o_orderkey,
         date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS dd
  FROM orders
)
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per customer, how many orders landed
    in the trailing 30 days (day-number ordering so RANGE is numeric
    and engine-portable)."""
    o = _t(spark, sf_dir, "orders")
    dd = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("dd")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.withColumn("dd", dd).select(
        "o_custkey",
        "o_orderkey",
        "dd",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


# ---------------------------------------------------------------------------
# DecimalType surface — exact decimal aggregation
# ---------------------------------------------------------------------------


@register(
    "q_decimal_agg",
    tags=("A1", "P4"),
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS dec_sum,
       CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS dec_min,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS dec_max
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType round-trip: cast 2dp doubles to DECIMAL(18,2),
    aggregate exactly, surface as double. (TPC-H canonical money is
    decimal; the fixtures store doubles — this is the bridge.)"""
    li = _t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(dec).cast("double").alias("dec_sum"),
        F.min(dec).cast("double").alias("dec_min"),
        F.max(dec).cast("double").alias("dec_max"),
    )


# ---------------------------------------------------------------------------
# §2.8 map functions
# ---------------------------------------------------------------------------


@register(
    "q_map_funcs",
    tags=("FN-map",),
    oracle="""
SELECT doc_id,
       CAST(SUM(CASE WHEN tok = 'spark' THEN 1 END) AS BIGINT) AS n_spark,
       CAST(COUNT(DISTINCT tok) AS INT) AS n_keys
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < 100
)
GROUP BY doc_id
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-doc token→count map built with
    map_from_entries, probed with element_at (NULL when absent) and
    sized with map_keys."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    maps = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("cnt")))
        ).alias("m")
    )
    return maps.select(
        "doc_id",
        F.element_at(F.col("m"), "spark").alias("n_spark"),
        F.size(F.map_keys(F.col("m"))).alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# O3 — sortWithinPartitions (physical-layout op; logical result unchanged)
# ---------------------------------------------------------------------------


@register(
    "q_sort_within_partitions",
    tags=("O3",),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_totalprice > 400000
""",
)
def q_sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartition(key) + sortWithinPartitions — the write-side layout
    pattern (clustered parquet files for downstream merge joins /
    row-group skipping). Logical row set is unchanged, so the
    order-insensitive oracle hash still checks it exactly."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(4, "o_custkey")
        .sortWithinPartitions("o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# A1 — exact percentiles (order statistics)
# ---------------------------------------------------------------------------


@register(
    "q_percentiles",
    tags=("A1",),
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Both engines use the
    linear-interpolation definition (lower + frac·(upper−lower)); 4dp
    rounding absorbs the last-ulp difference.

    Scale: exact percentile needs a per-group sort — fine when groups
    are few and fat (sort is distributed per group); at truly huge
    cardinality switch to approx_percentile (t-digest), cf. A3."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_extendedprice", F.lit(p)), 4).alias(f"p{int(p*100)}")
            for p in (0.25, 0.5, 0.75, 0.99)
        ]
    )


# ---------------------------------------------------------------------------
# A1 at 100 TB — explicit two-phase salted aggregation (skew armor)
# ---------------------------------------------------------------------------


@register(
    "q_salted_agg",
    tags=("A1", "T5"),
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000.0 AS sum_value
FROM events GROUP BY event_type
""",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: groupBy(key, salt) shards any hot
    key across `n_salt` reducers, then a second (tiny) groupBy(key)
    merges the shards. Same answer as the direct groupBy — the oracle
    proves it — but no single reducer ever owns a whole hot key.

    Spark's map-side partial agg already defuses count/sum skew, so
    this exists as the explicit pattern for the cases partial agg
    can't help (collect_list / exact distinct per hot key)."""
    ev = _t(spark, sf_dir, "events")
    n_salt = 8
    partial = (
        ev.withColumn("_salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(n_salt)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("_sv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("_n").alias("n"),
        (F.sum("_sv").cast("double") / F.lit(1e6)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# §2.8 array higher-order functions (transform/filter/exists/aggregate)
# ---------------------------------------------------------------------------


@register(
    "q_array_hof",
    tags=("FN-array",),
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       round(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                           x -> x * x), 'sum'), 4) AS sum_sq,
       len(list_filter(embedding, x -> x > 0.9)) > 0 AS has_big
FROM embeddings WHERE vec_id < 500
""",
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOFs staying entirely JVM-side: filter+size, a
    transform→aggregate fold (sum of squares), and exists — the
    lambda-expression surface Catalyst can still prune/pushdown
    around (unlike a Python UDF doing the same)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(emb_d, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sum_sq"),
        F.exists("embedding", lambda x: x > 0.9).alias("has_big"),
    )


# ---------------------------------------------------------------------------
# §3.2 — SQL entry point (same Catalyst pipeline, ANTLR front door)
# ---------------------------------------------------------------------------


@register(
    "q_sql_entry",
    tags=("A1", "J5"),
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY c_mktsegment
""",
)
def q_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) entry point (SURVEY §3.2): identical Catalyst
    pipeline as the DataFrame DSL from analysis onward — this query IS
    the proof (its oracle twin is near-verbatim the same SQL)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total
        FROM v_customer JOIN v_orders ON c_custkey = o_custkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        GROUP BY c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide → long)
# ---------------------------------------------------------------------------


@register(
    "q_unpivot",
    tags=("P1",),
    oracle="""
SELECT l_orderkey, l_linenumber, measure,
       round(val, 4) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'price' AS measure, l_extendedprice AS val
  FROM lineitem WHERE l_orderkey < 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount
  FROM lineitem WHERE l_orderkey < 200
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax
  FROM lineitem WHERE l_orderkey < 200
)
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide measure columns → (measure, val) rows — the
    inverse of pivot (A9). Narrow-then-shuffle beats shuffling wide."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        [
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
        ],
        "measure",
        "val",
    ).withColumn("val", F.round("val", 4))


# ---------------------------------------------------------------------------
# U2/U3 — multiset variants
# ---------------------------------------------------------------------------


@register(
    "q_intersect_all",
    tags=("U2",),
    oracle="""
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
INTERSECT ALL
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'click')
""",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll: bag semantics (min of the two multiplicities)."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    return views.intersectAll(clicks)


@register(
    "q_except_all",
    tags=("U3",),
    oracle="""
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
EXCEPT ALL
SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'purchase')
""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll: bag difference (multiplicities subtract)."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.exceptAll(buys)


# ---------------------------------------------------------------------------
# A1 — dispersion from exact integer moments (engine-portable stddev)
# ---------------------------------------------------------------------------


@register(
    "q_variance",
    tags=("A1",),
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       round((CAST(SUM(n_chars * n_chars) AS DOUBLE)
              - CAST(SUM(n_chars) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) - 1), 6) AS var_chars,
       round(sqrt((CAST(SUM(n_chars * n_chars) AS DOUBLE)
              - CAST(SUM(n_chars) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) - 1)), 6) AS std_chars
FROM documents GROUP BY lang
""",
)
def q_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev built from exact integer moments
    (Σx, Σx², both bigint-exact for int inputs) and finished with the
    same double formula on both engines — engine-portable where the
    built-in stddev (Welford vs naive accumulation) is not, and
    partitioning-independent like every sum here."""
    d = _t(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("_s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("_s2"),
    )
    nn = F.col("n").cast("double")
    var = (F.col("_s2").cast("double") - F.col("_s").cast("double") * F.col("_s").cast("double") / nn) / (nn - 1)
    return g.select(
        "lang",
        "n",
        F.round(var, 6).alias("var_chars"),
        F.round(F.sqrt(var), 6).alias("std_chars"),
    )


# ---------------------------------------------------------------------------
# A1 — collect_set (deterministic via sort_array)
# ---------------------------------------------------------------------------


@register(
    "q_collect_set",
    tags=("A1", "FN-array"),
    oracle="""
SELECT lang,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
       CAST(len(list(DISTINCT source)) AS INT) AS n_sources
FROM documents GROUP BY lang
""",
)
def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set made deterministic: set semantics kill duplicate
    sensitivity, sort_array kills accumulation-order sensitivity, and
    array_join serializes to a scalar string — the only cell shape
    every hasher (including the verification driver's) can take.
    Array-typed output cells are a hash trap; registered queries
    always serialize them."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.size(F.collect_set("source")).alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# J4/A1 — TPC-H Q14-like promo revenue share (exercises `part`)
# ---------------------------------------------------------------------------


@register(
    "q_promo_revenue",
    tags=("J4", "A1", "P5"),
    oracle=f"""
SELECT CAST(date_part('year', l_shipdate) AS INT) AS ship_year,
       round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                  * 1000000.0) AS BIGINT) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 1000000.0) AS BIGINT)) AS DOUBLE), 6)
           AS promo_share_pct,
       {oracle_exact_sum('l_extendedprice * (1 - l_discount)', VALUE)} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share per ship-year (TPC-H Q14 shape): fact⋈part
    join + conditional aggregation. `part` broadcasts at fixture SFs;
    at TPC-H SF100k it's a shuffled hash join on l_partkey where AQE
    splits the popular-part skew. Ratio built from two exact integer
    sums → one double divide, engine-portable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 1e6
    ).cast("long")
    j = li.join(p, li.l_partkey == p.p_partkey)
    return (
        j.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct"),
            (F.sum(rev).cast("double") / F.lit(1e6)).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# P3 — from_json into MapType + regexp_extract_all
# ---------------------------------------------------------------------------


@register(
    "q_json_map",
    tags=("P3", "FN-map"),
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INT) AS k_val,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE event_id < 5000
GROUP BY 1
""",
)
def q_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a MAP<STRING,INT> schema (schema-free payload
    keys — the Kafka-payload shape when producers add fields), probed
    with element_at."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    m = F.from_json("props", "map<string,int>")
    return (
        e.select(F.element_at(m, "k").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_regexp_extract_all",
    tags=("FN-string", "X5"),
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, 's[a-z]+', 0)) AS INT) AS n_s,
       array_to_string(list_sort(list_distinct(
           regexp_extract_all(text, 's[a-z]+', 0))), ',') AS s_words
FROM documents WHERE doc_id < 200
""",
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all → array ops: every s-word occurrence per
    doc, counted and listed deterministically (sorted, distinct).
    Group index pinned to 0 explicitly: Spark defaults to capture
    group 1, DuckDB to the whole match — a classic cross-engine trap."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.regexp_extract_all("text", F.lit("s[a-z]+"), 0)
    return d.select(
        "doc_id",
        F.size(words).alias("n_s"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("s_words"),
    )


# ---------------------------------------------------------------------------
# P3 — VariantType (Spark 4 semi-structured type)
# ---------------------------------------------------------------------------


@register(
    "q_variant_extract",
    tags=("P3",),
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY 1
""",
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType (Spark 4): parse_json → open-schema binary variant,
    typed extraction with variant_get. The semi-structured path for
    payloads whose schema you DON'T pin up front (vs from_json, which
    needs one) — variant keeps shredded binary, so extraction is
    columnar, not string re-parsing, at every downstream use."""
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q_string_agg",
    tags=("A1", "FN-string"),
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
           AS priorities,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
""",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: distinct → sort → join.
    (Raw LISTAGG/string_agg is accumulation-order-dependent — in a
    distributed engine that means partitioning-dependent — so the
    engine's contract is the sorted-distinct form.)"""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# J4 at 100 TB — explicit salted skew join (the join twin of q_salted_agg)
# ---------------------------------------------------------------------------


@register(
    "q_salted_join",
    tags=("J4", "T5"),
    oracle=f"""
SELECT event_type, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('value', VALUE)} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY event_type, c_mktsegment
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted skew join: the fact side carries a deterministic
    salt in [0, S); the (small) build side is replicated S times via
    explode, and the join key becomes (key, salt) — any hot user_id is
    sharded across S reducers instead of melting one.  Result is
    provably identical to the plain join (every fact row still meets
    its one dim row, in exactly one salt shard), which is what the
    plain-join oracle checks.

    Scale: this is the manual armor for skew AQE cannot fix (e.g. a
    hot key inside one huge shuffle block on a sorted-bucketed table);
    replication factor S multiplies only the SMALL side.  Cf.
    q_salted_agg for the aggregation twin and SCALE.md for when to
    reach for which."""
    n_salt = 8
    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    fact = ev.withColumn(
        "_salt", F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(n_salt)).cast("int")
    )
    dim = c.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        fact.join(
            dim,
            (fact.user_id == dim.c_custkey) & (fact._salt == dim._salt),
        )
        .groupBy("event_type", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# J5 — six-table join chain (Catalyst join-ordering showcase)
# ---------------------------------------------------------------------------


@register(
    "q_market_join6",
    tags=("J5", "J3", "J4", "A1"),
    oracle=f"""
SELECT r_name,
       CAST(date_part('year', o_orderdate) AS INT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {oracle_exact_sum('l_extendedprice * (1 - l_discount)', VALUE)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE s_nationkey = c_nationkey
GROUP BY r_name, order_year
""",
)
def q_market_join6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table chain: two fact-fact equi-joins
    (lineitem⋈orders, ⋈customer) plus three broadcast dims, with the
    local-supplier predicate (s_nationkey = c_nationkey) applied as a
    post-join filter Catalyst pushes into the join.

    Scale: the declared plan leaves join ORDER to Catalyst/AQE —
    cost-based reordering puts the two big shuffles first at minimal
    width, dims broadcast; no hand-scheduling.  The grouped output is
    (region × year), tiny."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)  # bounded: region is a 5-row constant dimension
        .groupBy("r_name", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), VALUE
            ).alias("revenue"),
        )
    )

