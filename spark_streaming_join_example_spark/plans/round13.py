"""Round-13 rotation stock: fresh oracle-checked queries for the four
§2 families whose members will ALL carry driver CORRECTNESS rows after
the r11 panel lands (A3, P3, S1, T4 — everything else still has
never-checked candidates; see tools/rotation_report.py).  Same program
as plans/round10-12.py: the driver hash-checks 50 names per round, and
a family with no never-checked member forces its panel slot into a
permanent keeper.  Every query here is a different shape from its
checked siblings (noted per docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ..sources.batch import load_table
from .events_queries import EV_CTE
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A3 — heavy hitters over a DERIVED composite key (sketch sees one
# string; the result splits it back into its parts)
# ---------------------------------------------------------------------------


@register(
    "q_approx_topk_flags",
    tags=("A3", "O2", "P1"),
    oracle="""
WITH c AS (
  SELECT l_returnflag || l_linestatus AS k,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
)
SELECT substr(k, 1, 1) AS returnflag, substr(k, 2, 1) AS linestatus, cnt
FROM c ORDER BY cnt DESC, k LIMIT 4
""",
)
def q_approx_topk_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key heavy hitters via ``approx_top_k`` — the sketch
    ingests a DERIVED concat key (returnflag ⊕ linestatus) and the
    result projects the parts back out, vs the checked siblings'
    single-column sketches (q_approx_topk_events: global;
    q_approx_topk_per_group: grouped).  The composite domain is 6
    values, far below the sketch capacity, so counts are provably
    exact at any SF and the GROUP-BY top-4 oracle matches
    bit-for-bit; a count tie at the k-boundary resolves under the
    explicit (cnt desc, key) re-rank, not the sketch's tie order.

    Scale: one fixed-memory partial-aggregable sketch replaces a
    full shuffle of the concat key — the "top (category, status)
    combos over 100 TB" single-pass shape."""
    li = _t(spark, sf_dir, "lineitem")
    sk = li.select(
        F.concat("l_returnflag", "l_linestatus").alias("k")
    ).agg(F.expr("approx_top_k(k, 20)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("x"))
        .select(
            F.substring(F.col("x.item"), 1, 1).alias("returnflag"),
            F.substring(F.col("x.item"), 2, 1).alias("linestatus"),
            F.col("x.count").alias("cnt"),
        )
        .orderBy(
            F.col("cnt").desc(),
            F.concat("returnflag", "linestatus"),
        )
        .limit(4)
    )


# ---------------------------------------------------------------------------
# P3 — JSON parsed as an open-schema MAP, then key-value exploded
# ---------------------------------------------------------------------------


@register(
    "q_json_kv_explode",
    tags=("P3", "FN-map", "A1"),
    oracle="""
SELECT 'priority' AS key, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_values,
       MIN(o_orderpriority) AS min_value
FROM orders
UNION ALL
SELECT 'status', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT), MIN(o_orderstatus)
FROM orders
UNION ALL
SELECT 'year', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT year(o_orderdate)) AS BIGINT),
       CAST(MIN(year(o_orderdate)) AS VARCHAR)
FROM orders
""",
)
def q_json_kv_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsed with an OPEN schema — ``from_json`` into
    ``map<string,string>`` (no struct declared up front), then
    key-value exploded and profiled per key.  The checked P3 siblings
    all bind a closed schema (q_json_paths: path extraction;
    q_from_csv/q_from_xml: positional records; q_json_roundtrip:
    struct round-trip); the map form is how you profile
    heterogeneous event payloads whose fields aren't known at plan
    time.  The oracle computes the same per-key profile directly
    from the source columns — lexicographic MIN over 4-digit years
    equals numeric MIN, so the year leg is cast-stable.

    Scale: from_json + explode is a JVM generator (no Python); the
    per-key aggregate is a plain partial-aggregable groupBy on a
    3-value key."""
    o = _t(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").cast("string").alias("year"),
        )
    )
    kv = (
        o.select(F.from_json(j, "map<string,string>").alias("m"))
        .select(F.explode("m").alias("key", "value"))
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("value").alias("n_values"),
        F.min("value").alias("min_value"),
    )


# ---------------------------------------------------------------------------
# S1 — fixed-size chunking by the row_index provenance ordinal
# ---------------------------------------------------------------------------


@register(
    "q_row_chunks",
    tags=("S1", "P1", "A1"),
    oracle="""
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
     g AS (SELECT UNNEST(range(0, (SELECT CAST(CEIL(n / 128.0) AS BIGINT)
                                   FROM n))) AS chunk)
SELECT CAST(g.chunk AS BIGINT) AS chunk,
       CAST(LEAST(128, n.n - g.chunk * 128) AS BIGINT) AS n_rows,
       CAST(g.chunk * 128 AS BIGINT) AS first_idx,
       CAST(LEAST(n.n - 1, g.chunk * 128 + 127) AS BIGINT) AS last_idx
FROM g, n
""",
)
def q_row_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size row chunking keyed on ``_metadata.row_index`` — the
    "split this file into 128-row work units" provenance shape (how a
    backfill assigns byte-free, deterministic shard boundaries).  The
    checked S1 siblings aggregate the ordinal globally
    (q_row_index) or per file (q_file_row_profile); this one DERIVES
    a grouping key from it and emits one row per chunk.  One file per
    fixture table keeps the ordinals 0..n-1, so every chunk bound is
    a closed form of COUNT(*) — the oracle generates the chunk table
    arithmetically, and any gap, duplicate, or misordered index in
    the exposed column breaks a bound."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.col("_metadata.row_index").alias("ri"))
        .groupBy((F.col("ri") / 128).cast("long").alias("chunk"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ri").alias("first_idx"),
            F.max("ri").alias("last_idx"),
        )
    )


# ---------------------------------------------------------------------------
# T4 — debounce (burst-collapse) batch twin of a stateful timer op
# ---------------------------------------------------------------------------


@register(
    "q_debounce",
    tags=("T4", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT user_id, ts,
         CASE WHEN epoch_ns(ts) // 1000000000
                   - epoch_ns(lag(ts) OVER w) // 1000000000 > 300
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_first
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), b AS (
  SELECT user_id,
         SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS burst
  FROM g
), per_burst AS (
  SELECT user_id, burst, CAST(COUNT(*) AS BIGINT) AS blen
  FROM b GROUP BY user_id, burst
)
SELECT user_id,
       CAST(SUM(blen) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_bursts,
       CAST(SUM(blen) - COUNT(*) AS BIGINT) AS n_debounced,
       CAST(MAX(blen) AS BIGINT) AS max_burst_len
FROM per_burst GROUP BY user_id
""",
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: collapse per-user event BURSTS (inter-arrival gap
    ≤ 300 s chains into one burst; only the burst's first event
    "fires") — the batch twin of a stateful timer operator
    (applyInPandasWithState holding a per-key countdown), via the
    gaps-and-islands lag → flag → running-sum pattern.  The checked
    T4 siblings profile run LENGTHS of same-value runs
    (q_run_lengths) or streaks/sessions (q_user_streaks,
    q_sessionize_batch); debouncing keys the island boundary on the
    TIME DELTA alone and reports suppression counts — the
    alert-dedup / retry-storm-collapse shape.  Fixture (user_id, ts)
    pairs are unique, so burst ids are deterministic; both engines
    compare epoch SECONDS (floor), sidestepping sub-second encoding
    differences.

    Scale: two window passes over the same (user_id, ts) sort order
    — one shuffle, both windows and the final groupBy reuse the
    partitioning."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    sec = F.col("ts").cast("long")
    gap = sec - F.lag(sec).over(w)
    g = e.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 300), 1).otherwise(0).alias("is_first"),
    )
    b = g.select(
        "user_id",
        F.sum("is_first")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("burst"),
    )
    per_burst = b.groupBy("user_id", "burst").agg(
        F.count(F.lit(1)).alias("blen")
    )
    return per_burst.groupBy("user_id").agg(
        F.sum("blen").alias("n_events"),
        F.count(F.lit(1)).alias("n_bursts"),
        (F.sum("blen") - F.count(F.lit(1))).alias("n_debounced"),
        F.max("blen").alias("max_burst_len"),
    )
