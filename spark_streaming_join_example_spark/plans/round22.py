"""Round-22 rotation stock (authored in round 14): one fresh shape for
each family that would sit at depth < 3 in the never-checked pool once
the published r15 shortlist (NOTES_r14.md) is consumed — keeping the
larder two panels ahead per the rotation discipline.  Same program as
plans/round10-21.py: every query is a different SHAPE from its checked
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
# FN-map — map_filter + transform_values + fold: the
# threshold-then-reweight readout chain
# ---------------------------------------------------------------------------


@register(
    "q_map_filter_values",
    tags=("FN-map", "A1"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(COUNT(*) FILTER (WHERE n >= 3) AS BIGINT) AS n_frequent,
       CAST(SUM(CASE WHEN event_type = 'click' THEN n END) AS BIGINT)
         AS n_click,
       CAST(COALESCE(SUM(CASE WHEN n >= 3 THEN n END), 0) AS BIGINT)
         AS n_in_frequent
FROM g GROUP BY user_id
""",
)
def q_map_filter_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user type→count map THRESHOLDED with ``map_filter`` (keep
    entries with count ≥ 3) and folded with ``aggregate`` over
    ``map_values`` — the prune-then-total readout a feature store runs
    on sparse count maps.  The checked FN-map siblings build, zip,
    concat, or parse maps; filtering entries BY VALUE and folding the
    survivors is the remaining higher-order-map flavor.  ``element_at``
    on a missing key yields NULL, matching the oracle's unguarded
    conditional SUM; the fold's 0 seed matches its COALESCE."""
    e = _t(spark, sf_dir, "events")
    m = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "n"))
            ).alias("m")
        )
    )
    frequent = F.map_filter("m", lambda k, v: v >= 3)
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.size(frequent).cast("long").alias("n_frequent"),
        F.element_at("m", F.lit("click")).alias("n_click"),
        F.aggregate(
            F.map_values(frequent), F.lit(0).cast("long"), lambda a, v: a + v
        ).alias("n_in_frequent"),
    )


# ---------------------------------------------------------------------------
# FN-map — transform_values reweighting + entry fold (second FN-map
# restock: the family is the pool's scarcest)
# ---------------------------------------------------------------------------


@register(
    "q_map_transform_fold",
    tags=("FN-map", "FN-array", "A1"),
    oracle=f"""
{EV_CTE}
, g AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN n * length(event_type) END) AS BIGINT)
         AS purchase_weight,
       CAST(SUM(n * length(event_type)) AS BIGINT) AS total_weight
FROM g GROUP BY user_id
""",
)
def q_map_transform_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user type→count map REWEIGHTED with ``transform_values``
    (count × key length — a stand-in for any per-key weight table
    folded into the value) and reduced with ``aggregate`` over
    ``map_entries`` — the reweight-then-total chain.  The checked
    FN-map siblings never rewrite values in place; transform_values is
    the one remaining map HOF.  Key-length weights keep the arithmetic
    integer-exact in both engines."""
    e = _t(spark, sf_dir, "events")
    m = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "n"))
            ).alias("m")
        )
    )
    weighted = F.transform_values("m", lambda k, v: v * F.length(k))
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.element_at(weighted, F.lit("purchase")).alias("purchase_weight"),
        F.aggregate(
            F.map_values(weighted),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ).alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# A3 — sketch readout FEEDING A SECOND PASS: count the rows inside the
# sketched interquartile band
# ---------------------------------------------------------------------------


@register(
    "q_approx_midband",
    tags=("A3", "A1", "J3"),
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         quantile_disc(l_quantity, 0.25) AS q25,
         quantile_disc(l_quantity, 0.75) AS q75,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(ANY_VALUE(q.q25) AS DOUBLE) AS q25,
       CAST(ANY_VALUE(q.q75) AS DOUBLE) AS q75,
       ANY_VALUE(q.n) AS n,
       CAST(COUNT(*) FILTER (WHERE l.l_quantity BETWEEN q.q25 AND q.q75)
            AS BIGINT) AS n_mid
FROM lineitem l JOIN q USING (l_returnflag)
GROUP BY l.l_returnflag
""",
)
def q_approx_midband(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-percentile sketch whose readouts FEED A SECOND AGGREGATE
    pass: per returnflag, count the rows inside the sketched [q25, q75]
    band — the trimmed-population census robust estimators start from.
    The checked A3 siblings stop at the readout (quantiles, deciles,
    IQR, grid); closing the loop back over the data through a
    broadcast join of the tiny quantile relation is the fresh shape.

    Exactness: same argument as q_approx_quartiles — the (returnflag,
    {{0.25, 0.75}}) ranks are a SUBSET of that query's proven gate
    ranks (gates list in tests/test_batch_queries.py covers this
    grouping), so percentile_approx at accuracy 10000 returns exactly
    DuckDB's quantile_disc and the band edges are identical integers.

    Scale: pass 1 is one partial-agg sketch; the 3-row quantile
    relation broadcasts; pass 2 is one more partial agg — no
    quantile-sized shuffle ever forms."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.25, 0.75], 10000).alias("qs"),
        F.count(F.lit(1)).alias("n"),
    )
    q = q.select(
        "l_returnflag",
        F.col("qs")[0].alias("q25"),
        F.col("qs")[1].alias("q75"),
        "n",
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.any_value("q25").alias("q25"),
            F.any_value("q75").alias("q75"),
            F.any_value("n").alias("n"),
            F.count_if(
                F.col("l_quantity").between(F.col("q25"), F.col("q75"))
            ).alias("n_mid"),
        )
    )


# ---------------------------------------------------------------------------
# A4 — CUBE over a DERIVED temporal key × a JOINED dimension attribute
# ---------------------------------------------------------------------------


@register(
    "q_cube_year_segment",
    tags=("A4", "A1", "J3", "FN-datetime"),
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       c_mktsegment AS seg,
       CAST(GROUPING(EXTRACT(year FROM o_orderdate)) * 2
            + GROUPING(c_mktsegment) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum("o_totalprice")} AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (EXTRACT(year FROM o_orderdate), c_mktsegment)
""",
)
def q_cube_year_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (order year, customer segment) — one grouping key
    DERIVED from a timestamp, the other arriving through a BROADCAST
    join — with the grouping_id level decode and exact-cents money.
    The checked A4 siblings cube/rollup stored columns of one table;
    a lattice whose axes cross a join is the data-mart shape (the
    dimension attribute only exists after enrichment).

    Scale: customer broadcasts under the fact scan; CUBE expands each
    row into 4 lattice cells BEFORE the partial aggregate, so the
    shuffle carries (4 × |groups|) partial rows, not 4 × |orders|."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).withColumn(
        "yr", F.year("o_orderdate")
    ).withColumn("seg", F.col("c_mktsegment"))
    return (
        j.cube("yr", "seg")
        .agg(
            (
                F.grouping("yr").cast("int") * 2
                + F.grouping("seg").cast("int")
            ).alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("sum_price_cents"),
        )
        .select("yr", "seg", "lvl", "n", "sum_price_cents")
    )


# ---------------------------------------------------------------------------
# A5 + W4 — tumbling buckets reduced to the PEAK bucket per day
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_10m_peak",
    tags=("A5", "W4", "A1", "FN-datetime"),
    oracle=f"""
{EV_CTE}
, b AS (
  SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000) AS bstart,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
)
SELECT day,
       CAST(arg_max(bstart, n * 1000 + (143 - (epoch_us(bstart)
             % 86400000000) // 600000000)) AS TIMESTAMP) AS peak_bucket,
       CAST(MAX(n) AS BIGINT) AS peak_n
FROM b GROUP BY day
""",
)
def q_tumbling_10m_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling buckets reduced to each day's PEAK bucket
    (argmax with an earliest-bucket tie-break) — the traffic-spike
    report.  The checked A5 siblings emit every bucket; collapsing the
    bucket axis through a second argmax aggregate is the fresh
    composition (tumble → rank-1-per-day without a window function).

    Tie-break: the argmax key packs (count, 143 − bucket-index-in-day)
    into one integer — equal counts resolve to the EARLIEST bucket,
    deterministically in both engines (144 ten-minute buckets per day;
    counts × 1000 dominate the index term)."""
    e = _t(spark, sf_dir, "events")
    b = (
        e.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bstart"),
            F.date_trunc("day", F.col("w.start")).alias("day"),
            "n",
        )
    )
    idx = (
        F.unix_micros(F.col("bstart")) % F.lit(86_400_000_000)
    ) / F.lit(600_000_000)
    key = F.col("n") * 1000 + (F.lit(143) - idx.cast("long"))
    return b.groupBy("day").agg(
        F.max_by("bstart", key).alias("peak_bucket"),
        F.max("n").alias("peak_n"),
    )


# ---------------------------------------------------------------------------
# A6 — sliding window over an exact-cents MONEY metric
# ---------------------------------------------------------------------------


@register(
    "q_sliding_8h_value",
    tags=("A6", "A1"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp(((epoch_us(ts) // 14400000000) - k.k)
                      * 14400000000) AS wstart,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum("value", VALUE)} AS sum_value
FROM ev CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def q_sliding_8h_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window(ts, '8 hours', '4 hours') over the purchase stream
    summing the VALUE column on the exact integer-micros basis — the rolling
    revenue curve.  The checked A6 siblings count rows, distincts, or
    priorities; carrying a MONEY aggregate through the slide (exact at
    any partitioning via the integer basis) is the remaining metric
    flavor.  Width = 2 × slide, so the oracle replicates each purchase
    into exactly 2 buckets with integer-µs arithmetic."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "8 hours", "4 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("value", VALUE).alias("sum_value"),
        )
        .select(F.col("w.start").alias("wstart"), "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# A7 — per-session BOOKENDS: first/last event type inside each session
# ---------------------------------------------------------------------------


@register(
    "q_session_bookends",
    tags=("A7", "A1"),
    oracle=f"""
{EV_CTE}
, p AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                   >= 1200000000
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM ev
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM p
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       arg_min(event_type, epoch(ts) * 10000000 + event_id) AS first_type,
       arg_max(event_type, epoch(ts) * 10000000 + event_id) AS last_type
FROM s GROUP BY user_id, sid
""",
)
def q_session_bookends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-minute-gap sessions emitting each session's BOOKENDS — the
    first and last event type — plus start and size: the entry/exit
    funnel row.  The checked A7 siblings count, rate, span, or roll up
    sessions; reading ORDERED VALUES out of the session interior
    (min_by/max_by inside a session_window aggregate) is the fresh
    shape.

    Determinism: the ordering key packs (epoch seconds × 10⁷ +
    event_id) into one bigint — second-resolution ties resolve by
    event id IDENTICALLY in both engines (ids < 10⁷ per the documented
    fixture envelope; 2024 epoch-seconds × 10⁷ ≈ 1.7 × 10¹⁶ ≪ 2⁶³).
    Session identity matches session_window's gap semantics (a new
    session starts when the gap is ≥ 20 min)."""
    e = _t(spark, sf_dir, "events")
    key = F.unix_timestamp("ts") * F.lit(10_000_000) + F.col("event_id")
    return (
        e.groupBy("user_id", F.session_window("ts", "20 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("event_type", key).alias("first_type"),
            F.max_by("event_type", key).alias("last_type"),
        )
        .select(
            "user_id", "session_start", "n_events", "first_type", "last_type"
        )
    )


# ---------------------------------------------------------------------------
# A9 — pivot on a SNOWFLAKED dimension attribute (region names through
# two broadcast hops)
# ---------------------------------------------------------------------------


@register(
    "q_pivot_region_counts",
    tags=("A9", "J3", "J5", "A1"),
    oracle="""
SELECT c_mktsegment AS seg,
       CAST(COUNT(*) FILTER (WHERE r_name = 'AFRICA') AS BIGINT) AS africa,
       CAST(COUNT(*) FILTER (WHERE r_name = 'AMERICA') AS BIGINT) AS america,
       CAST(COUNT(*) FILTER (WHERE r_name = 'ASIA') AS BIGINT) AS asia,
       CAST(COUNT(*) FILTER (WHERE r_name = 'EUROPE') AS BIGINT) AS europe,
       CAST(COUNT(*) FILTER (WHERE r_name = 'MIDDLE EAST') AS BIGINT)
         AS middle_east
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY c_mktsegment
""",
)
def q_pivot_region_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts pivoted to REGION columns per market segment,
    the region names arriving through a two-hop snowflake (customer →
    nation → region, both broadcast).  The checked A9 siblings pivot
    stored or derived columns of one table; pivoting a JOINED
    attribute is the remaining provenance, and the explicit 5-region
    values list keeps the schema fixed and skips the distinct-discovery
    job (both required at 100 TB).  Empty cells are zero-filled to
    match the oracle's COUNT FILTER."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    p = (
        j.groupBy(F.col("c_mktsegment").alias("seg"))
        .pivot(
            "r_name", ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
        )
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "seg",
        F.coalesce(F.col("AFRICA"), F.lit(0)).alias("africa"),
        F.coalesce(F.col("AMERICA"), F.lit(0)).alias("america"),
        F.coalesce(F.col("ASIA"), F.lit(0)).alias("asia"),
        F.coalesce(F.col("EUROPE"), F.lit(0)).alias("europe"),
        F.coalesce(F.col("MIDDLE EAST"), F.lit(0)).alias("middle_east"),
    )


# ---------------------------------------------------------------------------
# F1 — scalar Python UDF: vowel census (built-in twin documented)
# ---------------------------------------------------------------------------


@register(
    "q_udf_rot13",
    tags=("F1", "FN-string"),
    oracle="""
SELECT doc_id,
       translate(substring(text, 1, 12),
                 'abcdefghijklmnopqrstuvwxyz',
                 'nopqrstuvwxyzabcdefghijklm') AS rot13_prefix
FROM documents WHERE doc_id < 400
""",
)
def q_udf_rot13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF #7 (F1 surface coverage): ROT13 of each
    document's 12-char prefix — a character-MAPPING body (str → str
    through a substitution table), the signature flavor the checked F1
    siblings (counts, digests, distances, reversals, case flips) don't
    cover.  Built-in twin and oracle: one ``translate`` over the
    lowercase alphabet; non-letters and uppercase pass through
    unchanged in both.  Bounded to 400 docs like its F1 siblings so
    the deliberate slow path stays off the bench's critical path."""
    import codecs

    @F.udf("string")
    def rot13_prefix(s: str) -> str:
        # mapping limited to lowercase a-z, like the oracle's translate
        return "".join(
            codecs.encode(ch, "rot13") if "a" <= ch <= "z" else ch
            for ch in s[:12]
        )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return d.select("doc_id", rot13_prefix("text").alias("rot13_prefix"))


# ---------------------------------------------------------------------------
# F2 — pandas UDF: integer square-root bucket (exact IEEE sqrt)
# ---------------------------------------------------------------------------


@register(
    "q_pandas_udf_isqrt",
    tags=("F2", "FN-math", "A1"),
    oracle="""
WITH d AS (
  SELECT o_orderstatus,
         CAST(FLOOR(SQRT(CAST(ROUND(o_totalprice * 100) AS BIGINT)))
              AS BIGINT) AS isqrt_cents
  FROM orders
)
SELECT o_orderstatus, isqrt_cents, CAST(COUNT(*) AS BIGINT) AS n
FROM d GROUP BY o_orderstatus, isqrt_cents
""",
)
def q_pandas_udf_isqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF computing the INTEGER SQUARE ROOT of
    each order's price in cents (floor of the correctly-rounded IEEE
    sqrt — numpy, Spark, and DuckDB all use the hardware sqrt, which
    IEEE 754 requires to be exactly rounded, so the floor is
    deterministic across engines), histogrammed per status.  The
    checked F2 siblings clip, grade, hash, tag, and iterate; a
    NUMERIC KERNEL whose exactness argument rests on IEEE
    correct-rounding is the fresh flavor."""

    @pandas_udf("long")
    def isqrt_cents(p: pd.Series) -> pd.Series:
        import numpy as np

        cents = np.floor(p.to_numpy() * 100 + 0.5).astype("int64")
        return pd.Series(np.floor(np.sqrt(cents)).astype("int64"))

    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", isqrt_cents("o_totalprice").alias("isqrt_cents"))
        .groupBy("o_orderstatus", "isqrt_cents")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# F3 — grouped-agg pandas UDAF: integer span (max − min)
# ---------------------------------------------------------------------------


@register(
    "q_grouped_agg_nunique",
    tags=("F3", "A1", "A2"),
    oracle="""
SELECT source,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS n_lengths,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY source
""",
)
def q_grouped_agg_nunique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF #5: DISTINCT-cardinality reductions
    (pandas ``nunique`` over two columns) per source shard — the
    profiling columns a dataset card reports.  The checked F3 siblings
    compute weighted means, dependent two-pass reductions, bitmasks,
    modes, medians, and spans; a SET-SIZED reduction (state is a hash
    set, not a scalar accumulator) is the remaining UDAF state shape.
    Integer-exact by construction; the oracle is the relational
    COUNT(DISTINCT)."""

    @pandas_udf("long")
    def nunique(s: pd.Series) -> int:
        return int(s.nunique())

    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
        # agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count is a UDAF too
        return int(len(s))

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        nunique("lang").alias("n_langs"),
        nunique("n_chars").alias("n_lengths"),
        n_rows("doc_id").alias("n"),
    )


# ---------------------------------------------------------------------------
# F4 — applyInPandas: per-user min-max scaling (feature normalization)
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_pandas_scale",
    tags=("F4", "A1", "P5"),
    oracle=f"""
{EV_CTE}
, c AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS micros,
         MIN(CAST(ROUND(value * 1000000) AS BIGINT))
           OVER (PARTITION BY user_id) AS lo,
         MAX(CAST(ROUND(value * 1000000) AS BIGINT))
           OVER (PARTITION BY user_id) AS hi
  FROM ev WHERE event_type = 'purchase'
)
SELECT event_id,
       CASE WHEN hi > lo
            THEN CAST(micros - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
       END AS scaled
FROM c
""",
)
def q_apply_in_pandas_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas min-max scaling each user's purchase values to
    [0, 1] — the grouped feature-normalization kernel.  The checked F4
    siblings emit reductions, ordinals, runs, and prefix sums; a
    row-preserving AFFINE transform whose parameters are group
    statistics is the remaining grouped-map shape.  Exactness: the
    scale runs on the integer-micros basis, so numerator and
    denominator are exact int64 and the single IEEE division is
    bit-identical in both engines; a degenerate group (hi == lo) emits
    NULL, matching the oracle's unguarded CASE."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        micros = np.floor(pdf["value"].to_numpy() * 1e6 + 0.5).astype(
            "int64"
        )
        lo, hi = micros.min(), micros.max()
        scaled = (
            (micros - lo).astype("float64") / float(hi - lo)
            if hi > lo
            else np.full(len(micros), np.nan)
        )
        out = pd.DataFrame({"event_id": pdf["event_id"], "scaled": scaled})
        if hi == lo:
            out["scaled"] = None
        return out

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "value")
    )
    return e.groupBy("user_id").applyInPandas(
        scale, "event_id long, scaled double"
    )


# ---------------------------------------------------------------------------
# F5 + P2 — mapInPandas: predicate + derivation fused in one pass
# ---------------------------------------------------------------------------


@register(
    "q_map_in_pandas_flags",
    tags=("F5", "P2", "X5"),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS n_e
FROM documents
WHERE contains(text, 'the') AND doc_id < 1200
""",
)
def q_map_in_pandas_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas fusing a PREDICATE (keep docs containing 'the') with
    two derivations (word count, letter-'e' census) in one Arrow pass —
    the filter-and-featurize kernel shape.  The checked F5 siblings
    project, parse, chunk, digest, or derive on EVERY row; dropping
    rows inside the iterator (output cardinality < input) is the
    remaining mapInPandas contract corner.  The pre-filter on doc_id
    keeps the Python path bounded like its siblings."""

    def flags(it):
        for pdf in it:
            keep = pdf[pdf["text"].str.contains("the", regex=False)]
            if len(keep):
                yield pd.DataFrame(
                    {
                        "doc_id": keep["doc_id"],
                        "n_words": keep["text"].str.split(" ").str.len(),
                        "n_e": keep["text"].str.count("e"),
                    }
                )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1200)
    return d.select("doc_id", "text").mapInPandas(
        flags, "doc_id long, n_words long, n_e long"
    )


# ---------------------------------------------------------------------------
# F6 — UDTF: sentence segmentation with per-sentence stats
# ---------------------------------------------------------------------------


@register(
    "q_udtf_sentences",
    tags=("F6", "X5"),
    oracle="""
SELECT doc_id,
       CAST(i AS INT) AS sent_idx,
       CAST(len(string_split(trim(s[i]), ' ')) AS BIGINT) AS n_words
FROM (
  SELECT doc_id, string_split(text, '.') AS s
  FROM documents WHERE doc_id < 150
), UNNEST(range(1, len(s) + 1)) AS r(i)
WHERE length(trim(s[i])) > 0
""",
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #6: SENTENCE segmentation — split on '.', drop
    whitespace-only fragments, emit (index, word count) per sentence.
    The checked F6 siblings emit n-grams, windows, digit expansions,
    type words, and skip-pairs — none SUPPRESSES fragments, so the
    variable-arity yield (0..n rows per input row, holes allowed) is
    the remaining UDTF contract corner.  The oracle reproduces the
    split/trim/filter pipeline with DuckDB list functions; sent_idx is
    the 1-based PRE-FILTER index in both engines, so dropped fragments
    leave visible gaps that pin the indexing convention."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words long")
    class SentenceUDTF:
        def eval(self, text: str):
            for i, frag in enumerate(text.split("."), start=1):
                frag = frag.strip()
                if frag:
                    yield i, len(frag.split(" "))

    spark.udtf.register("sentence_udtf", SentenceUDTF)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    d.createOrReplaceTempView("__udtf_docs_sentences")
    return spark.sql(
        "SELECT doc_id, t.sent_idx, t.n_words "
        "FROM __udtf_docs_sentences, LATERAL sentence_udtf(text) t"
    )


# ---------------------------------------------------------------------------
# J1 + J3 — stream-static join read out as a per-segment RATE
# ---------------------------------------------------------------------------


@register(
    "q_stream_static_seg_rate",
    tags=("J1", "J3", "A1"),
    oracle=f"""
{EV_CTE}
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS n_purchases,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS purchase_rate
FROM ev JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
)
def q_stream_static_seg_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment read out as a CONVERSION RATE per
    market segment — counts plus their ratio (one IEEE division of two
    exact int64 counts, bit-identical in both engines).  The checked
    J1 siblings emit enriched rows, defaults, snowflake chains, or
    count/sum profiles; deriving a RATIO metric from the enriched
    aggregate is the funnel-KPI readout shape.

    Scale: customer broadcasts (the J1 invariant); events never
    shuffle before the 5-group final aggregate."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n_purch = F.count_if(F.col("event_type") == "purchase")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_purch.alias("n_purchases"),
            (
                n_purch.cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("purchase_rate"),
        )
    )
