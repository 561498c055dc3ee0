"""Round-21 rotation stock (authored in round 13, second tranche): one
fresh shape for each family that sits at depth exactly TWO in the
never-checked pool once the published r14 shortlist (NOTES_r13.md) is
consumed — 31 families that would otherwise force authoring inside the
r14 session.  Same program as plans/round10-20.py: every query is a
different SHAPE from its checked siblings (noted per docstring),
integer-exact or convention-pinned so the DuckDB twin hashes equal at
any partitioning.
"""

from __future__ import annotations

import numpy as np
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
# A3 — quartiles over a COMPOSITE cell grid (two grouping columns, one
# sketch pass per cell)
# ---------------------------------------------------------------------------


@register(
    "q_approx_quartile_grid",
    tags=("A3", "A1"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS q25,
       CAST(quantile_disc(l_quantity, 0.50) AS DOUBLE) AS q50,
       CAST(quantile_disc(l_quantity, 0.75) AS DOUBLE) AS q75,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def q_approx_quartile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-percentile quartiles over the COMPOSITE (returnflag,
    linestatus) cell grid — one sketch per cell rather than per
    single-column group, the profiling matrix a data-quality dashboard
    renders.  The checked A3 siblings group on one column (or none);
    the two-key cell grid is the remaining grouping arity, and the
    per-cell row counts stay ≥ ~1,400 at the smallest tier so every
    gated rank sits far inside its l_quantity value run (grid gate
    registered in tests/test_batch_queries.py::
    test_approx_quartiles_exactness_precondition with the
    concatenated-key grouping expression)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.percentile_approx("l_quantity", 0.25, 10000).alias("q25"),
        F.percentile_approx("l_quantity", 0.50, 10000).alias("q50"),
        F.percentile_approx("l_quantity", 0.75, 10000).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A4 — THREE-level rollup (year → quarter → status)
# ---------------------------------------------------------------------------


@register(
    "q_rollup_three_level",
    tags=("A4", "A1", "FN-datetime"),
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
       o_orderstatus AS st,
       CAST(GROUPING(EXTRACT(year FROM o_orderdate)) * 4
            + GROUPING(EXTRACT(quarter FROM o_orderdate)) * 2
            + GROUPING(o_orderstatus) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS total
FROM orders
GROUP BY ROLLUP(EXTRACT(year FROM o_orderdate),
                EXTRACT(quarter FROM o_orderdate), o_orderstatus)
""",
)
def q_rollup_three_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-level rollup (year → quarter → status): the full
    four-stratum lattice (detail, per-quarter, per-year, grand total)
    with the grouping_id level tag.  The checked A4 siblings roll up
    two columns, cube, or enumerate explicit grouping sets; arity-3
    rollup is the remaining lattice shape and the one that exercises
    Expand with four projections.  Scale: the Expand multiplies rows
    by 4 BEFORE the hash aggregate — the blow-up is the rollup depth,
    independent of data size, and the aggregate folds map-side."""
    o = (
        _t(spark, sf_dir, "orders")
        .withColumn("yr", F.year("o_orderdate"))
        .withColumn("qtr", F.quarter("o_orderdate"))
        .withColumn("st", F.col("o_orderstatus"))
    )
    return (
        o.rollup("yr", "qtr", "st")
        .agg(
            (
                F.grouping("yr") * 4
                + F.grouping("qtr") * 2
                + F.grouping("st")
            )
            .cast("int")
            .alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("total"),
        )
        .select("yr", "qtr", "st", "lvl", "n", "total")
    )


# ---------------------------------------------------------------------------
# A5 — tumbling window carrying a BIT_XOR integrity checksum
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_3h_xor",
    tags=("A5", "FN-math", "A1"),
    oracle=f"""
{EV_CTE}
SELECT make_timestamp((epoch_us(ts) // 10800000000) * 10800000000)
         AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(bit_xor(event_id) AS BIGINT) AS id_xor
FROM ev GROUP BY 1
""",
)
def q_tumbling_3h_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hour tumbling windows carrying a BIT_XOR of the event ids —
    the per-bucket integrity checksum a replayed/backfilled pipeline
    compares against the original run (XOR cancels exact duplicates
    and is order-free, so a re-ingest mismatch pinpoints the exact
    window).  The checked A5 siblings count/sum/bound their buckets;
    the checksum readout is the reconciliation flavor.  Bucket is the
    r13 integer idiom (epoch seconds mod 10800)."""
    e = _t(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("long")
    bucket = F.timestamp_seconds(ts_sec - F.pmod(ts_sec, F.lit(10800)))
    return e.groupBy(bucket.alias("window_start")).agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor("event_id").cast("long").alias("id_xor"),
    )


# ---------------------------------------------------------------------------
# A6 — sliding window over LINEITEM shipments with an exact DISTINCT
# (4-day window, 2-day slide)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "q_sliding_4d_ships",
    tags=("A6", "A2", "A1"),
    oracle=f"""
WITH starts AS (
  SELECT make_timestamp((epoch_us(l_shipdate) // {2 * _DAY_US})
                        * {2 * _DAY_US}) AS s1,
         make_timestamp((epoch_us(l_shipdate) // {2 * _DAY_US})
                        * {2 * _DAY_US} - {2 * _DAY_US}) AS s2,
         l_orderkey
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01'
)
SELECT window_start,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM (
  SELECT s1 AS window_start, l_orderkey FROM starts
  UNION ALL
  SELECT s2 AS window_start, l_orderkey FROM starts
)
GROUP BY window_start
""",
)
def q_sliding_4d_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-day windows sliding 2 days over 2001-H2 shipments, counting
    lines AND exact distinct orders per window.  The checked A6
    siblings slide 1:1-ratio windows or carry plain counts; a 2-day
    slide (each row in exactly 2 windows) WITH a distinct inside the
    window aggregate is the remaining combination — the distinct
    can't partial-fold, so the plan is the two-level (window, order)
    → (window) aggregate, both keyed on the window bucket.

    The date filter prunes the scan (PushedFilters) to ~1/12 of the
    fact before the window explode — the slice a trailing dashboard
    actually reads."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    w = F.window("l_shipdate", "4 days", "2 days")
    return (
        li.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .select(F.col("w.start").alias("window_start"), "n_lines", "n_orders")
    )


# ---------------------------------------------------------------------------
# A7 + W2 — INTER-session idle gaps (sessionize, then lag across
# sessions)
# ---------------------------------------------------------------------------


@register(
    "q_session_gaps",
    tags=("A7", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, p AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts)) > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM ev
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM p
), sessions AS (
  SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM s GROUP BY user_id, sid
), gaps AS (
  SELECT user_id,
         epoch_us(s_start)
         - epoch_us(lag(s_end) OVER (PARTITION BY user_id
                                     ORDER BY s_start)) AS idle_us
  FROM sessions
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(idle_us) AS BIGINT) AS n_gaps,
       CAST(COALESCE(MAX(idle_us), 0) AS BIGINT) AS max_idle_us
FROM gaps GROUP BY user_id
""",
)
def q_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTER-session idle gaps: 30-minute sessions per user, then a
    lag ACROSS the session rows measuring the idle span between one
    session's end and the next one's start (count + max per user).
    The checked A7 siblings aggregate within sessions; chaining a
    second window OVER the sessionized relation — the churn-risk
    idle-time metric — is the remaining composition.

    Scale: sessionize (one user-key window + aggregate) emits
    |sessions| ≪ |events| rows, and the second window sorts that
    reduced relation on the SAME user key — the shuffle is paid once;
    both windows and the final aggregate reuse the user partitioning."""
    e = _t(spark, sf_dir, "events")
    sessions = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(
        F.min("ts").alias("s_start"),
        F.max("ts").alias("s_end"),
    )
    w = Window.partitionBy("user_id").orderBy("s_start")
    gaps = sessions.withColumn(
        "idle_us",
        F.unix_micros("s_start") - F.unix_micros(F.lag("s_end").over(w)),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("idle_us").alias("n_gaps"),
        F.coalesce(F.max("idle_us"), F.lit(0)).cast("long").alias(
            "max_idle_us"
        ),
    )


# ---------------------------------------------------------------------------
# A9 — pivot WITH a row-margin column (per-status columns + total)
# ---------------------------------------------------------------------------


@register(
    "q_pivot_with_margin",
    tags=("A9", "A1"),
    oracle="""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS st_o,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS st_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS st_p,
       CAST(COUNT(*) AS BIGINT) AS total
FROM orders GROUP BY 1
""",
)
def q_pivot_with_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on order status with a ROW-MARGIN total column (the
    crosstab 'All' margin) computed in the same aggregate pass — the
    contingency-table shape.  The checked A9 siblings pivot without
    margins; emitting the margin beside the cells (total = sum of the
    pivot row, verified by the hash gate) is the remaining crosstab
    flavor.  Implemented as conditional aggregation (count FILTER per
    status + unconditional count) rather than pivot()+sum-of-columns —
    ONE scan, one aggregate, margin exact by construction."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    return o.groupBy("yr").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("st_o"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("st_f"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("st_p"),
        F.count(F.lit(1)).alias("total"),
    )


# ---------------------------------------------------------------------------
# F1 — scalar Python UDF: string reversal + palindrome probe
# ---------------------------------------------------------------------------


@register(
    "q_udf_reverse",
    tags=("F1", "FN-string"),
    oracle="""
SELECT p_brand, reverse(p_brand) AS rev,
       p_brand = reverse(p_brand) AS is_palindrome,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part GROUP BY 1, 2, 3
""",
)
def q_udf_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF reversing the brand string (s[::-1]) with a
    palindrome flag, checked against DuckDB's native reverse().  The
    checked F1 siblings sum digits, hamming-compare, alt-caps, and
    check-digit; pure sequence reversal is the remaining string-UDF
    flavor.  F1 is the operator under test — production would use the
    builtin F.reverse."""
    from pyspark.sql.types import StringType

    @F.udf(returnType=StringType())
    def rev(s: str) -> str:
        return s[::-1]

    p = _t(spark, sf_dir, "part")
    r = rev("p_brand")
    return (
        p.select(
            "p_brand",
            r.alias("rev"),
            (F.col("p_brand") == r).alias("is_palindrome"),
        )
        .groupBy("p_brand", "rev", "is_palindrome")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# F2 — pandas UDF: Knuth multiplicative hash (integer-exact modular
# arithmetic over the Arrow batch)
# ---------------------------------------------------------------------------


@register(
    "q_pandas_udf_knuth",
    tags=("F2", "FN-math", "A1"),
    oracle="""
SELECT CAST((o_orderkey * 2654435761) % 4294967296 % 8 AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN((o_orderkey * 2654435761) % 4294967296) AS BIGINT)
         AS min_hash
FROM orders GROUP BY 1
""",
)
def q_pandas_udf_knuth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF computing the Knuth multiplicative hash
    ((k · 2654435761) mod 2³²) — vectorized int64 arithmetic over the
    Arrow batch, bucketed into 8 shards and checked against the same
    integer expression in DuckDB.  The checked F2 siblings do
    clip/grade/tag/length work; exact MODULAR arithmetic is the
    remaining numeric flavor and the shard-assignment kernel feature
    stores run.  No overflow: max key · 2654435761 ≪ 2⁶³."""

    @pandas_udf("long")
    def knuth(k: pd.Series) -> pd.Series:
        return (k * 2654435761) % 4294967296

    o = _t(spark, sf_dir, "orders")
    h = knuth("o_orderkey")
    return (
        o.select(h.alias("h"))
        .groupBy(F.pmod(F.col("h"), F.lit(8)).cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("h").alias("min_hash"),
        )
    )


# ---------------------------------------------------------------------------
# F3 — grouped-agg UDAF: count above the group's RANGE MIDPOINT
# ---------------------------------------------------------------------------


@register(
    "q_grouped_agg_above_mid",
    tags=("F3", "A1"),
    oracle="""
WITH stats AS (
  SELECT source, (MIN(n_chars) + MAX(n_chars)) / 2.0 AS mid
  FROM documents GROUP BY source
)
SELECT d.source,
       CAST(COUNT(*) FILTER (WHERE d.n_chars > s.mid) AS BIGINT)
         AS n_above_mid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN stats s ON d.source = s.source
GROUP BY d.source
""",
)
def q_grouped_agg_above_mid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF counting the rows above the group's
    RANGE MIDPOINT ((min+max)/2) — a two-pass-within-group reduction
    (the midpoint depends on the whole group before any row can be
    classified), which is exactly what the whole-group pandas Series
    gives in one closure and what plain SQL needs a self-join for
    (the oracle's shape).  The checked F3 siblings compute single-pass
    moments/order stats; the dependent two-pass reduction is the
    remaining UDAF flavor.  Integer min/max make the midpoint an
    exact double — no float-summation divergence can flip the
    comparison."""

    @pandas_udf("long")
    def above_mid(s: pd.Series) -> int:
        v = s.to_numpy()
        mid = (int(v.min()) + int(v.max())) / 2.0
        return int((v > mid).sum())

    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        return int(len(s))

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        above_mid("n_chars").alias("n_above_mid"),
        n_rows("n_chars").alias("n"),
    )


# ---------------------------------------------------------------------------
# F4 + W3 — applyInPandas: per-user RUNNING TOTAL in exact cents
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_pandas_cumsum",
    tags=("F4", "W3"),
    oracle=f"""
{EV_CTE}
SELECT event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM ev
""",
)
def q_apply_in_pandas_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas materializing each user's RUNNING SPEND in exact
    integer cents (sort by (ts, event_id) inside the group, cumsum the
    rounded-cents series) — the grouped-map twin of a running-total
    frame, checked against exactly that window.  The checked F4
    siblings emit reductions or ordinals; a PREFIX-SUM (output row
    count == input, each row depending on all prior rows) is the
    remaining grouped-map recurrence and the balance/LTV ledger
    shape.  Cents are int64 end-to-end, so the prefix sums are exact
    at any partitioning."""

    def cumsum_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # Half-UP rounding to match DuckDB/Spark ROUND (half away from
        # zero); pandas .round() is half-to-even and differs by 1 cent
        # on exact n+0.5 doubles.  values are non-negative.
        cents = np.floor(
            pdf["value"].to_numpy() * 100 + 0.5
        ).astype("int64")
        cents = pd.Series(cents, index=pdf.index)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "running_cents": cents.cumsum(),
            }
        )

    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return e.groupBy("user_id").applyInPandas(
        cumsum_group, "event_id long, running_cents long"
    )


# ---------------------------------------------------------------------------
# F5 + X5 — mapInPandas: vectorized word-initials signature
# ---------------------------------------------------------------------------


@register(
    "q_map_in_pandas_initials",
    tags=("F5", "X5"),
    oracle="""
SELECT doc_id,
       array_to_string(
         list_transform(string_split(text, ' '), x -> x[1]), '') AS initials,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
FROM documents WHERE doc_id < 400
""",
)
def q_map_in_pandas_initials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas deriving each document's WORD-INITIALS signature
    (first letter of every word, concatenated) plus its word count —
    the cheap acronym/shape fingerprint a dedup cascade uses as a
    pre-filter key.  The checked F5 siblings chunk, parse, project,
    digest, and repeat; a PER-TOKEN string derivation folded back to
    one row per doc is the remaining text-kernel flavor.  The oracle
    reproduces it with list_transform over the split (DuckDB string
    indexing x[1] = first char)."""

    def initials(it):
        for pdf in it:
            toks = [t.split(" ") for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "initials": [
                        "".join(w[0] for w in ws if w) for ws in toks
                    ],
                    "n_words": pd.Series(
                        [len(ws) for ws in toks], dtype="int64"
                    ),
                }
            )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400).select(
        "doc_id", "text"
    )
    return d.mapInPandas(
        initials, "doc_id long, initials string, n_words long"
    )


# ---------------------------------------------------------------------------
# F6 + FN-math — UDTF expanding an integer key into (position, digit)
# rows
# ---------------------------------------------------------------------------


@register(
    "q_udtf_digits",
    tags=("F6", "FN-math"),
    oracle="""
SELECT o_orderkey, CAST(i AS INT) AS pos,
       CAST(substring(CAST(o_orderkey AS VARCHAR), CAST(i AS INT), 1)
            AS INT) AS digit
FROM (SELECT o_orderkey FROM orders WHERE o_orderkey < 3000),
     UNNEST(range(1, len(CAST(o_orderkey AS VARCHAR)) + 1)) AS r(i)
""",
)
def q_udtf_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF expanding an INTEGER key into (position, digit)
    rows — numeric input to a table function (every checked F6 sibling
    laterals over a STRING column), the digit-level expansion a
    Benford/format audit builds on.  Bounded to keys < 3000 so the
    oracle's per-digit UNNEST stays fixture-sized at every tier."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, digit int")
    class DigitsUDTF:
        def eval(self, k: int):
            for i, ch in enumerate(str(k), start=1):
                yield (i, int(ch))

    spark.udtf.register("digits_udtf", DigitsUDTF)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    o.createOrReplaceTempView("__udtf_digits_in")
    return spark.sql(
        "SELECT o_orderkey, t.pos, t.digit "
        "FROM __udtf_digits_in, LATERAL digits_udtf(o_orderkey) t"
    )


# ---------------------------------------------------------------------------
# J1 + J3 — stream-static join against an INLINE literal dimension
# (config table shipped with the job, not stored)
# ---------------------------------------------------------------------------


@register(
    "q_stream_static_lookup",
    tags=("J1", "J3", "P5", "A1"),
    oracle=f"""
{EV_CTE}
, weights(event_type, weight) AS (
  VALUES ('click', 1), ('view', 1), ('signup', 5),
         ('purchase', 10), ('error', 0)
)
SELECT w.weight,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(user_id AS BIGINT)) AS BIGINT) AS user_key_sum
FROM ev JOIN weights w USING (event_type)
GROUP BY w.weight
""",
)
def q_stream_static_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join against an INLINE literal dimension — the
    engagement-weight config table is built from literals in the job
    itself (spark.createDataFrame), not read from storage.  The
    checked J1 siblings join stored or derived dims; the
    shipped-with-the-job config lookup is the remaining static-side
    provenance, and the one scoring/routing jobs actually deploy
    (broadcast of a literal 5-row relation — zero I/O, zero shuffle
    on the stream side before the aggregate)."""
    e = _t(spark, sf_dir, "events")
    weights = spark.createDataFrame(
        [
            ("click", 1),
            ("view", 1),
            ("signup", 5),
            ("purchase", 10),
            ("error", 0),
        ],
        "event_type string, weight int",
    )
    return (
        e.join(F.broadcast(weights), "event_type")
        .groupBy("weight")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").cast("long").alias("user_key_sum"),
        )
    )


# ---------------------------------------------------------------------------
# J2 + J7 + J9 — clicks NOT followed by a purchase within the hour
# (negative conversion window)
# ---------------------------------------------------------------------------


@register(
    "q_click_no_purchase_1h",
    tags=("J2", "J7", "J9", "A1"),
    oracle=f"""
{EV_CTE}
, c AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'click'),
  p AS (SELECT user_id, ts FROM ev WHERE event_type = 'purchase')
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS (
         SELECT 1 FROM p
         WHERE p.user_id = c.user_id
           AND p.ts > c.ts
           AND p.ts <= c.ts + INTERVAL 1 HOUR
       )) AS BIGINT) AS n_lonely
FROM c GROUP BY c.user_id
""",
)
def q_click_no_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE conversion window: per user, the clicks NOT followed
    by any purchase within the next hour (count beside the total).
    The checked J2 siblings count the pairs that DO match; the
    complement — the abandonment metric — needs anti-join semantics
    under a time band (J9 meets J7), which Spark plans as a left
    join + null filter on the user-key shuffle.  Implemented as a
    LEFT join to matching purchases with match-count = 0, so the band
    stays a post-join predicate on the equi key."""
    e = _t(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    j = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    per_click = j.groupBy("c_user", "c_ts", "c_id").agg(
        F.count("p_ts").alias("n_matches")
    )
    return per_click.groupBy(F.col("c_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count(F.when(F.col("n_matches") == 0, 1)).alias("n_lonely"),
    )


# ---------------------------------------------------------------------------
# J6 — supplier balance-proximity pairs via the banded equi rewrite
# ---------------------------------------------------------------------------


@register(
    "q_supplier_balance_pairs",
    tags=("J6", "J4", "A1"),
    oracle="""
SELECT (a.s_nationkey = b.s_nationkey) AS same_nation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(ROUND(abs(a.s_acctbal - b.s_acctbal) * 100)
                     AS BIGINT)) AS BIGINT) AS gap_cents_total
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND abs(a.s_acctbal - b.s_acctbal) <= 250.0
GROUP BY 1
""",
)
def q_supplier_balance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier pairs with account balances within ±250 — a pure
    inequality (band) self-join executed through the BANDED EQUI
    REWRITE: each left row probes its own balance bucket and both
    neighbors (explode 3 bucket keys, bucket width == band width, so
    no qualifying pair is missed), the band predicate filters inside
    the bucket.  The checked J6 siblings band on dates or customer
    balances via tiny-dim BNLJ lookups; the SELF-band over a
    data-sized table through the equi rewrite is the shape that
    scales (shuffle on bucket keys, candidates |bucket|²-bounded) —
    the oracle states the inequality directly and DuckDB's IEJoin
    handles it.

    The gap sum is rounded to cents BEFORE summing (exact int64,
    order-free).  Band = bucket width = 250 (4/228/22,285 pairs at
    sf0.001/0.01/0.1 — non-vacuous at every tier; the sf0.001 result
    has only the same-nation arm, which both engines agree on)."""
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal",
        F.floor(F.col("s_acctbal") / 250).cast("long").alias("bucket"),
    )
    a = s.select(
        F.col("s_suppkey").alias("a_key"),
        F.col("s_nationkey").alias("a_nat"),
        F.col("s_acctbal").alias("a_bal"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("probe"),
    )
    b = s.select(
        F.col("s_suppkey").alias("b_key"),
        F.col("s_nationkey").alias("b_nat"),
        F.col("s_acctbal").alias("b_bal"),
        F.col("bucket").alias("probe"),
    )
    j = a.join(b, "probe").filter(
        (F.col("a_key") < F.col("b_key"))
        & (F.abs(F.col("a_bal") - F.col("b_bal")) <= 250.0)
    )
    gap_cents = F.round(F.abs(F.col("a_bal") - F.col("b_bal")) * 100).cast(
        "long"
    )
    return j.groupBy(
        (F.col("a_nat") == F.col("b_nat")).alias("same_nation")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(gap_cents).cast("long").alias("gap_cents_total"),
    )


# ---------------------------------------------------------------------------
# J8 + W2 — LOCF imputation: carry the last prior purchase value onto
# every event
# ---------------------------------------------------------------------------


@register(
    "q_locf_value",
    tags=("J8", "W2", "A1"),
    oracle=f"""
{EV_CTE}
, carried AS (
  SELECT event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN value END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS locf_value
  FROM ev
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(locf_value) AS BIGINT) AS n_imputed,
       {oracle_exact_sum('locf_value', VALUE)} AS locf_total
FROM carried GROUP BY event_type
""",
)
def q_locf_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: every event
    annotated with the most recent STRICTLY-PRIOR purchase value of
    the same user (the ascending ignore-nulls carry), aggregated per
    event type.  The checked J8 siblings match point events
    (backward/forward/nearest/next); carrying a VALUE onto every row —
    the feature-imputation shape — is the remaining as-of flavor.
    Exclusive frame end (-1) makes the carry strictly prior, so a
    purchase row sees the PREVIOUS purchase, not itself."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = e.withColumn(
        "locf_value",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("locf_value").alias("n_imputed"),
        exact_sum("locf_value", VALUE).alias("locf_total"),
    )


# ---------------------------------------------------------------------------
# J11 + J10 — generated day-of-month axis × event types, zero-filled
# ---------------------------------------------------------------------------


@register(
    "q_day_type_grid",
    tags=("J11", "J10", "FN-datetime", "A1"),
    oracle=f"""
{EV_CTE}
, days AS (SELECT UNNEST(range(1, 32)) AS dom),
  types AS (SELECT DISTINCT event_type FROM ev),
  actual AS (
    SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS dom, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ev GROUP BY 1, 2
  )
SELECT CAST(d.dom AS BIGINT) AS dom, t.event_type,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n
FROM days d CROSS JOIN types t
LEFT JOIN actual a ON a.dom = d.dom AND a.event_type = t.event_type
""",
)
def q_day_type_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (day-of-month × event type) activity grid over a
    GENERATED 1–31 day axis — the calendar heat-map shape whose
    zero-filled cells (day 31 never occurs in the 30-day fixture)
    prove the grid covers days with NO data, which no groupBy output
    can.  The checked J11 siblings cross stored dims, derived
    attribute domains, or quarter axes; the generated-sequence ×
    derived-domain combination is the remaining axis pairing.

    Plan note: the 31×5 cross join is a deliberate generated-axis
    BNLJ, allowlisted in tests/test_plans.py — both sides are bounded
    by construction (a literal sequence and an attribute domain)."""
    e = _t(spark, sf_dir, "events")
    days = spark.range(1, 32).select(F.col("id").alias("dom"))
    types = e.select("event_type").distinct()
    actual = e.groupBy(
        F.dayofmonth("ts").cast("long").alias("a_dom"),
        F.col("event_type").alias("a_type"),
    ).agg(F.count(F.lit(1)).alias("a_n"))
    grid = days.crossJoin(types)
    j = grid.join(
        actual,
        (grid.dom == actual.a_dom) & (grid.event_type == actual.a_type),
        "left",
    )
    return j.select(
        "dom",
        "event_type",
        F.coalesce("a_n", F.lit(0)).cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# O1 + W1 — global decile CUTPOINTS via the distributed ntile
# ---------------------------------------------------------------------------


@register(
    "q_decile_cutpoints",
    tags=("O1", "W1", "A1"),
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(o_totalprice) AS cutpoint
FROM ranked GROUP BY bucket
""",
)
def q_decile_cutpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global DECILE CUTPOINTS: ntile(10) over the total
    (totalprice, orderkey) order, then the max price per bucket — the
    exact decile boundaries a pricing-tier analysis publishes.
    Runs on the DISTRIBUTED two-phase ntile
    (operators/ranking.global_ntile: range partition + local rank +
    broadcast offsets), not a single-partition window; the checked O1
    siblings take heads, assign shards/buckets to rows, or extract a
    median band — reading the bucket BOUNDARIES back out (aggregate
    over the ntile output) is the remaining readout."""
    from ..operators.ranking import global_ntile

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bucketed = global_ntile(
        o, 10, ["o_totalprice", "o_orderkey"], out="bucket"
    )
    return bucketed.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("o_totalprice").alias("cutpoint"),
    )


# ---------------------------------------------------------------------------
# O3 — layout clustered on a NULLABLE derived key (NULLS FIRST)
# ---------------------------------------------------------------------------


@register(
    "q_null_clustered_layout",
    tags=("O3", "P5", "P2"),
    oracle="""
SELECT l_orderkey, l_linenumber, l_linestatus,
       NULLIF(l_returnflag, 'N') AS flag_or_null,
       l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-09-01'
""",
)
def q_null_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write layout clustered on a NULLABLE derived key with NULLS
    FIRST: the common case ('N' → NULL via NULLIF) sorts to the front
    of every partition file so range metadata isolates the interesting
    R/A rows in the file tail — the sparse-exception clustering trick.
    The checked O3 siblings sort non-null stored or derived keys;
    null-ordering as a LAYOUT tool is the remaining knob.  Content
    pinned by the order-insensitive oracle hash: layout ops must never
    change the row set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-09-01").cast("timestamp")
    )
    m = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_linestatus",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
        "l_quantity",
    )
    return m.repartition(4, "l_linestatus").sortWithinPartitions(
        F.col("flag_or_null").asc_nulls_first(), "l_orderkey"
    )


# ---------------------------------------------------------------------------
# P3 — construct → parse JSON round-trip (json_tuple back out)
# ---------------------------------------------------------------------------


@register(
    "q_json_tuple_roundtrip",
    tags=("P3", "FN-string", "A1"),
    oracle="""
WITH built AS (
  SELECT to_json(struct_pack(s := o_orderstatus,
                             p := o_orderpriority)) AS j
  FROM orders
)
SELECT json_extract_string(j, '$.s') AS s,
       json_extract_string(j, '$.p') AS p,
       CAST(COUNT(*) AS BIGINT) AS n
FROM built GROUP BY 1, 2
""",
)
def q_json_tuple_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON CONSTRUCT → PARSE round-trip: each order's (status,
    priority) is serialized with to_json(struct(...)) and immediately
    parsed back with json_tuple, aggregating on the PARSED values —
    the serialization-boundary identity check an event-bus producer
    runs.  The checked P3 siblings parse STORED payloads; building
    the JSON in-engine and reading it back (each engine round-trips
    its OWN serialization, so text-format differences never cross the
    hash gate — only the parsed values do) is the remaining parse
    direction."""
    o = _t(spark, sf_dir, "orders")
    built = o.select(
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("s"),
                F.col("o_orderpriority").alias("p"),
            )
        ).alias("j")
    )
    parsed = built.select(
        F.json_tuple(F.col("j"), "s", "p").alias("s", "p")
    )
    return parsed.groupBy("s", "p").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# P4 + X4 — string ↔ binary cast round-trip
# ---------------------------------------------------------------------------


@register(
    "q_binary_casts",
    tags=("P4", "X4", "A1"),
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(COUNT(*) FILTER (WHERE decode(encode(text)) = text)
            AS BIGINT) AS n_roundtrip
FROM documents GROUP BY lang
""",
)
def q_binary_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING ↔ BINARY cast round-trip per language shard: text cast
    to binary (UTF-8 bytes), byte length summed, and the
    decode(encode(x)) = x identity counted — the lossless-encoding
    audit a multilingual corpus runs before byte-level processing
    (the zh shard is the multi-byte leg).  The checked P4 siblings
    cast numerics/temporals/booleans; the binary leg is the remaining
    cast family.  Spark's cast(string as binary) ≡ DuckDB's encode()
    (both UTF-8), and cast(binary as string) ≡ decode()."""
    d = _t(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    back = payload.cast("string")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length(payload)).cast("long").alias("total_bytes"),
        F.count(F.when(back == F.col("text"), 1)).alias("n_roundtrip"),
    )


# ---------------------------------------------------------------------------
# S1 — content-addressed scan checksum (md5-derived u32 sum)
# ---------------------------------------------------------------------------


@register(
    "q_content_checksum",
    tags=("S1", "FN-string", "A1"),
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST('0x' || substring(md5(text), 1, 8) AS BIGINT))
            AS BIGINT) AS content_sum
FROM documents GROUP BY source
""",
)
def q_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-addressed scan checksum: the first 8 hex digits of each
    document's md5 parsed as a u32 and SUMMED per source shard — a
    checksum that detects any text mutation (the key-based S1 siblings
    only see row presence/ordinals).  Cross-engine integer parse is
    the q_temperature_mix recipe: DuckDB casts '0x'||hex to BIGINT,
    Spark parses the same window with conv(hex, 16, 10); the sum of
    ≤2³² values over fixture row counts stays far inside int64."""
    d = _t(spark, sf_dir, "documents")
    u32 = F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(u32).cast("long").alias("content_sum"),
    )


# ---------------------------------------------------------------------------
# T2 — point-in-time snapshot dedup (last event per user BEFORE a
# cutoff)
# ---------------------------------------------------------------------------


@register(
    "q_last_before_cutoff",
    tags=("T2", "FN-datetime", "A1"),
    oracle=f"""
{EV_CTE}
, ranked AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM ev WHERE ts < TIMESTAMP '2024-01-15'
)
SELECT user_id,
       CAST(event_id AS BIGINT) AS last_event_id,
       event_type AS last_type
FROM ranked WHERE rk = 1
""",
)
def q_last_before_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME snapshot dedup: each user's latest event STRICTLY
    BEFORE a cutoff timestamp (the as-of-date state reconstruction a
    feature-backfill runs; users with no pre-cutoff activity are
    correctly absent).  The checked T2 siblings dedup per time
    bucket, content, value band, or lifetime; anchoring the keep rule
    to an external CUTOFF is the remaining dedup key.  Max-struct
    idiom: one hash aggregate after a pushed-down scan filter, no
    window."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-15").cast("timestamp")
    )
    g = e.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("last")
    )
    return g.select(
        "user_id",
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.event_type").alias("last_type"),
    )


# ---------------------------------------------------------------------------
# T4 + W2 — chained-error burst detector (error within 12 h of the
# previous error)
# ---------------------------------------------------------------------------


@register(
    "q_error_bursts",
    tags=("T4", "W2", "FN-datetime", "A1"),
    oracle=f"""
{EV_CTE}
, errs AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id))
           AS gap_us
  FROM ev WHERE event_type = 'error'
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_errors,
       CAST(COUNT(*) FILTER (WHERE gap_us <= 43200000000) AS BIGINT)
         AS n_chained,
       CAST(COALESCE(MIN(event_id) FILTER (WHERE gap_us <= 43200000000),
                     -1) AS BIGINT) AS first_chained_id
FROM errs GROUP BY user_id
""",
)
def q_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-error burst detector: per user, errors arriving within
    12 hours of that user's PREVIOUS error (count + the first chained
    event id, -1 when none) — the alert-fatigue / retry-storm signal.
    The checked T4 siblings track value chains, type runs, crossings,
    debounce, and rate limits; a THRESHOLDED-GAP chain on a filtered
    stream is the remaining transition rule (the streaming twin is the
    threshold_crossings state-machine template with a gap register).
    12 h sits inside every tier's per-user error cadence (~13
    errors/user/month at all tiers ⇒ chained pairs exist at sf0.001
    and up) — vacuity probed per tier."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = e.withColumn(
        "gap_us",
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
    )
    chained = F.col("gap_us") <= 43_200_000_000
    return gapped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.count(F.when(chained, 1)).alias("n_chained"),
        F.coalesce(
            F.min(F.when(chained, F.col("event_id"))), F.lit(-1)
        )
        .cast("long")
        .alias("first_chained_id"),
    )


# ---------------------------------------------------------------------------
# U2 + U3 — set ops on a COMPOSITE (user, day) key
# ---------------------------------------------------------------------------


@register(
    "q_setops_user_days",
    tags=("U2", "U3", "A2", "FN-datetime"),
    oracle=f"""
{EV_CTE}
, c AS (SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day
        FROM ev WHERE event_type = 'click'),
  p AS (SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 AS day
        FROM ev WHERE event_type = 'purchase')
SELECT 'both' AS mode, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(user_id * 100 + day), 0) AS BIGINT) AS key_sum
FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
UNION ALL
SELECT 'click_only', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(user_id * 100 + day), 0) AS BIGINT)
FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
UNION ALL
SELECT 'purchase_only', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(user_id * 100 + day), 0) AS BIGINT)
FROM (SELECT * FROM p EXCEPT SELECT * FROM c)
""",
)
def q_setops_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT on a COMPOSITE (user, day) key: user-days
    with both clicks and purchases vs click-only vs purchase-only,
    one summary row per mode with a packed-key checksum.  The checked
    U2/U3 siblings set-op single-column key sets; composite-key set
    ops — the engagement-overlap calendar — are the remaining key
    shape (Spark plans them as multi-column semi/anti joins, so the
    whole tuple must match, not just the user).  Day is integer
    epoch-day arithmetic; the checksum packs (user, day) losslessly
    (day < 100)."""
    e = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    c = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", day.alias("day"))
        .distinct()
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", day.alias("day"))
        .distinct()
    )

    def _summ(df: DataFrame, mode: str) -> DataFrame:
        return df.agg(
            F.lit(mode).alias("mode"),
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("user_id") * 100 + F.col("day")), F.lit(0))
            .cast("long")
            .alias("key_sum"),
        ).select("mode", "n", "key_sum")

    return (
        _summ(c.intersect(p), "both")
        .unionAll(_summ(c.exceptAll(p), "click_only"))
        .unionAll(_summ(p.exceptAll(c), "purchase_only"))
    )


# ---------------------------------------------------------------------------
# W4 — top-3 busiest DAYS per event type (rank over a temporal
# aggregate)
# ---------------------------------------------------------------------------


@register(
    "q_top3_days_per_type",
    tags=("W4", "A1", "FN-datetime"),
    oracle=f"""
{EV_CTE}
, daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
), ranked AS (
  SELECT event_type, day, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, day) AS rk
  FROM daily
)
SELECT event_type, CAST(day AS BIGINT) AS day, n, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
""",
)
def q_top3_days_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 busiest DAYS per event type — rank over a TEMPORAL
    aggregate (the daily rollup happens first, the window ranks ≤31
    rows per type), ties broken by the earlier day.  The checked W4
    siblings rank fact rows or entity aggregates; ranking a TIME
    bucket — the peak-day report — is the remaining grouping, and the
    pre-aggregation keeps the WindowGroupLimit sort input
    domain-bounded (days × types) regardless of event volume."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("day")
    )
    return (
        daily.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "day", "n", F.col("rk").cast("int"))
    )


# ---------------------------------------------------------------------------
# X2 + X1 — canonicalized exact dup groups (sorted-word-set signature)
# ---------------------------------------------------------------------------


@register(
    "q_sorted_word_dups",
    tags=("X2", "X1", "A1"),
    oracle="""
WITH canon AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
           string_split(text, ' '))), ' ')) AS sig
  FROM documents
)
SELECT sig,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM canon GROUP BY sig
HAVING COUNT(*) > 1
""",
)
def q_sorted_word_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICALIZATION dedup: documents sharing the exact same WORD
    SET (order- and multiplicity-insensitive — the sorted distinct
    word list hashed to a signature), grouped into dup clusters.  The
    checked X2 siblings measure graded similarity (Jaccard, hamming,
    containment); canonicalize-then-exact-match — the cheapest rung
    of the dedup cascade, one hash aggregate and NO pair generation
    at all — is the remaining dedup strategy, and at 100 TB it runs
    BEFORE any LSH tier (it needs no candidates).  Both engines sort
    the same distinct word lists, so the md5 signatures agree."""
    d = _t(spark, sf_dir, "documents")
    sig = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split("text", " "))), " "
        ).cast("binary")
    )
    return (
        d.select("doc_id", sig.alias("sig"))
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )
