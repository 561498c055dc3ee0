"""UDF / UDAF / UDTF surface (SURVEY.md §2.10 F1-F6), each with a
DuckDB oracle so the Python-boundary paths are differentially checked
like everything else.

Engine policy: UDFs are the slow path (opaque to Catalyst — no
pushdown through them). These queries exist to prove the surface
works and that results stay deterministic across the Arrow boundary;
hot paths elsewhere stay JVM-side.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..sources.batch import load_table
from .registry import register


# ---------------------------------------------------------------------------
# F1 — scalar (row-at-a-time) Python UDF
# ---------------------------------------------------------------------------


@register(
    "q_udf_scalar",
    tags=("F1",),
    oracle="""
SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_rank,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY 1
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF ('1-URGENT' → 1). Deliberately the
    slowest UDF flavor — exists to cover the surface; real code uses
    the built-in (see oracle) or a pandas UDF."""

    @F.udf("int")
    def prio_rank(p: str) -> int:
        return int(p.split("-")[0])

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(prio_rank("o_orderpriority").alias("prio_rank")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# F2 — vectorized (Arrow) pandas UDF
# ---------------------------------------------------------------------------


@register(
    "q_pandas_udf",
    tags=("F2",),
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_orderkey < 100
""",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→series pandas UDF (Arrow batches; numpy does IEEE double
    mul/sub per element → bit-identical to the SQL expression)."""

    @pandas_udf("double")
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


# ---------------------------------------------------------------------------
# F3 — grouped-aggregate pandas UDF (UDAF)
# ---------------------------------------------------------------------------


@register(
    "q_grouped_agg_udf",
    tags=("F3",),
    oracle="""
SELECT lang,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
""",
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (whole group's column → one scalar).
    int64 inputs keep numpy's pairwise sum exact → matches SQL."""

    @pandas_udf("double")
    def mean_chars(chars: pd.Series) -> float:
        return float(chars.to_numpy().sum()) / len(chars)

    @pandas_udf("long")
    def n_rows(chars: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with JVM aggregates in one
        # agg() — count is a pandas UDF too
        return len(chars)

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        mean_chars("n_chars").alias("mean_chars"),
        n_rows("n_chars").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# F4 — grouped-map applyInPandas
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_pandas",
    tags=("F4",),
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
""",
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group pandas transform (top-2 orders per customer) — the
    grouped-map escape hatch; same result as the W1 window formulation."""

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(2)
        out = out.assign(rn=range(1, len(out) + 1))
        return out[["o_custkey", "o_orderkey", "o_totalprice", "rn"]]

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.groupBy("o_custkey").applyInPandas(
        top2, "o_custkey long, o_orderkey long, o_totalprice double, rn int"
    )


# ---------------------------------------------------------------------------
# F5 — mapInPandas (partition-wise Arrow batches)
# ---------------------------------------------------------------------------


@register(
    "q_map_in_pandas",
    tags=("F5",),
    oracle="""
SELECT lang, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY lang
""",
)
def q_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas recomputing per-doc lengths in Python, aggregated
    JVM-side afterwards (the decode-then-aggregate multimodal shape)."""

    def measure(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"lang": pdf["lang"], "n": pdf["text"].str.len()}
            )

    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    measured = d.mapInPandas(measure, "lang string, n long")
    return measured.groupBy("lang").agg(
        F.sum("n").alias("total_chars"), F.count(F.lit(1)).alias("n_docs")
    )


# ---------------------------------------------------------------------------
# F6 — table-valued UDTF
# ---------------------------------------------------------------------------


@register(
    "q_udtf_tokens",
    tags=("F6",),
    oracle="""
SELECT doc_id, CAST(pos AS INT) AS pos, tok
FROM (
  SELECT doc_id,
         unnest(range(len(string_split(text, ' ')))) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
  WHERE doc_id < 20
)
""",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: text → (pos, token) rows via LATERAL join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class TokenizeUDTF:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield i, t

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.tok "
        "FROM __udtf_docs, LATERAL tokenize_udtf(text) t"
    )


# ---------------------------------------------------------------------------
# F5b — mapInArrow (zero-copy RecordBatch path)
# ---------------------------------------------------------------------------


@register(
    "q_map_in_arrow",
    tags=("F5",),
    oracle="""
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total
FROM lineitem WHERE l_orderkey < 1000
GROUP BY l_orderkey
""",
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: raw pyarrow RecordBatches in, no pandas conversion —
    the cheapest Python boundary (columnar zero-copy both ways). The
    Python stage only rescales prices to exact cents; grouping stays
    JVM-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_cents(batches):
        for batch in batches:
            price = batch.column("l_extendedprice")
            cents = pc.round(pc.multiply(price, pa.scalar(100.0)))
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), pc.cast(cents, pa.int64())],
                ["l_orderkey", "cents"],
            )

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    cents = li.select("l_orderkey", "l_extendedprice").mapInArrow(
        to_cents, "l_orderkey long, cents long"
    )
    return cents.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum("cents").cast("double") / F.lit(100.0)).alias("total"),
    )


# ---------------------------------------------------------------------------
# F4b — grouped-map applyInArrow
# ---------------------------------------------------------------------------


@register(
    "q_apply_in_arrow",
    tags=("F4",),
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT) AS char_range
FROM documents GROUP BY lang
""",
)
def q_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over raw Arrow tables (applyInArrow): per-group
    stats computed columnar-side with pyarrow.compute — the zero-pandas
    twin of q_apply_in_pandas."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def group_stats(table: pa.Table) -> pa.Table:
        chars = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "char_range": [
                    pc.max(chars).as_py() - pc.min(chars).as_py()
                ],
            }
        )

    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    return d.groupBy("lang").applyInArrow(
        group_stats, "lang string, n_docs long, char_range long"
    )


# ---------------------------------------------------------------------------
# F1b — SQL-registered UDF (spark.udf.register → usable from spark.sql)
# ---------------------------------------------------------------------------


@register(
    "q_sql_udf",
    tags=("F1",),
    oracle="""
SELECT CASE WHEN n_chars < 150 THEN 'short'
            WHEN n_chars < 300 THEN 'medium'
            ELSE 'long' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1
""",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registered into the SQL function catalog and invoked from a
    spark.sql string — the surface for SQL-first users."""

    def bucket(n: int) -> str:
        return "short" if n < 150 else ("medium" if n < 300 else "long")

    spark.udf.register("doc_bucket", bucket, "string")
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udf")
    return spark.sql(
        "SELECT doc_bucket(n_chars) AS bucket, COUNT(*) AS n "
        "FROM __docs_udf GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# F4 showcase — Holt-Winters double exponential smoothing per key
# ---------------------------------------------------------------------------


@register(
    "q_holt_winters",
    tags=("F4", "A1", "W2"),
    oracle="""
WITH RECURSIVE hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id, x,
         row_number() OVER (PARTITION BY user_id ORDER BY h) AS rn
  FROM hourly
),
rec AS (
  SELECT user_id, rn, x, x AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.x,
         0.5 * s.x + 0.5 * (rec.level + rec.trend),
         0.25 * ((0.5 * s.x + 0.5 * (rec.level + rec.trend)) - rec.level)
           + 0.75 * rec.trend
  FROM rec JOIN s ON s.user_id = rec.user_id AND s.rn = rec.rn + 1
),
last AS (
  SELECT user_id, rn, level, trend,
         row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rev
  FROM rec
)
SELECT user_id, CAST(rn AS BIGINT) AS n_points, level, trend,
       level + trend AS forecast
FROM last WHERE rev = 1
""",
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters double exponential smoothing (level + trend) over
    each user's hourly event-rate series, returning the final state
    and the 1-step forecast — an inherently SEQUENTIAL recurrence, so
    it runs per key in applyInPandas (key-parallel, order-sequential:
    the legitimate use of the grouped-map escape hatch) while the
    DuckDB oracle expresses the identical recurrence as a RECURSIVE
    CTE.

    Cross-engine exactness: α=0.5, β=0.25 are exact binary fractions,
    so every multiplication is a (lossless) exponent shift; the only
    rounding happens in the additions, which both engines execute in
    the same written order on IEEE doubles — the recurrence is
    bit-identical by construction, no scaling tricks needed.  (An
    arbitrary α would also match here since pandas evaluates the same
    expression tree, but powers of two make the claim robust rather
    than incidental.)

    Scale rationale: the hourly pre-aggregation shuffles once and
    shrinks events to |user × hour|; the recurrence then ships one
    small ordered pandas frame per key through Arrow — state per task
    is one series, work is O(points), and keys parallelize freely.
    83 points/key at sf0.01; a year of hourly data is 8,760 — trivial
    per-task."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        xs = pdf["x"].tolist()
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            new_level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.25 * (new_level - level) + 0.75 * trend
            level = new_level
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_points": [len(xs)],
                "level": [level],
                "trend": [trend],
                "forecast": [level + trend],
            }
        )

    return hourly.groupBy("user_id").applyInPandas(
        hw, "user_id long, n_points long, level double, trend double, forecast double"
    )


# ---------------------------------------------------------------------------
# Round-11 additions: a SECOND member for every F-series family.  The
# driver panel hash-checks 50 names per round; by r10 every F-family
# member had a CORRECTNESS row, which made the F slots permanent
# anchors (no new signal possible).  One fresh surface per family
# turns them back into rotatable slots.  Same policy as above: these
# prove the Python boundary, hot paths stay JVM-side.
# ---------------------------------------------------------------------------


@register(
    "q_udf_vowels",
    tags=("F1",),
    oracle="""
SELECT doc_id,
       CAST(len(text) - len(regexp_replace(lower(text), '[aeiou]', '', 'g'))
            AS INT) AS n_vowels
FROM documents WHERE doc_id < 300
""",
)
def q_udf_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF #2 (vowel census per document) — a
    string-scan body instead of q_udf_scalar's split/parse, covering
    the str-in/int-out signature.  Built-in twin (the oracle): two
    length() calls around a regexp_replace."""

    @F.udf("int")
    def n_vowels(text: str) -> int:
        return sum(1 for ch in text.lower() if ch in "aeiou")

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select("doc_id", n_vowels("text").alias("n_vowels"))


@register(
    "q_pandas_udf_bucket",
    tags=("F2",),
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) % 97 AS BIGINT)
         AS cent_bucket
FROM lineitem WHERE l_orderkey < 200
""",
)
def q_pandas_udf_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→series pandas UDF #2: integer cent-bucketing (round to
    cents in numpy, modulo 97) — an all-integer body, so the Arrow
    round-trip is provably exact where q_pandas_udf's float multiply
    relies on IEEE identity."""

    @pandas_udf("long")
    def cent_bucket(price: pd.Series) -> pd.Series:
        import numpy as np

        # half-UP like DuckDB/Spark ROUND, not pandas' half-to-even —
        # 2-decimal money never lands on an exact half after ×100, but
        # the convention is pinned anyway (r13 ADVICE class; prices
        # are non-negative)
        cents = np.floor(price.to_numpy() * 100.0 + 0.5).astype("int64")
        return pd.Series(cents % 97)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey", "l_linenumber", cent_bucket("l_extendedprice").alias("cent_bucket")
    )


@register(
    "q_grouped_agg_span",
    tags=("F3",),
    oracle="""
SELECT source,
       CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT) AS char_span,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
""",
)
def q_grouped_agg_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF #2: integer span (max-min) and exact
    int64 sum per source shard — whole-group reductions that stay in
    integer space end-to-end (q_grouped_agg_udf's mean divides)."""

    @pandas_udf("long")
    def char_span(chars: pd.Series) -> int:
        v = chars.to_numpy()
        return int(v.max() - v.min())

    @pandas_udf("long")
    def total_chars(chars: pd.Series) -> int:
        return int(chars.to_numpy().sum())

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        char_span("n_chars").alias("char_span"),
        total_chars("n_chars").alias("total_chars"),
    )


@register(
    "q_apply_in_pandas_gaps",
    tags=("F4",),
    oracle="""
WITH ev AS (
  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts
  FROM events
), gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts)) AS gap
  FROM ev
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap IS NOT NULL
GROUP BY user_id
""",
)
def q_apply_in_pandas_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas #2: per-user inter-arrival analysis
    (sort inside the group, diff the timestamps, report the max gap in
    µs) — a sort-then-scan group body where q_apply_in_pandas is a
    head-k slice.  All arithmetic on int64 epoch-µs: exact."""

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        d = pdf["ts"].astype("int64").diff().dropna()
        if len(d) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n_gaps": pd.Series([], dtype="int64"),
                 "max_gap_us": pd.Series([], dtype="int64")}
            )
        # pandas datetime64 is ns; the fixture carries µs precision
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(d)],
                "max_gap_us": [int(d.max()) // 1000],
            }
        )

    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return e.groupBy("user_id").applyInPandas(
        gaps, "user_id long, n_gaps long, max_gap_us long"
    )


@register(
    "q_map_in_pandas_sieve",
    tags=("F5",),
    oracle="""
SELECT o_orderkey, o_orderstatus,
       CAST(len(o_orderpriority) AS INT) AS prio_len
FROM orders WHERE o_orderkey % 1000 < 3
""",
)
def q_map_in_pandas_sieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas #2: a batch-wise FILTER (keep keys in a modular
    sieve) + derived column — the shape that changes row COUNT inside
    the Arrow batch, where q_map_in_pandas is 1:1 per row."""

    def sieve(batches):
        for pdf in batches:
            keep = pdf[pdf["o_orderkey"] % 1000 < 3]
            yield pd.DataFrame(
                {
                    "o_orderkey": keep["o_orderkey"],
                    "o_orderstatus": keep["o_orderstatus"],
                    "prio_len": keep["o_orderpriority"].str.len().astype("int32"),
                }
            )

    o = load_table(spark, sf_dir, "orders")
    return o.mapInPandas(
        sieve, "o_orderkey long, o_orderstatus string, prio_len int"
    )


@register(
    "q_udtf_bigrams",
    tags=("F6",),
    oracle="""
SELECT doc_id,
       t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bigram
FROM (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id < 150
), LATERAL (SELECT unnest(range(1, len(t))) AS i) s
""",
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #2: word bigrams (n yields per input row vs
    q_udtf_tokens' token explode) — the n-gram shingling primitive as
    a LATERAL table function."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string")
    class BigramUDTF:
        def eval(self, text: str):
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                yield (a + " " + b,)

    spark.udtf.register("bigram_udtf", BigramUDTF)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    d.createOrReplaceTempView("__udtf_docs_bigrams")
    return spark.sql(
        "SELECT doc_id, t.bigram "
        "FROM __udtf_docs_bigrams, LATERAL bigram_udtf(text) t"
    )


# ---------------------------------------------------------------------------
# Round-12 F-family members: one more per UDF flavor — each a different
# shape from its checked and round-11 siblings (see docstrings).  As
# everywhere in this module: these exist to prove the Python boundary;
# hot paths stay JVM-side.
# ---------------------------------------------------------------------------


@register(
    "q_udf_digitsum",
    tags=("F1",),
    oracle="""
SELECT o_orderkey,
       CAST(list_sum(list_transform(
         regexp_extract_all(CAST(o_orderkey AS VARCHAR), '[0-9]'),
         x -> CAST(x AS INT))) AS INT) AS digit_sum
FROM orders WHERE o_orderkey < 500
""",
)
def q_udf_digitsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF #3: int-in/int-out arithmetic body
    (decimal digit sum of the key) — no string column in sight, where
    the checked F1 siblings parse/scan strings.  Built-in twin: a
    regexp digit explode + list_sum (the oracle)."""

    @F.udf("int")
    def digit_sum(k: int) -> int:
        return sum(int(ch) for ch in str(k))

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select("o_orderkey", digit_sum("o_orderkey").alias("digit_sum"))


@register(
    "q_pandas_udf_intlen",
    tags=("F2",),
    oracle="""
SELECT o_orderkey,
       CAST(len(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR))
            AS INT) AS int_digits
FROM orders WHERE o_orderkey < 300
""",
)
def q_pandas_udf_intlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series→series pandas UDF #3: numeric→string→length round trip
    INSIDE the pandas body (digit count of the integer part) — the
    dtype-crossing shape (float64 → int64 → str → int) where the
    checked F2 siblings stay in one numeric dtype end-to-end."""

    @pandas_udf("int")
    def int_digits(price: pd.Series) -> pd.Series:
        import numpy as np

        return (
            np.floor(price).astype("int64").astype(str).str.len()
        ).astype("int32")

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey", int_digits("o_totalprice").alias("int_digits")
    )


@register(
    "q_grouped_agg_second_max",
    tags=("F3",),
    oracle="""
SELECT lang,
       CAST(MAX(CASE WHEN n_chars < mx THEN n_chars END) AS BIGINT)
         AS second_max_chars
FROM (
  SELECT lang, n_chars, MAX(n_chars) OVER (PARTITION BY lang) AS mx
  FROM documents
)
GROUP BY lang
""",
)
def q_grouped_agg_second_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF #3: second-largest DISTINCT value per
    group (NULL when the group is constant) — an order-statistic body
    that needs the whole group sorted, not a streaming reduction like
    the checked span/sum/mean siblings.  Oracle: max over values
    strictly below the group max."""
    import numpy as np

    @pandas_udf("long")
    def second_max(chars: pd.Series) -> int | None:
        u = np.unique(chars.to_numpy())  # sorted ascending, distinct
        return int(u[-2]) if len(u) >= 2 else None

    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        second_max("n_chars").alias("second_max_chars")
    )


@register(
    "q_apply_in_pandas_norm",
    tags=("F4",),
    oracle="""
WITH s AS (
  SELECT source, doc_id, n_chars,
         MIN(n_chars) OVER (PARTITION BY source) AS mn,
         MAX(n_chars) OVER (PARTITION BY source) AS mx
  FROM documents
)
SELECT source, doc_id,
       CAST(n_chars - mn AS DOUBLE) / (mx - mn) AS norm
FROM s WHERE mx > mn
""",
)
def q_apply_in_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas #3: per-group MIN-MAX NORMALIZATION —
    a transform that returns one row per INPUT row but needs two
    whole-group statistics first (the checked F4 siblings reduce the
    group to one row / slice a head).  Integer min/max and a single
    IEEE divide keep both engines bit-identical; constant groups are
    dropped (0-range guard) on both sides."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = int(pdf["n_chars"].min()), int(pdf["n_chars"].max())
        if mx == mn:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "norm": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {
                "source": pdf["source"],
                "doc_id": pdf["doc_id"],
                "norm": (pdf["n_chars"] - mn) / (mx - mn),
            }
        )

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return d.groupBy("source").applyInPandas(
        norm, "source string, doc_id long, norm double"
    )


@register(
    "q_map_in_pandas_repeat",
    tags=("F5",),
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(i.i AS INT) AS copy_idx
FROM (
  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS q
  FROM lineitem WHERE l_quantity <= 3.0
) t, LATERAL (SELECT unnest(range(0, q)) AS i) i
""",
)
def q_map_in_pandas_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas #3: row EXPANSION inside the Arrow batch — each
    small-quantity lineitem is repeated quantity times with a copy
    index (1:N where the checked siblings are 1:1 and N:1) — the
    oversampling/replication shape of a curriculum or class-balance
    stage.  numpy repeat keeps it vectorized; the oracle is a LATERAL
    range unnest."""

    def repeat(batches):
        import numpy as np

        for pdf in batches:
            keep = pdf[pdf["l_quantity"] <= 3.0]
            q = keep["l_quantity"].astype("int64").to_numpy()
            idx = np.repeat(np.arange(len(keep)), q)
            out = keep.iloc[idx]
            copy_idx = np.concatenate(
                [np.arange(n) for n in q]
            ) if len(q) else np.array([], dtype="int64")
            yield pd.DataFrame(
                {
                    "l_orderkey": out["l_orderkey"].to_numpy(),
                    "l_linenumber": out["l_linenumber"].to_numpy(),
                    "copy_idx": copy_idx.astype("int32"),
                }
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.mapInPandas(
        repeat, "l_orderkey long, l_linenumber int, copy_idx int"
    )


@register(
    "q_udtf_chargrams",
    tags=("F6",),
    oracle="""
SELECT c_custkey, CAST(i.i AS INT) AS pos,
       substr(c_name, CAST(i.i AS INT), 3) AS trigram
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 120) t,
     LATERAL (SELECT unnest(range(1, len(c_name) - 1)) AS i) i
""",
)
def q_udtf_chargrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF #3: positional CHARACTER trigrams (two output
    columns per yield — position and gram) vs the word-level
    single-column yields of the checked F6 siblings; the
    character-shingle primitive of fuzzy-name matching."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, trigram string")
    class ChargramUDTF:
        def eval(self, name: str):
            for i in range(len(name) - 2):
                yield (i + 1, name[i : i + 3])

    spark.udtf.register("chargram_udtf", ChargramUDTF)
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < 120
    )
    c.createOrReplaceTempView("__udtf_cust_chargrams")
    return spark.sql(
        "SELECT c_custkey, t.pos, t.trigram "
        "FROM __udtf_cust_chargrams, LATERAL chargram_udtf(c_name) t"
    )
