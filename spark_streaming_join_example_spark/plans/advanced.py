"""Advanced relational surface: sketches, distribution windows,
scalar subqueries, array set-ops, sampling (SURVEY.md §2.4/§2.5/§2.8).

Scale rationale per query is inline; the common thread is that every
one of these is the *mergeable* / partition-independent formulation of
its operator — bitmaps and HLL sketches are associative monoids, so
map-side partials combine in any order on any number of executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..functions.numeric import (
    MONEY,
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
)
from ..operators.ranking import global_row_number
from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A2/A3 — EXACT distinct count via roaring-style bitmaps.
# ---------------------------------------------------------------------------


@register(
    "q_bitmap_distinct",
    tags=("A2", "A3"),
    oracle="""
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
""",
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type via bitmap aggregation
    (bitmap_bit_position / bitmap_construct_agg / bitmap_count).

    Scale: COUNT(DISTINCT) expands to a two-phase shuffle of the raw
    distinct values; the bitmap formulation shuffles one fixed-size
    bitmap per (group, 32k-id bucket) instead — the 100 TB distinct
    path for dense integer keys.  Bitmaps OR together associatively,
    so partial aggregation is order- and partitioning-independent."""
    e = _t(spark, sf_dir, "events")
    per_bucket = (
        e.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bkt"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


# ---------------------------------------------------------------------------
# A3 — HLL datasketches: mergeable approximate distinct.
# ---------------------------------------------------------------------------


@register(
    "q_hll_sketch",
    tags=("A3",),
    oracle=None,  # estimate differs from any other engine's HLL impl;
    # exactness bound asserted in tests/test_batch_queries.py
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup: per-(event_type, day) sketches, then
    hll_union_agg merges the day sketches into a per-type estimate.

    Scale: this is the pre-aggregated-rollup pattern — daily sketches
    are tiny (4KB) and persistable; any time-range distinct query is
    then a union of sketches, never a rescan of raw 100 TB data."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# W1 — distribution window functions (percent_rank / cume_dist).
# ---------------------------------------------------------------------------


@register(
    "q_window_distribution",
    tags=("W1",),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(percent_rank() OVER w, 8) AS pr,
       round(cume_dist() OVER w, 8) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
""",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist of each order within its customer.

    Ties on o_totalprice are safe: both functions depend only on the
    value ordering, not on row order within ties.  (rank-1)/(n-1) is
    an exact integer-ratio IEEE divide — identical in both engines;
    round(…,8) guards representation anyway.  Scale: partitioned by
    the high-cardinality customer key — no giant single partition."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 8).alias("pr"),
        F.round(F.cume_dist().over(w), 8).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Rel — scalar subquery (uncorrelated): filter against a global aggregate.
# ---------------------------------------------------------------------------


@register(
    "q_scalar_subquery",
    tags=("J3", "A1"),
    oracle=f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_big,
       {oracle_exact_sum('o_totalprice', MONEY)} AS sum_big
FROM orders
WHERE o_totalprice > (SELECT {oracle_exact_avg('o_totalprice', MONEY)} FROM orders)
GROUP BY o_orderstatus
""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price, per status.

    The scalar subquery is expressed as a broadcast join against a
    1-row aggregate — exactly Catalyst's own rewrite of an
    uncorrelated scalar subquery.  The threshold uses the exact
    scaled-bigint mean so both engines compare against the identical
    double (no borderline-row flips).  Scale: the 1-row threshold
    broadcasts; the fact scan streams once."""
    o = _t(spark, sf_dir, "orders")
    thr = o.agg(exact_avg("o_totalprice", MONEY).alias("thr"))
    return (
        o.join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            exact_sum("o_totalprice", MONEY).alias("sum_big"),
        )
    )


# ---------------------------------------------------------------------------
# FN-array — set algebra over token arrays.
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a")
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


@register(
    "q_array_setops",
    tags=("FN-array", "X5"),
    oracle=f"""
SELECT doc_id,
       COALESCE(array_to_string(
           list_sort(list_distinct(list_intersect(string_split(text, ' '), {_STOP_SQL}))),
           ','), '') AS stop_hits,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique,
       CAST(len(list_filter(list_distinct(string_split(text, ' ')),
                x -> NOT list_contains({_STOP_SQL}, x))) AS INT) AS n_nonstop
FROM documents
""",
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect / array_except / array_distinct over tokens.

    Spark's set ops dedup and preserve first-array order; DuckDB's
    differ in order, so both sides sort the materialized array.
    Scale: pure per-row JVM expressions — no shuffle, codegen'd."""
    d = _t(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_distinct(F.array_intersect(toks, stop))), ","
        ).alias("stop_hits"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(F.array_except(toks, stop)).alias("n_nonstop"),
    )


# ---------------------------------------------------------------------------
# FN-math/A1 — histogram via width_bucket.
# ---------------------------------------------------------------------------

_HIST_MAX = 600_000.0
_HIST_BUCKETS = 12
_HIST_W = _HIST_MAX / _HIST_BUCKETS  # 50k per bucket


@register(
    "q_histogram",
    tags=("FN-math", "A1"),
    oracle=f"""
SELECT CAST(CASE WHEN o_totalprice >= {_HIST_MAX} THEN {_HIST_BUCKETS + 1}
            ELSE FLOOR(o_totalprice / {_HIST_W}) + 1 END AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       {oracle_exact_sum('o_totalprice', MONEY)} AS total
FROM orders
GROUP BY 1
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width price histogram via width_bucket.

    Boundary safety: bucket edges are exact-integer multiples of 50000
    and prices are 2-decimal, so width_bucket's (v-min)*n/(max-min)
    and the oracle's FLOOR(v/w)+1 always land in the same bucket.
    Scale: single map-side-combinable agg over 13 groups."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(
                "o_totalprice",
                F.lit(0.0),
                F.lit(_HIST_MAX),
                F.lit(_HIST_BUCKETS),
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum("o_totalprice", MONEY).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# P2 — seeded Bernoulli sampling (TABLESAMPLE).
# ---------------------------------------------------------------------------


@register(
    "q_tablesample",
    tags=("P2",),
    oracle=None,  # per-partition PRNG — engine-specific row pick;
    # determinism within Spark asserted in tests/test_batch_queries.py
)
def q_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% seeded Bernoulli sample of orders, aggregated per status.

    df.sample(fraction, seed) draws per-partition with a seeded XORShift
    stream — deterministic for a fixed input layout, which is what a
    reproducible training-data subsample needs.  Scale: sampling is a
    narrow (no-shuffle) op; the agg reduces 10% of the scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.sample(fraction=0.1, seed=42)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            exact_sum("o_totalprice", MONEY).alias("sum_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# P5/FN-math — ANSI-safe try_* arithmetic (NULL instead of error).
# ---------------------------------------------------------------------------


@register(
    "q_try_arithmetic",
    tags=("P5", "FN-math"),
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_extendedprice / l_discount IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ratio
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide: price/discount is NULL (not an error, not Inf) when
    discount = 0.  DuckDB's double division yields NULL on /0 natively,
    so the oracle counts the same rows.  Scale: pure codegen map."""
    li = _t(spark, sf_dir, "lineitem")
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(ratio.isNull(), 1).otherwise(0)).alias("n_null_ratio"),
    )


# ---------------------------------------------------------------------------
# Rel — correlated subquery (per-outer-row aggregate predicate).
# ---------------------------------------------------------------------------


@register(
    "q_correlated_subquery",
    tags=("J9", "A1"),
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_single_item
FROM orders o
WHERE (SELECT COUNT(*) FROM lineitem l
       WHERE l.l_orderkey = o.o_orderkey) = 1
GROUP BY o_orderstatus
""",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with exactly one lineitem, per status — a correlated
    scalar subquery through the SQL front door (SURVEY §3.2).

    Catalyst decorrelates this into an aggregate + join (visible in
    the optimized plan as Project+Join over the grouped lineitem
    counts) — i.e. the engine plans it like the hand-written groupBy,
    not one probe per outer row.  Scale: one shuffle of lineitem keyed
    by l_orderkey, then an equi-join; no nested-loop anywhere."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_adv_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_adv_lineitem")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_single_item
        FROM v_adv_orders o
        WHERE (SELECT COUNT(*) FROM v_adv_lineitem l
               WHERE l.l_orderkey = o.o_orderkey) = 1
        GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# X3 — Euclidean LSH neighbors via pyspark.ml BucketedRandomProjectionLSH.
# ---------------------------------------------------------------------------


@register(
    "q_brp_neighbors",
    tags=("X3",),
    oracle=None,  # bucket-collision approximate recall — engine-specific;
    # recall floor asserted in tests/test_extensions.py
)
def q_brp_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean near-neighbor pairs via BucketedRandomProjectionLSH
    (seeded, deterministic buckets).  The ml-pipeline twin of the
    hand-rolled hyperplane LSH in operators/similarity.py.

    Scale: candidate generation is a self-join on bucket id — work is
    O(sum of bucket sizes squared), not O(n^2); bucketLength tunes the
    recall/cost trade."""
    from ..operators.ml_lsh import ml_brp_neighbors

    emb = _t(spark, sf_dir, "embeddings")
    return ml_brp_neighbors(emb, radius=6.0)


# ---------------------------------------------------------------------------
# X1/FN-string — cryptographic content fingerprints (dedup identity keys).
# ---------------------------------------------------------------------------


@register(
    "q_checksums",
    tags=("X1", "FN-string"),
    oracle="""
SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
FROM documents
""",
)
def q_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2-256 content hashes per document — the exact-dedup
    identity key at corpus scale (hash once, dedup/join on the 32-byte
    digest instead of shuffling full document bodies)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
    )


# ---------------------------------------------------------------------------
# A1/FN-math — bitwise aggregates.
# ---------------------------------------------------------------------------


@register(
    "q_bit_aggs",
    tags=("A1", "FN-math"),
    oracle="""
SELECT event_type,
       bit_and(user_id) AS band,
       bit_or(user_id) AS bor,
       bit_xor(user_id) AS bxor
FROM events
GROUP BY event_type
""",
)
def q_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor aggregates (commutative+associative →
    partial-agg friendly; xor-folding is also a cheap set-equality
    probe across partitions)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
    )


# ---------------------------------------------------------------------------
# FN-array — explode_outer NULL-row semantics on possibly-empty arrays.
# ---------------------------------------------------------------------------


@register(
    "q_explode_outer",
    tags=("FN-array",),
    oracle="""
SELECT doc_id,
       unnest(CASE WHEN len(longtoks) = 0
              THEN [CAST(NULL AS VARCHAR)] ELSE longtoks END) AS tok
FROM (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> len(t) > 9) AS longtoks
  FROM documents
)
""",
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer keeps a NULL row for documents whose filtered
    token array is empty (plain explode would silently drop them —
    a row-count-changing footgun in corpus pipelines)."""
    d = _t(spark, sf_dir, "documents")
    longtoks = F.filter(F.split("text", " "), lambda t: F.length(t) > 9)
    return d.select("doc_id", F.explode_outer(longtoks).alias("tok"))


# ---------------------------------------------------------------------------
# P3 — CSV scalar parse (from_csv round-trip).
# ---------------------------------------------------------------------------


@register(
    "q_from_csv",
    tags=("P3",),
    oracle="""
SELECT o_orderstatus AS s,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total
FROM orders
GROUP BY o_orderstatus
""",
)
def q_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_csv → from_csv round-trip (the delimited-text twin of the
    from_json Kafka-payload step), then aggregate the PARSED struct —
    proves the parse is lossless for key/status/price."""
    o = _t(spark, sf_dir, "orders")
    line = F.concat_ws(
        ",", F.col("o_orderkey"), F.col("o_orderstatus"), F.col("o_totalprice")
    )
    parsed = o.select(
        F.from_csv(line, "k BIGINT, s STRING, p DOUBLE").alias("r")
    ).select("r.*")
    return parsed.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("p") * 100.0).cast("long")).cast("double") / 100.0
        ).alias("total"),
    )


# ---------------------------------------------------------------------------
# Rel — recursive CTE (Spark 4): calendar spine + gap-filled daily counts.
# ---------------------------------------------------------------------------


@register(
    "q_recursive_cte",
    tags=("A1", "J10"),
    oracle="""
WITH RECURSIVE ev AS (
  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events
), spine(d) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM spine WHERE d < DATE '2024-01-30'
)
SELECT s.d AS day, CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM ev GROUP BY 1
) e ON s.d = e.d
""",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) date spine, left-joined to per-day
    event counts — the canonical time-series gap-fill (days with zero
    events appear as 0, not as missing rows).

    Scale: the spine is O(days) rows from the driver-side recursion;
    the fact side is one partial-agg'd groupBy — the recursion never
    touches the 100 TB table."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("v_adv_events")
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '2024-01-01'
          UNION ALL
          SELECT date_add(d, 1) FROM spine WHERE d < DATE '2024-01-30'
        )
        SELECT s.d AS day, COALESCE(e.n, CAST(0 AS BIGINT)) AS n_events
        FROM spine s LEFT JOIN (
          SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
          FROM v_adv_events GROUP BY 1
        ) e ON s.d = e.d
        """
    )


# ---------------------------------------------------------------------------
# Rel — LATERAL join (correlated table subquery with ORDER BY ... LIMIT).
# ---------------------------------------------------------------------------


@register(
    "q_lateral_topk",
    tags=("W4", "J5"),
    oracle="""
SELECT c.c_custkey, t.o_orderkey AS best_order, t.o_totalprice AS best_price
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
) t
""",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most expensive order per customer through the LATERAL SQL
    surface (correlated ORDER BY/LIMIT subquery; inner-lateral drops
    order-less customers — same result as the window top-1).

    Scale note: Catalyst rewrites this lateral into a join + per-key
    limit, but the window-rank formulation (q_window_rank) is the
    preferred idiom at 100 TB — this query exists to cover the SQL
    surface and prove result-equivalence."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_adv_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_adv_orders2")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey AS best_order,
               t.o_totalprice AS best_price
        FROM v_adv_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM v_adv_orders2 o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) t
        """
    )


# ---------------------------------------------------------------------------
# A1 — bivariate moments: correlation / covariance.
# ---------------------------------------------------------------------------


@register(
    "q_corr_cov",
    tags=("A1", "FN-math"),
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov,
       round(covar_pop(l_discount, l_tax), 8) AS disc_tax_cov
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample/population covariance per group.

    Both engines use single-pass co-moment accumulation whose partial
    merge order differs — agreement to well past the rounded digits
    (relative float error ~1e-15 vs 1e-6 display).  Scale: constant
    state per group, partial-agg friendly."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_cov"
        ),
        F.round(F.covar_pop("l_discount", "l_tax"), 8).alias("disc_tax_cov"),
    )


# ---------------------------------------------------------------------------
# Training-data curation: label balance, stratified sample, seeded split.
# ---------------------------------------------------------------------------


@register(
    "q_label_balance",
    tags=("A1", "X3"),
    oracle="""
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS DOUBLE)
           / (SELECT CAST(COUNT(*) AS DOUBLE) FROM embeddings) AS frac
FROM embeddings
GROUP BY label
""",
)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-distribution report over the embedding corpus — the first
    question of any training-data audit.  frac = bigint/bigint in one
    IEEE divide, exact in both engines.  Scale: partial-agg'd count +
    one broadcast scalar."""
    emb = _t(spark, sf_dir, "embeddings")
    total = emb.agg(F.count(F.lit(1)).cast("double").alias("tot"))
    return (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .select(
            "label", "n", (F.col("n").cast("double") / F.col("tot")).alias("frac")
        )
    )


@register(
    "q_stratified_sample",
    tags=("P2", "X3"),
    oracle=None,  # seeded per-partition PRNG pick — Spark-deterministic
    # only; per-class bounds asserted in tests/test_batch_queries.py
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class sampling fractions via sampleBy (class rebalancing:
    downsample the majority labels, keep the tail).  Scale: narrow
    no-shuffle op; fractions map is driver-side tiny."""
    emb = _t(spark, sf_dir, "embeddings")
    fractions = {0: 0.2, 1: 0.2, 2: 1.0, 3: 1.0, 4: 0.5}
    return (
        emb.sampleBy("label", fractions=fractions, seed=7)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "q_train_test_split",
    tags=("P2", "X3"),
    oracle=None,  # rand(seed) stream is engine-specific;
    # disjointness/coverage asserted in tests/test_batch_queries.py
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 80/20 train-test assignment (rand(seed) < 0.8), reported
    as per-label split counts.  The assignment column — not randomSplit
    — is the reproducible idiom: the split travels WITH the row into
    downstream joins instead of forking two scans."""
    emb = _t(spark, sf_dir, "embeddings")
    tagged = emb.withColumn(
        "split",
        F.when(F.rand(seed=123) < 0.8, F.lit("train")).otherwise(F.lit("test")),
    )
    return tagged.groupBy("label", "split").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# FN-string — URL decomposition + key/value string parsing.
# ---------------------------------------------------------------------------


@register(
    "q_parse_url",
    tags=("FN-string", "P3"),
    oracle="""
SELECT doc_id,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
FROM (
  SELECT doc_id,
         'https://corpus.example/' || source || '/' || CAST(doc_id AS VARCHAR)
             || '?lang=' || lang AS url
  FROM documents
)
""",
)
def q_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url HOST/PATH/QUERY-param extraction over synthesized
    provenance URLs (the lineage-tracking idiom for web-crawl corpora).
    Oracle mirrors with regexes.  Scale: per-row JVM expressions."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://corpus.example/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_str_to_map",
    tags=("FN-map", "P3"),
    oracle="""
SELECT doc_id,
       CAST(m['lang'][1] AS VARCHAR) AS m_lang,
       CAST(m['src'][1] AS VARCHAR) AS m_src
FROM (
  SELECT doc_id,
         MAP(['lang', 'src'], [lang, source]) AS m
  FROM documents
)
""",
)
def q_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map: 'k=v,k=v' metadata strings → MapType → field access
    (the tag-soup parse step for crawl metadata)."""
    d = _t(spark, sf_dir, "documents")
    tag = F.concat(
        F.lit("lang="), F.col("lang"), F.lit(",src="), F.col("source")
    )
    m = F.str_to_map(tag, F.lit(","), F.lit("="))
    return d.select(
        "doc_id",
        m.getItem("lang").alias("m_lang"),
        m.getItem("src").alias("m_src"),
    )


# ---------------------------------------------------------------------------
# P3 — XML scalar parse (from_xml + xpath round-trip).
# ---------------------------------------------------------------------------


@register(
    "q_from_xml",
    tags=("P3",),
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""",
)
def q_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to-XML → from_xml round-trip (the XML twin of the from_json
    Kafka step, new in Spark 4), then aggregate the PARSED struct —
    lossless for lang/n_chars proves the parse.  Scale: per-row JVM
    expression; no Python."""
    d = _t(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<doc><lang>"),
        F.col("lang"),
        F.lit("</lang><chars>"),
        F.col("n_chars").cast("string"),
        F.lit("</chars></doc>"),
    )
    parsed = d.select(
        F.from_xml(xml, "lang STRING, chars BIGINT").alias("r")
    ).select("r.*")
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("chars").alias("total_chars"),
    )


@register(
    "q_xpath",
    tags=("P3", "FN-string"),
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
FROM documents
GROUP BY source
""",
)
def q_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xpath_string field extraction from synthesized XML provenance
    records — aggregate over the EXTRACTED fields equals the oracle's
    aggregate over the originals."""
    d = _t(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<m><src>"),
        F.col("source"),
        F.lit("</src><lang>"),
        F.col("lang"),
        F.lit("</lang></m>"),
    )
    ex = d.select(
        F.xpath_string(xml, F.lit("/m/src")).alias("source"),
        F.xpath_string(xml, F.lit("/m/lang")).alias("xlang"),
    )
    return ex.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("xlang") == "en", 1).otherwise(0)).alias("n_en"),
    )


# ---------------------------------------------------------------------------
# A4 — GROUPING() disambiguation for rollup NULLs.
# ---------------------------------------------------------------------------


@register(
    "q_grouping_id",
    tags=("A4",),
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags distinguish a real NULL group key from a
    rollup subtotal row — without them subtotal rows are
    indistinguishable from NULL-keyed data groups."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# X1/X2 — duplicate-cluster resolution: connected components over
# near-dup pair edges.
# ---------------------------------------------------------------------------


_DUP_CLUSTERS_ORACLE = """
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < 2000
), pairs AS MATERIALIZED (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE) >= 0.5
), edges AS MATERIALIZED (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
), m1 AS MATERIALIZED (
  -- one min-label contraction round (connectivity-preserving: each
  -- node merges into a neighbor-or-self), so the recursive closure
  -- runs on the contracted graph (132 edges here, not 184k)
  SELECT s, LEAST(s, MIN(d)) AS m FROM edges GROUP BY s
), e1 AS MATERIALIZED (
  SELECT DISTINCT x.m AS s, y.m AS d
  FROM edges e JOIN m1 x ON e.s = x.s JOIN m1 y ON e.d = y.s
  WHERE x.m <> y.m
), reach(s, d) AS (
  SELECT s, d FROM e1
  UNION
  SELECT r.s, e.d FROM reach r JOIN e1 e ON r.d = e.s
), comp1 AS (
  SELECT s, LEAST(s, MIN(d)) AS comp FROM reach GROUP BY s
)
SELECT n.s AS node, COALESCE(c.comp, n.m) AS component
FROM m1 n LEFT JOIN comp1 c ON n.m = c.s
"""


def _dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-Jaccard >= 0.5 near-dup edges over documents (shared by
    both duplicate-cluster queries).

    Hard-guarded (operators/guards.py): above 2,500 input docs the
    builder raises with a pointer to the LSH blocker — at jac >= 0.5
    on THIS corpus ~72% of all pairs are true edges, so no blocker can
    reduce the O(n²) verify; the only scale answer is a different
    similarity definition (shingled MinHash) or a bounded sample.

    Verify representation (r8): the corpus vocabulary is tiny (31
    distinct tokens), so each document's distinct-token SET dictionary-
    encodes into one 63-bit BITMASK and the per-pair verify becomes
    `3·bit_count(a&b) >= bit_count(a)+bit_count(b)` — pure integer
    codegen ops instead of a string array_intersect per pair (the r7
    form's dominant cost), value-identical because token sets map
    bijectively onto masks and the jac >= 0.5 clearing is exact
    integer algebra (positive denominator).  Corpora with more than 63
    distinct tokens keep the array_intersect form with the standard
    size prefilter (jac >= t forces t·max(|A|,|B|) <= min(|A|,|B|))
    and |A∪B| = |A|+|B|−|A∩B| (ONE intersect reference; join/filter
    predicates get no subexpression elimination)."""
    from ..operators.dedup import distinct_tokens
    from ..operators.guards import assert_allpairs_bounded

    d = assert_allpairs_bounded(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000),
        max_rows=2500,
        what="q_dup_clusters edge build (_dup_edges)",
        scale_path="operators.dedup.minhash_near_duplicates (banded LSH "
        "over shingles) feeding operators.graph.connected_components",
    )
    toks = d.select(
        "doc_id", F.explode(distinct_tokens("text")).alias("tok")
    )
    vocab = toks.select("tok").distinct()
    if vocab.count() <= 63:
        # dense token ids from a sort — the vocab relation is tiny by
        # the gate above (<= 63 rows), so the single-partition window
        # is coordination, not data
        vid = vocab.select(
            "tok",
            (F.row_number().over(Window.orderBy("tok")) - 1).alias("tid"),
        )
        t = (
            toks.join(F.broadcast(vid), "tok")
            .groupBy("doc_id")
            .agg(
                F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), tid))").alias(
                    "mask"
                )
            )
            .select("doc_id", "mask", F.bit_count("mask").alias("n"))
            .localCheckpoint(eager=True)
        )
        a = t.select(
            F.col("doc_id").alias("a_id"),
            F.col("mask").alias("a_mask"),
            F.col("n").alias("a_n"),
        )
        b = t.select(
            F.col("doc_id").alias("b_id"),
            F.col("mask").alias("b_mask"),
            F.col("n").alias("b_n"),
        )
        common = F.bit_count(F.col("a_mask").bitwiseAND(F.col("b_mask")))
        return (
            a.join(b, F.col("a_id") < F.col("b_id"))
            .filter(3 * common >= F.col("a_n") + F.col("b_n"))
            .select("a_id", "b_id")
        )
    t = (
        d.select("doc_id", distinct_tokens("text").alias("toks"))
        .withColumn("n", F.size("toks"))
        .localCheckpoint(eager=True)
    )
    a = t.select(
        F.col("doc_id").alias("a_id"),
        F.col("toks").alias("a_toks"),
        F.col("n").alias("a_n"),
    )
    b = t.select(
        F.col("doc_id").alias("b_id"),
        F.col("toks").alias("b_toks"),
        F.col("n").alias("b_n"),
    )
    common = F.size(F.array_intersect(F.col("a_toks"), F.col("b_toks")))
    return (
        a.join(
            b,
            (F.col("a_id") < F.col("b_id"))
            & (
                F.least("a_n", "b_n").cast("double")
                >= 0.5 * F.greatest("a_n", "b_n").cast("double")
            ),
        )
        .filter(3 * common >= F.col("a_n") + F.col("b_n"))
        .select("a_id", "b_id")
    )


@register("q_dup_clusters", tags=("X1", "X2"), oracle=_DUP_CLUSTERS_ORACLE)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: token-Jaccard >= 0.5 pairs (bounded
    all-pairs, cf. q_jaccard_pairs) -> connected components via
    min-label propagation (operators/graph.py).  The output is the
    keep-one-per-cluster key a dedup pipeline groups on.

    Oracle: DuckDB recursive-CTE transitive closure over the same
    edges — an independent algorithm arriving at the same components.
    Scale: pair generation is LSH-bucketed in production (X2); the
    component loop is O(|E|) per round x diameter rounds.

    Edge generation is shared with q_dup_clusters_star (_dup_edges);
    see that helper for the size-prefilter / single-intersect notes."""
    from ..operators.graph import connected_components

    return connected_components(_dup_edges(spark, sf_dir)).select(
        "node", "component"
    )


@register("q_dup_clusters_star", tags=("X1", "X2"), oracle=_DUP_CLUSTERS_ORACLE)
def q_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster resolution as q_dup_clusters but via
    alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14) — the O(log n)-round formulation that stays fast when the
    duplicate graph has long chains (plain label propagation is
    O(diameter) rounds).  Three independent algorithms now agree on
    these components: label propagation, star contraction, and the
    DuckDB recursive-closure oracle."""
    from ..operators.graph import connected_components_star

    return connected_components_star(_dup_edges(spark, sf_dir)).select(
        "node", "component"
    )


# ---------------------------------------------------------------------------
# A1 — boolean / conditional aggregates.
# ---------------------------------------------------------------------------


@register(
    "q_bool_aggs",
    tags=("A1", "P5"),
    oracle="""
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_totalprice > 500000) AS any_huge
FROM orders
GROUP BY o_orderstatus
""",
)
def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or — predicate aggregates (all
    partial-agg friendly single-bit state)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 500000).alias("any_huge"),
    )


# ---------------------------------------------------------------------------
# A1 — argmax/argmin with a deterministic compound ordering key.
# ---------------------------------------------------------------------------


@register(
    "q_minmax_by",
    tags=("A1", "W4"),
    oracle="""
SELECT o_orderstatus,
       arg_max(o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000
                   + o_orderkey) AS priciest_order,
       arg_min(o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000
                   + o_orderkey) AS cheapest_order
FROM orders
GROUP BY o_orderstatus
""",
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) per group.  Price ties are broken
    by folding the unique order key into an exact integer compound
    (cents*1e7 + key stays < 2^63) — both engines pick the same row,
    where a bare max_by(key, price) tie is engine-arbitrary."""
    o = _t(spark, sf_dir, "orders")
    compound = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10_000_000)
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", compound).alias("priciest_order"),
        F.min_by("o_orderkey", compound).alias("cheapest_order"),
    )


# ---------------------------------------------------------------------------
# X5 — TF-IDF: most-distinctive token per document.
# ---------------------------------------------------------------------------


@register(
    "q_tfidf_top_term",
    tags=("X5", "A1", "W4"),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6)
             AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
                 DESC, tf.tok) AS rn
  FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, tok AS top_term, tfidf FROM scored WHERE rn = 1
""",
)
def q_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-distinctive token per document by TF-IDF — the classic
    corpus-analysis scoring (keyword extraction / quality filtering).

    Determinism: idf = ln(exact-int ratio) rounded past libm ulp
    drift; top-1 ties broken lexicographically.  Scale: two
    partial-agg'd groupBys + a broadcast of the token-df table slice
    that matters; the window is per-doc (high cardinality)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.col("n_docs") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_raw").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_term"),
            F.round("tfidf_raw", 6).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — linear-regression aggregates.
# ---------------------------------------------------------------------------


@register(
    "q_regression_aggs",
    tags=("A1", "FN-math"),
    oracle="""
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regr_slope/intercept/r2/count — one-pass OLS of price on
    quantity per group (co-moment state, partial-agg friendly; rounding
    absorbs partial-merge float drift)."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n_pairs"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# FN-datetime — calendar arithmetic.
# ---------------------------------------------------------------------------


@register(
    "q_date_arith",
    tags=("FN-datetime",),
    oracle="""
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS qtr,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since_95
FROM orders
""",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic battery: last_day / add_months /
    quarter-trunc / day differences (the partition-key derivations a
    date-partitioned 100 TB layout is built on)."""
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus3m"),
        F.to_date(F.date_trunc("quarter", d)).alias("qtr"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


# ---------------------------------------------------------------------------
# FN-map — map higher-order functions, checked against independent
# arithmetic.
# ---------------------------------------------------------------------------


@register(
    "q_map_hofs",
    tags=("FN-map",),
    oracle="""
SELECT doc_id,
       CAST(n_chars * 2 AS BIGINT) AS chars_x2,
       CAST((CASE WHEN n_chars * 2 >= 400 THEN 1 ELSE 0 END)
            + (CASE WHEN len(string_split(text, ' ')) * 2 >= 400
               THEN 1 ELSE 0 END) AS INT) AS n_big,
       CAST(n_chars AS BIGINT) AS zip_diff
FROM documents
""",
)
def q_map_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_values / map_filter / map_zip_with over a per-doc
    stats map — the oracle computes the same quantities with plain
    arithmetic, so the HOF semantics are what's under test.
    Scale: per-row JVM expressions."""
    d = _t(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("chars"),
        F.col("n_chars"),
        F.lit("tokens"),
        F.size(F.split("text", " ")).cast("long"),
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    big_only = F.map_filter(doubled, lambda _, v: v >= 400)
    zipped = F.map_zip_with(m, doubled, lambda _, a, b: b - a)
    return d.select(
        "doc_id",
        F.element_at(doubled, "chars").alias("chars_x2"),
        F.size(big_only).alias("n_big"),
        F.element_at(zipped, "chars").alias("zip_diff"),
    )


# ---------------------------------------------------------------------------
# FN-string — edit distance + padding/translate battery.
# ---------------------------------------------------------------------------

_PANGRAM = "the quick brown fox jumps over the lazy dog"


@register(
    "q_string_battery2",
    tags=("FN-string",),
    oracle=f"""
SELECT doc_id,
       CAST(levenshtein(substr(text, 1, 24), '{_PANGRAM}') AS INT) AS edit_dist,
       reverse(lang) AS lang_rev,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_key,
       repeat(lang, 2) AS lang2,
       translate(source, 'aeiou', 'AEIOU') AS src_caps_vowels
FROM documents
""",
)
def q_string_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """levenshtein / reverse / lpad / repeat / translate — the
    edit-distance member is the fuzzy-match primitive for short keys
    (exact O(len^2) per pair; at corpus scale use it only as the
    refine step after an n-gram blocking join, cf. X2)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.levenshtein(F.substring("text", 1, 24), F.lit(_PANGRAM)).alias(
            "edit_dist"
        ),
        F.reverse("lang").alias("lang_rev"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_key"),
        F.repeat("lang", 2).alias("lang2"),
        F.translate("source", "aeiou", "AEIOU").alias("src_caps_vowels"),
    )


# ---------------------------------------------------------------------------
# A1 — median + deterministic mode.
# ---------------------------------------------------------------------------


@register(
    "q_median_mode",
    tags=("A1", "FN-math"),
    oracle="""
WITH modes AS (
  SELECT o_orderstatus, o_orderpriority,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rnk
  FROM orders GROUP BY o_orderstatus, o_orderpriority
), med AS (
  SELECT l_returnflag AS flag, round(median(l_quantity), 6) AS med_qty,
         round(median(l_extendedprice), 4) AS med_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT m.o_orderstatus AS grp, m.o_orderpriority AS mode_priority,
       d.med_qty, d.med_price
FROM modes m JOIN med d
  ON d.flag = CASE m.o_orderstatus WHEN 'O' THEN 'N'
                                   WHEN 'F' THEN 'A' ELSE 'R' END
WHERE m.rnk = 1
""",
)
def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() (continuous-interpolation, both engines average the two
    middle values with identical IEEE math) and a DETERMINISTIC mode:
    bare mode() is engine-arbitrary on frequency ties, so the mode is
    formulated as the explicit argmax (count DESC, value ASC) — the
    same tiebreak discipline q_minmax_by uses for max_by.

    Scale: median is a full-sort-per-group operator (Spark runs it as
    percentile, a single shuffle + per-group sort); the mode argmax is
    two hash aggregations + a tiny window over group cardinality."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    modes = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
    )
    med = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
    )
    pairing = F.when(F.col("o_orderstatus") == "O", "N").when(
        F.col("o_orderstatus") == "F", "A"
    ).otherwise("R")
    return modes.join(med, med.flag == pairing).select(
        F.col("o_orderstatus").alias("grp"),
        F.col("o_orderpriority").alias("mode_priority"),
        "med_qty",
        "med_price",
    )


# ---------------------------------------------------------------------------
# FN-map — transform_keys (completes the map-HOF family of q_map_hofs).
# ---------------------------------------------------------------------------


@register(
    "q_transform_keys",
    tags=("FN-map",),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
       CAST(n_chars * 2 AS BIGINT) AS doubled
FROM documents WHERE doc_id < 100
""",
)
def q_transform_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_keys over a built map, verified by extracting through
    the REKEYED map (upper-cased key) — proves key rewrite happened.
    Output is serialized to scalars (map cells don't hash)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    m = F.create_map(
        F.lit("tokens"), F.size(F.split("text", " ")).cast("long"),
        F.lit("chars"), F.col("n_chars"),
    )
    rekeyed = F.transform_keys(m, lambda k, _: F.upper(k))
    doubled = F.transform_values(rekeyed, lambda _, v: v * 2)
    return d.select(
        "doc_id",
        F.element_at(rekeyed, "TOKENS").cast("int").alias("n_toks"),
        F.element_at(doubled, "CHARS").alias("doubled"),
    )


# ---------------------------------------------------------------------------
# X5 — token-distribution entropy (quality scoring signal).
# ---------------------------------------------------------------------------


@register(
    "q_token_entropy",
    tags=("X5", "A1"),
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
), cnt AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_toks,
       round(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE), 6) AS entropy
FROM cnt GROUP BY doc_id
""",
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    repetition-detection member of the quality-score family (low
    entropy = template/spam-like text; filters feed LM-corpus
    curation).  Algebraic form ln(N) - Σ c·ln(c)/N avoids per-token
    division and is two hash aggregations — fully partial-aggregable,
    no window.  round(6) absorbs libm last-ulp drift between engines."""
    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("double")
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.round(
            F.log(n) - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))) / n,
            6,
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# X5 — sequence packing (concat-and-chunk bin assignment).
# ---------------------------------------------------------------------------

_PACK_CAPACITY = 200  # tokens per packed sequence


@register(
    "q_sequence_pack",
    tags=("X5", "W3"),
    oracle=f"""
SELECT doc_id, lang,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
         PARTITION BY lang ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS start_offset,
       CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
         PARTITION BY lang ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {_PACK_CAPACITY} AS BIGINT) AS bin
FROM documents
""",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LM training data: concatenate documents in
    a deterministic order (doc_id within language) and chunk the token
    stream every {capacity} tokens; each doc is assigned the bin its
    first token lands in.  One running-sum window — no UDF, no loop;
    the window partitions by language so no single global sort at
    scale (shard key in production: (lang, shard_id) from a hash).

    This is the concat-then-chunk packing used to build fixed-length
    training sequences; the companion gather step (group docs by bin)
    is a groupBy on the emitted bin column."""
    d = _t(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(n_toks).over(w), F.lit(0)).cast("long")
    return d.select(
        "doc_id",
        "lang",
        n_toks.alias("n_toks"),
        start.alias("start_offset"),
        F.floor(start / _PACK_CAPACITY).cast("long").alias("bin"),
    )


# ---------------------------------------------------------------------------
# X1 — prefix dedup (exact-dedup variant on a normalized key).
# ---------------------------------------------------------------------------


@register(
    "q_prefix_dedup",
    tags=("X1",),
    oracle="""
SELECT substring(text, 1, 32) AS prefix,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY 1
HAVING COUNT(*) > 1
""",
)
def q_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups by 32-char text prefix — the cheap first pass
    of a dedup cascade (prefix buckets -> full-content hash -> near-dup
    LSH), each stage shrinking the candidate set for the next.  Plain
    groupBy-hash: shuffle carries the 32-byte key only."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.substring("text", 1, 32).alias("prefix"))
        .agg(
            F.min("doc_id").alias("keep_doc"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# X5/X1 — benchmark decontamination (n-gram overlap vs an eval set).
# ---------------------------------------------------------------------------

_DECON_N = 4  # tokens per shingle


@register(
    "q_decontaminate",
    tags=("X5", "X1", "J9"),
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), grams AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(2, len(toks) - {_DECON_N} + 2)),
           i -> array_to_string(toks[CAST(i AS BIGINT):CAST(i + {_DECON_N} - 1 AS BIGINT)], ' ')
         ) AS gs
  FROM corpus
), flat AS (
  SELECT doc_id, unnest(gs) AS g FROM grams
), bench AS (
  SELECT DISTINCT g FROM flat WHERE doc_id < 10
)
SELECT f.doc_id,
       CAST(COUNT(DISTINCT f.g) AS BIGINT) AS n_hit_grams
FROM flat f JOIN bench b ON f.g = b.g
WHERE f.doc_id >= 10
GROUP BY f.doc_id
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    _DECON_N-token (4-token) shingle with the eval set (doc_id < 10
    stands in for the benchmark) — the standard n-gram-overlap
    contamination check run before LM training.

    Plan: shingle both sides JVM-side (sequence + slice + array_join,
    no UDF), broadcast the DISTINCT benchmark grams (eval sets are
    small by definition), hash-join on the gram string, count distinct
    hits per corpus doc.  At 100 TB the corpus side is a linear scan +
    explode; the shuffle carries only (doc_id, gram-hash) matches."""
    d = _t(spark, sf_dir, "documents")
    # materialize the token array BEFORE the gram lambda: referencing a
    # fresh split() inside transform() re-evaluates it per gram element
    # (no CSE across the lambda boundary) — a 20x slowdown measured
    toked = d.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.lit(1), F.size("toks") - F.lit(_DECON_N - 1)
                    ),
                ),
                lambda i: F.array_join(F.slice("toks", i, _DECON_N), " "),
            )
        ).alias("g"),
    ).localCheckpoint(eager=True)  # shingled once; both join sides reuse
    bench = (
        grams.filter(F.col("doc_id") < 10).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hit_grams"))
    )


# ---------------------------------------------------------------------------
# X5 — packed-payload assembly (companion gather step of q_sequence_pack).
# ---------------------------------------------------------------------------


@register(
    "q_pack_payload",
    tags=("X5", "A1"),
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, lang, text,
         CAST(COALESCE(SUM(len(string_split(text, ' '))) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {_PACK_CAPACITY} AS BIGINT) AS bin
  FROM documents
)
SELECT lang, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       md5(string_agg(text, chr(30) ORDER BY doc_id)) AS payload_md5,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
FROM assigned
GROUP BY lang, bin
""",
)
def q_pack_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gather step of sequence packing: concatenate each bin's
    documents in doc_id order (record-separator joined) into one
    training-sequence payload.  Output carries the md5 of the packed
    payload rather than the payload itself (scalar-hashable, and at
    100 TB you'd write the payload to the sink, not the result set).

    Order-deterministic aggregation without relying on engine
    accumulation order: collect_list(struct(doc_id, text)) →
    array_sort (sorts by the leading struct field) → transform out the
    text → array_join.  Every step JVM-side."""
    d = _t(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(n_toks).over(w), F.lit(0)).cast("long")
    assigned = d.select(
        "doc_id",
        "lang",
        "text",
        n_toks.alias("nt"),
        F.floor(start / _PACK_CAPACITY).cast("long").alias("bin"),
    )
    packed = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s["text"],
        ),
        "\x1e",
    )
    return assigned.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.md5(packed).alias("payload_md5"),
        F.sum("nt").alias("n_toks"),
    )


# ---------------------------------------------------------------------------
# A3 — approximate quantiles (t-digest style percentile_approx).
# ---------------------------------------------------------------------------


@register(
    "q_approx_quantiles",
    tags=("A3",),
    oracle=None,  # sketch estimates are engine-specific; the accuracy
    # envelope vs exact percentiles is asserted in tests/test_batch_queries.py
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx p50/p90/p99 of order totals per status — the
    mergeable-sketch quantile path (per-partition digests merge
    associatively; shuffle carries digests, not rows).  accuracy=10000
    bounds rank error to ~1e-4·n; the ε envelope against exact
    percentile() is pinned in pytest.  At 100 TB this replaces exact
    percentile whenever a full per-group sort is not worth it."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
    )


# ---------------------------------------------------------------------------
# X5 — deterministic dataset shuffle + shard assignment.
# ---------------------------------------------------------------------------

_N_SHARDS = 16


@register(
    "q_shard_assign",
    tags=("X5", "O1"),
    oracle=f"""
SELECT doc_id,
       CAST(rn % {_N_SHARDS} AS BIGINT) AS shard,
       CAST(rn // {_N_SHARDS} AS BIGINT) AS pos_in_shard
FROM (
  SELECT doc_id,
         row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS rn
  FROM documents
)
""",
)
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle + round-robin shard assignment — the
    'randomize example order, then write N shards' step of training
    data prep, made deterministic and engine-portable by ordering on
    md5(seed:id) instead of a RNG (same permutation on any engine, any
    partitioning, any rerun).

    Scale: the global position runs through
    operators/ranking.global_row_number — range-partition on the hash
    (each partition learns its offset from a partition-count-sized
    broadcast), so no single-partition sort exists and the hash ORDER
    itself stays embarrassingly parallel.  Round-robin on the
    shuffled order gives shards that are i.i.d. samples, so
    per-shard loss curves are comparable."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    ranked = global_row_number(
        d.select("doc_id", h.alias("_h")), ["_h", "doc_id"], out="_rn1"
    )
    rn = F.col("_rn1") - 1
    return ranked.select(
        "doc_id",
        (rn % _N_SHARDS).cast("long").alias("shard"),
        F.floor(rn / _N_SHARDS).cast("long").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# P4/P5 — try_cast / try_element_at battery (safe-coercion family).
# ---------------------------------------------------------------------------


@register(
    "q_try_casts",
    tags=("P4", "P5"),
    oracle="""
SELECT doc_id,
       TRY_CAST(lang AS INTEGER) AS lang_as_int,
       TRY_CAST(CAST(doc_id AS VARCHAR) AS INTEGER) AS id_roundtrip,
       TRY_CAST(substring(text, 1, 3) AS DOUBLE) AS text_as_num,
       string_split(text, ' ')[1] AS first_tok,
       CASE WHEN len(string_split(text, ' ')) >= 1000
            THEN string_split(text, ' ')[1000] END AS tok_1000
FROM documents WHERE doc_id < 100
""",
)
def q_try_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast (NULL, never error, on bad coercion) and
    try_element_at (NULL on out-of-bounds index) — the safe-coercion
    family a 100 TB ingest needs: one malformed cell must not kill a
    stage.  Oracle: DuckDB TRY_CAST + guarded list index (DuckDB list
    indexing returns NULL out-of-bounds natively)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("doc_id").cast("string").try_cast("int").alias("id_roundtrip"),
        F.substring("text", 1, 3).try_cast("double").alias("text_as_num"),
        F.try_element_at(toks, F.lit(1)).alias("first_tok"),
        F.try_element_at(toks, F.lit(1000)).alias("tok_1000"),
    )


# ---------------------------------------------------------------------------
# X5 — repetition ratio (max-token-frequency quality score).
# ---------------------------------------------------------------------------


@register(
    "q_repetition_ratio",
    tags=("X5", "A1", "W4"),
    oracle="""
WITH cnt AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_toks,
       CAST(MAX(c) AS BIGINT) AS max_tok_freq,
       round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS rep_ratio
FROM cnt GROUP BY doc_id
""",
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition ratio: the most frequent token's share of the
    document — the cheap complement of q_token_entropy for detecting
    degenerate/repetitive text (boilerplate, keyword stuffing).  Two
    hash aggregations, fully partial-aggregable."""
    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.max("c").alias("max_tok_freq"),
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# P1/FN — struct column ops (create, nest, access, compare).
# ---------------------------------------------------------------------------


@register(
    "q_struct_ops",
    tags=("P1", "A1"),
    oracle="""
SELECT o_orderstatus,
       CAST(MAX(struct_pack(p := o_totalprice, k := o_orderkey)).p AS DOUBLE)
         AS top_price,
       CAST(MAX(struct_pack(p := o_totalprice, k := o_orderkey)).k AS BIGINT)
         AS top_key
FROM orders
GROUP BY o_orderstatus
""",
)
def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct ordering as deterministic argmax: max(struct(price, key))
    compares field-by-field left-to-right, so the key rides along with
    its price and ties break on the key — the struct-native form of
    q_minmax_by's integer-compound trick.  Output unpacks to scalar
    fields (struct cells don't hash in the driver)."""
    o = _t(spark, sf_dir, "orders")
    top = F.max(F.struct("o_totalprice", "o_orderkey"))
    return o.groupBy("o_orderstatus").agg(
        top.getField("o_totalprice").alias("top_price"),
        top.getField("o_orderkey").alias("top_key"),
    )


# ---------------------------------------------------------------------------
# FN-string — binary/encoding battery.
# ---------------------------------------------------------------------------


@register(
    "q_encode_funcs",
    tags=("FN-string",),
    oracle="""
SELECT doc_id,
       base64(encode(lang)) AS lang_b64,
       upper(hex(encode(source))) AS src_hex,
       CAST(octet_length(encode(text)) AS INT) AS text_bytes,
       lower(to_hex(doc_id)) AS id_hex
FROM documents WHERE doc_id < 100
""",
)
def q_encode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 / hex / octet-length / int-to-hex — the binary-encoding
    scalars a payload pipeline leans on (checksums, keys, wire
    formats).  All JVM codegen; no shuffle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.upper(F.hex(F.col("source").cast("binary"))).alias("src_hex"),
        F.octet_length("text").alias("text_bytes"),
        F.lower(F.hex("doc_id")).alias("id_hex"),
    )


# ---------------------------------------------------------------------------
# P5 — null-handling battery.
# ---------------------------------------------------------------------------


@register(
    "q_null_funcs",
    tags=("P5",),
    oracle="""
SELECT doc_id,
       COALESCE(NULLIF(lang, 'en'), 'default') AS lang_or_default,
       CASE WHEN NULLIF(n_chars, 0) IS NULL THEN -1 ELSE n_chars END AS chars_nz,
       GREATEST(n_chars, CAST(doc_id AS BIGINT)) AS g,
       LEAST(n_chars, CAST(doc_id AS BIGINT)) AS l,
       CASE WHEN lang = 'en' THEN NULL ELSE lang END IS NULL AS en_blanked
FROM documents WHERE doc_id < 200
""",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / nvl2-shape / greatest / least — NULL
    plumbing.  nullif + coalesce compose into defaulting rules; the
    greatest/least pair is the row-wise (not aggregate) min/max.
    Codegen scalars, no shuffle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.coalesce(F.nullif("lang", F.lit("en")), F.lit("default")).alias(
            "lang_or_default"
        ),
        F.nvl2(F.nullif("n_chars", F.lit(0)), F.col("n_chars"), F.lit(-1)).alias(
            "chars_nz"
        ),
        F.greatest("n_chars", F.col("doc_id").cast("long")).alias("g"),
        F.least("n_chars", F.col("doc_id").cast("long")).alias("l"),
        F.isnull(F.nullif("lang", F.lit("en"))).alias("en_blanked"),
    )


# ---------------------------------------------------------------------------
# Rel — table generator: sequence + explode (generate_series twin).
# ---------------------------------------------------------------------------


@register(
    "q_generate_series",
    tags=("P1", "FN-array"),
    oracle="""
SELECT r_regionkey,
       CAST(gs.g AS BIGINT) AS step,
       CAST(r_regionkey * 10 + gs.g AS BIGINT) AS derived
FROM region, generate_series(0, 4) AS gs(g)
""",
)
def q_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generator: sequence(0,4) exploded per input row — the
    DataFrame twin of SQL generate_series / LATERAL VIEW explode,
    the idiom for calendar spines, bucket skeletons, salt fan-outs.
    Expand node, no shuffle."""
    r = _t(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("step"),
    ).select(
        "r_regionkey",
        F.col("step").cast("long").alias("step"),
        (F.col("r_regionkey") * 10 + F.col("step")).cast("long").alias("derived"),
    )


# ---------------------------------------------------------------------------
# FN-datetime — timestamp difference/add battery (unit arithmetic).
# ---------------------------------------------------------------------------


@register(
    "q_timestamp_diffs",
    tags=("FN-datetime",),
    oracle="""
SELECT event_id,
       CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
         AS mins_since_epoch0,
       CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
         AS days_since,
       CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS unix_s,
       ts + INTERVAL 90 MINUTE AS ts_plus90m
FROM events WHERE event_id < 1000
""",
)
def q_timestamp_diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestampdiff units (minute/day), unix seconds, interval add —
    the event-time arithmetic kit under every windowing layer.
    NOTE DuckDB's date_diff counts UNIT BOUNDARIES crossed while
    Spark's timestampdiff counts full elapsed units — identical only
    when the anchor sits ON a boundary (midnight anchor here; a
    mid-unit anchor would diverge).  Codegen scalars."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    anchor = "TIMESTAMP '2024-01-01 00:00:00'"
    return e.select(
        "event_id",
        F.expr(f"timestampdiff(MINUTE, {anchor}, ts)").alias("mins_since_epoch0"),
        F.expr(f"timestampdiff(DAY, {anchor}, ts)").alias("days_since"),
        F.unix_timestamp("ts").alias("unix_s"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus90m"),
    )


# ---------------------------------------------------------------------------
# §3.2 — parameterized SQL front door (named parameter markers).
# ---------------------------------------------------------------------------


@register(
    "q_parameterized_sql",
    tags=("P2", "A1"),
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_totalprice > 250000.0
GROUP BY o_orderstatus
""",
)
def q_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql with named parameter markers (:thr) — the injection-
    safe SQL front door (Spark 4 parameterized queries); the literal
    binds at parse time, so pushdown/pruning see a constant exactly as
    if it were inlined."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders_v "
        "WHERE o_totalprice > :thr GROUP BY o_orderstatus",
        args={"thr": 250000.0},
    )


# ---------------------------------------------------------------------------
# W2 — value window functions (first/last/nth, IGNORE NULLS).
# ---------------------------------------------------------------------------


@register(
    "q_window_value_funcs",
    tags=("W2", "W3"),
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       first_value(CASE WHEN o_totalprice > 300000 THEN o_totalprice END
                   IGNORE NULLS) OVER w AS first_big
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a full-partition
    frame, plus the IGNORE NULLS variant (first value satisfying a
    predicate — the classic 'first qualifying event' idiom).  The
    frame is pinned UNBOUNDED/UNBOUNDED because last_value over the
    default frame (UNBOUNDED..CURRENT ROW) is a famous footgun both
    engines share; ties on o_orderdate are broken by o_orderkey so
    every value function is deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    big = F.when(F.col("o_totalprice") > 300000, F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first(big, ignorenulls=True).over(w).alias("first_big"),
    )


# ---------------------------------------------------------------------------
# FN-string — regexp battery 2 (count / instr / substr).
# ---------------------------------------------------------------------------


@register(
    "q_regexp_battery2",
    tags=("FN-string",),
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, 'ta[a-z]+')) AS INT) AS n_ta_words,
       COALESCE(regexp_extract(text, 'st[a-z]+'), '') AS first_st,
       CAST(CASE WHEN regexp_matches(text, 'window') THEN 1 ELSE 0 END AS INT)
         AS has_window
FROM documents WHERE doc_id < 200
""",
)
def q_regexp_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / regexp_substr / rlike — pattern-scan scalars
    beyond extract/replace (already covered).  regexp_substr returns
    NULL on no-match in Spark vs '' conventions elsewhere — both sides
    coalesce to '' so the miss case hashes identically."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("ta[a-z]+")).cast("int").alias("n_ta_words"),
        F.coalesce(F.regexp_substr("text", F.lit("st[a-z]+")), F.lit("")).alias(
            "first_st"
        ),
        F.col("text").rlike("window").cast("int").alias("has_window"),
    )


# ---------------------------------------------------------------------------
# FN-math/A1 — higher statistical moments (skewness / kurtosis).
# ---------------------------------------------------------------------------


@register(
    "q_higher_moments",
    tags=("FN-math", "A1"),
    oracle="""
WITH mu AS (
  SELECT o_orderstatus, avg(o_totalprice) AS m
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(avg(pow(o_totalprice - m, 3))
             / pow(avg(pow(o_totalprice - m, 2)), 1.5), 6) AS skew,
       round(avg(pow(o_totalprice - m, 4))
             / pow(avg(pow(o_totalprice - m, 2)), 2) - 3.0, 6) AS kurt
FROM orders o JOIN mu ON o.o_orderstatus = mu.o_orderstatus
GROUP BY o.o_orderstatus
""",
)
def q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness / kurtosis per group.  Spark computes POPULATION
    moments (g1, excess g2); DuckDB's built-ins apply sample-bias
    correction, so the oracle states the population formula explicitly
    from centered power sums — same estimator, two codebases.
    round(6) absorbs accumulation-order float drift.  Scale: Spark's
    implementation is a single-pass mergeable moment sketch (partial
    aggregation works); the oracle's two-pass form is oracle-only."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.skewness("o_totalprice"), 6).alias("skew"),
        F.round(F.kurtosis("o_totalprice"), 6).alias("kurt"),
    )


# ---------------------------------------------------------------------------
# A3 — KLL quantile sketch (mergeable two-level rollup, like q_hll_sketch).
# ---------------------------------------------------------------------------


@register(
    "q_kll_quantiles",
    tags=("A3",),
    oracle=None,  # sketch internals are engine-specific; ε vs exact
    # percentile asserted in tests/test_batch_queries.py
)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches with a two-level rollup: per-(status, year)
    sketches merged into per-status quantiles via kll_merge_agg — the
    datasketches quantile path (bounded-size, mergeable partials; the
    persistable-daily-sketch pattern of q_hll_sketch applied to
    quantiles instead of distinct counts)."""
    o = _t(spark, sf_dir, "orders")
    per_year = o.groupBy(
        "o_orderstatus", F.year("o_orderdate").alias("yr")
    ).agg(F.expr("kll_sketch_agg_double(o_totalprice)").alias("sk"))
    return (
        per_year.groupBy("o_orderstatus")
        .agg(F.expr("kll_merge_agg_double(sk)").alias("msk"))
        .select(
            "o_orderstatus",
            F.expr("kll_sketch_get_quantile_double(msk, 0.5)").alias("p50"),
            F.expr("kll_sketch_get_quantile_double(msk, 0.9)").alias("p90"),
            F.expr("kll_sketch_get_n_double(msk)").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# A3 — theta sketches: approximate distinct WITH set algebra.
# ---------------------------------------------------------------------------


@register(
    "q_theta_setops",
    tags=("A3", "U2", "U3"),
    oracle=None,  # sketch estimates are engine-specific; exactness
    # envelope asserted in tests/test_batch_queries.py
)
def q_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches: per-event-type distinct-user sketches that
    support UNION / INTERSECTION across groups — the mergeable way to
    answer 'users who did A and B' without re-scanning raw data
    (a plain COUNT DISTINCT cannot intersect two precomputed counts).
    Scale: sketches are KB-sized; segment sketches persist and any
    cross-segment set question is sketch algebra, not a 100 TB scan."""
    e = _t(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    sk.createOrReplaceTempView("theta_by_type")
    return spark.sql("""
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               theta_sketch_estimate(a.sk) AS est_a,
               theta_sketch_estimate(b.sk) AS est_b,
               theta_sketch_estimate(theta_union(a.sk, b.sk)) AS est_union,
               theta_sketch_estimate(theta_intersection(a.sk, b.sk)) AS est_intersect
        FROM theta_by_type a JOIN theta_by_type b
          ON a.event_type < b.event_type
    """)


# ---------------------------------------------------------------------------
# X5 — PII masking (mask built-in, exact regexp oracle).
# ---------------------------------------------------------------------------


@register(
    "q_mask_pii",
    tags=("X5", "FN-string"),
    oracle="""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
           substring(text, 1, 40), '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
           '[0-9]', 'n', 'g') AS masked,
       regexp_replace(substring(source, 1, 20), '[0-9]', '*', 'g') AS src_digits_starred
FROM documents WHERE doc_id < 150
""",
)
def q_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask(): the PII-redaction scalar (upper→X, lower→x, digit→n,
    other kept) over a text prefix, plus a digits-only custom mask —
    the anonymization step of a training-data pipeline.  The oracle
    states mask()'s exact contract as a regexp chain."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.mask(F.substring("text", 1, 40)).alias("masked"),
        F.expr(
            "mask(substring(source, 1, 20), NULL, NULL, '*', NULL)"
        ).alias("src_digits_starred"),
    )


# ---------------------------------------------------------------------------
# FN-string — battery 3 (split_part / substring_index / overlay / initcap).
# ---------------------------------------------------------------------------


@register(
    "q_string_battery3",
    tags=("FN-string",),
    oracle="""
SELECT doc_id,
       split_part(text, ' ', 2) AS second_tok,
       CASE WHEN len(string_split(text, ' ')) >= 2
            THEN string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]
            ELSE text END AS first_two,
       left(text, 5) AS l5,
       right(text, 5) AS r5,
       'prefix-' || lang AS tagged
FROM documents WHERE doc_id < 150
""",
)
def q_string_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part / substring_index / left / right / concat — the
    delimiter-arithmetic string family (key parsing, path splitting).
    substring_index(s, d, 2) ≡ first two delimited fields."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return d.select(
        "doc_id",
        F.split_part("text", F.lit(" "), F.lit(2)).alias("second_tok"),
        F.substring_index("text", " ", 2).alias("first_two"),
        F.left("text", F.lit(5)).alias("l5"),
        F.right("text", F.lit(5)).alias("r5"),
        F.concat(F.lit("prefix-"), F.col("lang")).alias("tagged"),
    )


# ---------------------------------------------------------------------------
# FN-string — AES encrypt/decrypt round trip.
# ---------------------------------------------------------------------------


@register(
    "q_aes_roundtrip",
    tags=("FN-string",),
    oracle="""
SELECT doc_id, lang AS recovered
FROM documents WHERE doc_id < 100
""",
)
def q_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aes_decrypt(aes_encrypt(x)) == x — exercises the AES function
    family with an identity oracle. ECB is used ONLY because it is
    deterministic (no IV), which the cross-engine hash comparison
    needs; it leaks equal-plaintext patterns and is NOT a production
    PII-at-rest mode — real column encryption uses F.aes_encrypt(...,
    'GCM') with a stored random IV per value."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    enc = F.aes_encrypt(F.col("lang"), key, F.lit("ECB"))
    dec = F.aes_decrypt(enc, key, F.lit("ECB"))
    return d.select("doc_id", dec.cast("string").alias("recovered"))


# ---------------------------------------------------------------------------
# FN-datetime — calendar battery 2 (construction + field extraction).
# ---------------------------------------------------------------------------


@register(
    "q_calendar_battery2",
    tags=("FN-datetime",),
    oracle="""
SELECT o_orderkey,
       make_date(2025, CAST(date_part('month', o_orderdate) AS INT), 1)
         AS month_anchor,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
       CAST(date_part('doy', o_orderdate) AS INT) AS doy,
       CAST(CASE WHEN dayofweek(o_orderdate) = 0 THEN 1
                 ELSE dayofweek(o_orderdate) + 1 END AS INT) AS dow_sun1
FROM orders WHERE o_orderkey < 2000
""",
)
def q_calendar_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_date / trunc-to-month / ISO week / day-of-year /
    day-of-week — calendar construction + extraction.  Cross-engine
    trap: Spark dayofweek is 1=Sunday..7=Saturday, DuckDB 0=Sunday..6
    — the oracle restates Spark's convention explicitly."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.make_date(F.lit(2025), F.month("o_orderdate"), F.lit(1)).alias(
            "month_anchor"
        ),
        F.trunc("o_orderdate", "month").alias("month_start"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
    )


# ---------------------------------------------------------------------------
# P3 — JSON path accessors (get_json_object / json_tuple / lengths).
# ---------------------------------------------------------------------------


@register(
    "q_json_paths",
    tags=("P3",),
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.device') AS device,
       json_extract_string(props, '$.session') AS session_id,
       CAST(json_array_length(props, '$.tags') AS INT) AS n_tags
FROM events WHERE event_id < 2000
""",
)
def q_json_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-based JSON accessors — get_json_object ($.path string
    extraction) and json_tuple (multi-field single-parse) — the
    schema-on-read complement of the from_json struct decode
    (q_json_extract).  json_array_length counts without
    materializing the array."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    jt = e.select(
        "event_id",
        F.json_tuple("props", "device", "session").alias("device", "session_id"),
        F.json_array_length(F.get_json_object("props", "$.tags")).alias(
            "n_tags"
        ),
    )
    return jt


# ---------------------------------------------------------------------------
# A1 — ordered string aggregation (listagg WITHIN GROUP).
# ---------------------------------------------------------------------------


@register(
    "q_listagg",
    tags=("A1", "FN-string"),
    oracle="""
SELECT lang,
       string_agg(source, ',' ORDER BY source) AS sources_csv,
       string_agg(DISTINCT source, '|' ORDER BY source) AS distinct_csv
FROM (SELECT DISTINCT lang, source FROM documents)
GROUP BY lang
""",
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg with WITHIN GROUP (ORDER BY ...) — deterministic ordered
    string aggregation (Spark 4), the SQL-standard successor of the
    collect_list→sort→join idiom used elsewhere (q_pack_payload)."""
    d = _t(spark, sf_dir, "documents").select("lang", "source").distinct()
    d.createOrReplaceTempView("lang_sources")
    return spark.sql("""
        SELECT lang,
               listagg(source, ',') WITHIN GROUP (ORDER BY source)
                 AS sources_csv,
               listagg(DISTINCT source, '|') WITHIN GROUP (ORDER BY source)
                 AS distinct_csv
        FROM lang_sources GROUP BY lang
    """)


# ---------------------------------------------------------------------------
# FN-array — battery 2 (zip / flatten / repeat / position / contains).
# ---------------------------------------------------------------------------


@register(
    "q_array_battery2",
    tags=("FN-array",),
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 150)
SELECT doc_id,
       CAST(len(flatten([toks[1:2], toks[3:4]])) AS INT) AS flat_n,
       array_to_string(list_transform(range(1, 4), i -> toks[1]), ',') AS rep3,
       CAST(COALESCE(list_position(toks, 'table'), 0) AS INT) AS table_pos,
       list_contains(toks, 'spark') AS has_spark,
       CAST(greatest(len(toks), 0) AS INT) AS cardinality_
FROM t
""",
)
def q_array_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten / array_repeat / array_position / array_contains /
    cardinality — the remaining array-shape operators (serialized or
    scalar outputs only; arrays themselves never leave the plan)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2)))
        ).alias("flat_n"),
        F.array_join(
            F.array_repeat(F.element_at(toks, 1), 3), ","
        ).alias("rep3"),
        F.array_position(toks, "table").cast("int").alias("table_pos"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.cardinality(toks).alias("cardinality_"),
    )


# ---------------------------------------------------------------------------
# FN-math — bitwise / radix battery (bin, conv, getbit, shifts).
# ---------------------------------------------------------------------------


@register(
    "q_bitwise_battery",
    tags=("FN-math",),
    oracle="""
SELECT o_orderkey,
       bin(o_orderkey) AS bits,
       CAST(o_orderkey % 2 AS INT) AS bit0,
       CAST(o_orderkey * 8 AS BIGINT) AS shl3,
       CAST(o_orderkey // 4 AS BIGINT) AS shr2,
       xor(o_orderkey, 255) AS xored
FROM orders WHERE o_orderkey < 3000
""",
)
def q_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bin / getbit / shiftleft / shiftright / xor — integer bit
    plumbing (bucket ids, bloom/bitmap addressing, key packing).
    Shifts restated as *8 and //4 in the oracle: identical for the
    non-negative keys here, and DuckDB's >> on INT32 differs from
    Spark's on sign-extension so the arithmetic form is the portable
    truth."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.bin("o_orderkey").alias("bits"),
        F.getbit("o_orderkey", F.lit(0)).cast("int").alias("bit0"),
        F.shiftleft("o_orderkey", 3).cast("long").alias("shl3"),
        F.shiftright("o_orderkey", 2).cast("long").alias("shr2"),
        F.col("o_orderkey").bitwiseXOR(F.lit(255)).alias("xored"),
    )


# ---------------------------------------------------------------------------
# FN-string — formatting battery (format_number / format_string / to_char).
# ---------------------------------------------------------------------------


@register(
    "q_format_funcs",
    tags=("FN-string",),
    oracle="""
SELECT o_orderkey,
       printf('%08d|%s', o_orderkey, o_orderstatus) AS packed_key,
       printf('%.2f', round(o_totalprice, 2)) AS price_2dp,
       CAST(round(o_totalprice, 0) AS BIGINT) AS price_rounded
FROM orders WHERE o_orderkey < 2000
""",
)
def q_format_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_string (printf-style packing — composite keys, log
    lines) and fixed-point formatting.  %.2f goes through an explicit
    round() first: printf alone half-rounds differently across libc
    implementations; round-then-format is the portable form."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.format_string("%08d|%s", "o_orderkey", "o_orderstatus").alias(
            "packed_key"
        ),
        F.format_string("%.2f", F.round("o_totalprice", 2)).alias("price_2dp"),
        F.round("o_totalprice", 0).cast("long").alias("price_rounded"),
    )


# ---------------------------------------------------------------------------
# FN-math — transcendental battery (trig / log / exp).
# ---------------------------------------------------------------------------


@register(
    "q_math_battery2",
    tags=("FN-math",),
    oracle="""
SELECT o_orderkey,
       round(sin(radians(o_totalprice % 360)), 8) AS s,
       round(cos(radians(o_totalprice % 360)), 8) AS c,
       round(atan2(CAST(o_orderkey % 7 AS DOUBLE), 3.0), 8) AS a2,
       round(ln(o_totalprice), 8) AS lnp,
       round(log10(o_totalprice), 8) AS log10p,
       round(exp(o_totalprice / 1000000.0), 8) AS e_small,
       round(cbrt(o_totalprice), 8) AS cbrtp
FROM orders WHERE o_orderkey < 2000
""",
)
def q_math_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sin/cos/atan2/radians/ln/log10/exp/cbrt — transcendental
    scalars (feature engineering: cyclical encodings, log transforms).
    round(8) absorbs libm last-ulp differences between engines."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    deg = F.col("o_totalprice") % 360
    return o.select(
        "o_orderkey",
        F.round(F.sin(F.radians(deg)), 8).alias("s"),
        F.round(F.cos(F.radians(deg)), 8).alias("c"),
        F.round(
            F.atan2((F.col("o_orderkey") % 7).cast("double"), F.lit(3.0)), 8
        ).alias("a2"),
        F.round(F.log("o_totalprice"), 8).alias("lnp"),
        F.round(F.log10("o_totalprice"), 8).alias("log10p"),
        F.round(F.exp(F.col("o_totalprice") / 1_000_000.0), 8).alias("e_small"),
        F.round(F.cbrt("o_totalprice"), 8).alias("cbrtp"),
    )


# ---------------------------------------------------------------------------
# J-family — null-safe equality join (<=> / IS NOT DISTINCT FROM).
# ---------------------------------------------------------------------------


@register(
    "q_null_safe_join",
    tags=("J4", "P5"),
    oracle="""
WITH l AS (
  SELECT doc_id, NULLIF(lang, 'de') AS k FROM documents WHERE doc_id < 60
), r AS (
  SELECT doc_id AS rid, NULLIF(lang, 'de') AS k FROM documents
  WHERE doc_id >= 60 AND doc_id < 120
)
SELECT l.doc_id, r.rid
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
""",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=>): NULL keys MATCH each other instead
    of vanishing — the semantics dimension plain equi-joins miss
    (NULL = NULL is NULL, so ordinary joins silently drop NULL-keyed
    rows).  Catalyst plans <=> as a hash join (EqualNullSafe is an
    equi-key), so the 100 TB story is unchanged: still a shuffle hash
    join, not a nested loop."""
    d = _t(spark, sf_dir, "documents")
    left = d.filter(F.col("doc_id") < 60).select(
        "doc_id", F.nullif("lang", F.lit("de")).alias("k")
    )
    right = (
        d.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 120))
        .select(F.col("doc_id").alias("rid"), F.nullif("lang", F.lit("de")).alias("k2"))
    )
    return left.join(right, left.k.eqNullSafe(right.k2)).select("doc_id", "rid")


# ---------------------------------------------------------------------------
# U1 — unionByName with missing columns (schema-evolution union).
# ---------------------------------------------------------------------------


@register(
    "q_union_by_name",
    tags=("U1",),
    oracle="""
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 50
UNION ALL
SELECT doc_id, lang, NULL AS n_chars FROM documents
WHERE doc_id >= 50 AND doc_id < 100
""",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): position-independent,
    schema-evolving union — the append path when a new batch gains or
    loses columns (old rows NULL-fill).  Ordinary UNION is positional
    and would silently mis-align reordered columns."""
    d = _t(spark, sf_dir, "documents")
    full = d.filter(F.col("doc_id") < 50).select("doc_id", "lang", "n_chars")
    # second frame: different column ORDER and missing n_chars
    slim = (
        d.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
        .select("lang", "doc_id")
    )
    return full.unionByName(slim, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# §3.2 — modern SQL sugar: GROUP BY ALL + EXISTS subqueries.
# ---------------------------------------------------------------------------


@register(
    "q_group_by_all",
    tags=("A1",),
    oracle="""
SELECT o_orderstatus, CAST(date_part('year', o_orderdate) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ALL
""",
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 ≡ DuckDB): every non-aggregate select
    item becomes a grouping key — kills the classic
    add-a-column-forget-the-GROUP-BY bug in wide rollups."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql("""
        SELECT o_orderstatus, year(o_orderdate) AS yr, COUNT(*) AS n
        FROM orders_gba GROUP BY ALL
    """)


@register(
    "q_exists_subquery",
    tags=("J9",),
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
""",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the SQL spelling of semi/anti
    joins (q_semi_join / q_anti_join are the DataFrame spelling);
    Catalyst rewrites both predicates to LeftSemi/LeftAnti hash
    joins, so the plan story is identical."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer_ex c
        WHERE EXISTS (SELECT 1 FROM orders_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders_ex o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
    """)


# ---------------------------------------------------------------------------
# Round 3 — n-gram repetition (X5), event-funnel / retention / sessionization
# analytics (A1/W1-family product queries), gap-filled time series, and
# edit-distance fuzzy matching.
# ---------------------------------------------------------------------------


def _bigrams(toks: Column) -> Column:
    """Adjacent-token bigrams via zip_with over two shifted slices —
    pure JVM codegen (no explode-with-index, no Python).  Empty for
    arrays with fewer than 2 elements."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )


@register(
    "q_ngram_repetition",
    tags=("X5", "A1"),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) u
), cnt AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
  FROM grams GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       CAST(MAX(c) AS BIGINT) AS max_gram_freq,
       round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS rep2_ratio
FROM cnt GROUP BY doc_id
""",
)
def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram repetition ratio: the most frequent adjacent-token PAIR's
    share of all bigrams — catches looped phrases ("buy now buy now…")
    that q_repetition_ratio's single-token counter misses.  The n-gram
    member of the quality-score family; same two partial-aggregable
    hash aggregations, bigrams built JVM-side (zip_with over shifted
    slices, no re-tokenization inside the lambda)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    grams = toks.select("doc_id", F.explode(_bigrams(F.col("t"))).alias("gram"))
    cnt = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("max_gram_freq"),
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("rep2_ratio"),
    )


@register(
    "q_top_ngrams",
    tags=("X5", "O2"),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT t[i] || ' ' || t[i+1] AS gram
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) u
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram LIMIT 20
""",
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams — the vocabulary/boilerplate probe a
    corpus health dashboard starts with.  Hash aggregate then
    TakeOrderedAndProject (driver sees 20 rows); ties broken on the
    gram string so the LIMIT is a total order."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    grams = toks.select(F.explode(_bigrams(F.col("t"))).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(20)
    )


@register(
    "q_funnel",
    tags=("A1", "P5"),
    oracle="""
WITH u AS (
  SELECT user_id,
         MIN(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
         MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
         MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
       CAST(COUNT(CASE WHEN t_view > t_signup THEN 1 END) AS BIGINT)
         AS n_signup_view,
       CAST(COUNT(CASE WHEN t_view > t_signup AND t_purchase > t_view
                  THEN 1 END) AS BIGINT) AS n_full_funnel
FROM u
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → first view after it → first
    purchase after that) — the canonical product-analytics query.  One
    hash aggregate to per-user stage timestamps (conditional MIN — no
    self-joins), one global reduce; both partial-aggregable, so the
    whole funnel is two shuffles of |users| and 1 rows."""
    e = _t(spark, sf_dir, "events")

    def first_ts(ev: str) -> Column:
        return F.min(F.when(F.col("event_type") == ev, F.col("ts")))

    u = e.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("view").alias("t_view"),
        first_ts("purchase").alias("t_purchase"),
    )
    return u.agg(
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_view") > F.col("t_signup"), 1)).alias(
            "n_signup_view"
        ),
        F.count(
            F.when(
                (F.col("t_view") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "q_retention",
    tags=("A1", "J3"),
    oracle="""
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen ISO week,
    counted in each later active week.  distinct(user, week) then a
    user-keyed join back to the cohort table — at 100 TB the join is
    |users|-sized on both sides and co-partitioned on user_id; both
    date_trunc('week') engines truncate to Monday.  (act is already
    distinct per user×week, so COUNT(*) ≡ COUNT(DISTINCT user).)"""
    e = _t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    act = e.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).distinct()
    j = act.join(first, "user_id")
    return j.groupBy(
        "cohort",
        (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "q_cumulative_distinct",
    tags=("A2", "W3"),
    oracle="""
WITH f AS (
  SELECT event_type, user_id, CAST(MIN(ts) AS DATE) AS day
  FROM events GROUP BY event_type, user_id
), d AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM f GROUP BY event_type, day
)
SELECT event_type, day, new_users,
       CAST(SUM(new_users) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM d
""",
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day — the running
    count-distinct that window functions can't express directly; the
    standard rewrite keys each user to their FIRST day (per type) so a
    plain running SUM of first-appearances equals the cumulative
    distinct.  Two hash aggregates shrink 10k events to |types|×|days|
    rows before the (tiny, per-type) window."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("event_type", "user_id").agg(
        F.to_date(F.min("ts")).alias("day")
    )
    d = f.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@register(
    "q_gap_fill",
    tags=("P1", "J10", "FN-datetime"),
    oracle="""
WITH e2 AS (
  SELECT date_trunc('hour', ts) AS hr, event_type,
         CAST(round(value * 1000000.0) AS BIGINT) AS microval
  FROM events
), b AS (
  SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM e2
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
), types AS (
  SELECT DISTINCT event_type FROM e2
), agg AS (
  SELECT hr, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(microval) AS BIGINT) AS sv
  FROM e2 GROUP BY hr, event_type
)
SELECT s.hr, t.event_type,
       COALESCE(a.n, 0) AS n_events,
       COALESCE(a.sv, 0) AS val_sum_e6
FROM spine s CROSS JOIN types t
LEFT JOIN agg a ON a.hr = s.hr AND a.event_type = t.event_type
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per event type: a dense hour spine
    (sequence over the observed min..max, exploded) cross-joined with
    the type dimension, left-joined to the hourly aggregate, zeros
    where no events landed — resampling for downstream models that
    need every bucket present.  The spine is derived from a 1-row
    global agg, so grid and aggregate are both tiny relative to the
    scan; value sums are exact integer micro-units (order- and
    partitioning-independent)."""
    e = _t(spark, sf_dir, "events")
    e2 = e.select(
        F.date_trunc("hour", "ts").alias("hr"),
        "event_type",
        F.round(F.col("value") * 1000000.0).cast("long").alias("microval"),
    )
    bounds = e2.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = e2.select("event_type").distinct()
    agg = e2.groupBy("hr", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("microval").alias("sv")
    )
    grid = spine.crossJoin(types)
    return grid.join(agg, ["hr", "event_type"], "left").select(
        "hr",
        "event_type",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("sv", F.lit(0)).alias("val_sum_e6"),
    )


_SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6-hour inactivity gap


@register(
    "q_sessionize_batch",
    tags=("W2", "A1", "T4"),
    oracle=f"""
WITH m AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), b AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM b
), ps AS (
  SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_ev,
         MAX(us) - MIN(us) AS dur_us
  FROM s GROUP BY user_id, sess
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(MAX(n_ev) AS BIGINT) AS max_session_events,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us
FROM ps GROUP BY user_id
""",
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a session break wherever a
    user is idle > 6h, session ids as a running sum of breaks — the
    lag+cumsum rewrite that needs no stateful operator (the streaming
    twin is q_session_window / applyInPandasWithState).  All windows
    are partitioned by user_id, so state never leaves a partition;
    durations are integer microseconds (exact cross-engine).  Ordering
    ties broken by event_id so the cumsum is total-ordered."""
    e = _t(spark, sf_dir, "events")
    m = e.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    b = m.withColumn("prev", F.lag("us").over(w)).withColumn(
        "brk",
        F.when(
            F.col("prev").isNull()
            | ((F.col("us") - F.col("prev")) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    s = b.withColumn(
        "sess", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("n_ev").alias("max_session_events"),
        F.sum("dur_us").alias("total_dur_us"),
    )


@register(
    "q_rolling_time_range",
    tags=("W3", "FN-datetime"),
    oracle=f"""
WITH m AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 1000000.0) AS BIGINT) AS microval
  FROM events
)
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_6h,
       CAST(SUM(microval) OVER w AS BIGINT) AS val_sum_e6
FROM m WINDOW w AS (
  PARTITION BY user_id ORDER BY us
  RANGE BETWEEN {_SESSION_GAP_US} PRECEDING AND CURRENT ROW)
""",
)
def q_rolling_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 6-hour rolling count/sum per user — a RANGE frame over
    integer epoch-microseconds, so the frame boundary is exact and
    peer rows (equal timestamps) share one frame in every engine; the
    summed value is integer micro-units.  This is the time-valued
    range frame (q_window_range_frame's frame is numeric-valued);
    per-user partitions keep the sort local."""
    e = _t(spark, sf_dir, "events")
    m = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 1000000.0).cast("long").alias("microval"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_SESSION_GAP_US, 0)
    )
    return m.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_6h"),
        F.sum("microval").over(w).alias("val_sum_e6"),
    )


@register(
    "q_levenshtein_fuzzy",
    tags=("J6", "FN-string", "X2"),
    oracle="""
WITH p AS (SELECT p_partkey, p_name, p_brand, p_size FROM part)
SELECT a.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_fuzzy_pairs,
       CAST(MIN(levenshtein(a.p_name, b.p_name)) AS INT) AS min_dist,
       round(CAST(SUM(levenshtein(a.p_name, b.p_name)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_dist
FROM p a JOIN p b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
GROUP BY a.p_brand
""",
)
def q_levenshtein_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: near-identical part names inside a
    (brand, size) blocking group, pairs at levenshtein ≤ 4 — the
    record-linkage primitive for catalog dedup.  Blocking makes the
    quadratic local: pairs form only inside equi-join groups (≤7 rows
    per group here; at 100 TB the block key IS the shuffle key and
    skewed blocks split under AQE), never all-pairs."""
    p = _t(spark, sf_dir, "part")
    a = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
        F.col("p_partkey").alias("k1"),
        F.col("p_name").alias("n1"),
    )
    b = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
        F.col("p_partkey").alias("k2"),
        F.col("p_name").alias("n2"),
    )
    dist = F.levenshtein("n1", "n2")
    pairs = (
        a.join(b, ["brand", "size"])
        .filter(F.col("k1") < F.col("k2"))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= 4)
    )
    return pairs.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n_fuzzy_pairs"),
        F.min("dist").cast("int").alias("min_dist"),
        F.round(
            F.sum("dist").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_dist"),
    )
