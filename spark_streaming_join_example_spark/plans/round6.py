"""Round-6 additions: order statistics that RUN on the two-phase
distributed ranking kernels (operators/ranking) rather than promising
them in a docstring — exact global median and the Gini coefficient,
the two classic "needs a global order" statistics every analytics
engine is asked for.

Both follow the registry's integer doctrine: money in exact cents,
ranks/counts BIGINT, one floor division at the very end — so the
DuckDB oracle (written with ordinary single-partition windows) must
hash-match bit for bit, which is precisely the kernel-equivalence
claim (two-phase rank ≡ single sort) re-proven per query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.ranking import global_row_number
from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_exact_global_median",
    tags=("O1", "W1", "A1"),
    oracle="""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents, o_orderkey
  FROM orders
),
r AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM c
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS med_lo_c,
       CAST(MAX(cents) AS BIGINT) AS med_hi_c,
       CAST((MIN(cents) + MAX(cents)) // 2 AS BIGINT) AS med_avg_c
FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
""",
)
def q_exact_global_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median of order totals (lower/upper median in
    cents plus their floor average) — selected by POSITION under a
    total order, not estimated by a sketch: the answer a billing or
    SLA report must defend.

    Scale rationale: the global position comes from
    operators/ranking.global_row_number (range partition → local rank
    → broadcast offsets), so no single-partition sort exists; the
    count is a 1-row broadcast aggregate, and only the two middle rows
    survive the position filter.  This is the exact-median scale path
    the sketch queries (q_approx_quantiles) trade away, for the cases
    where "within 1e-4·n rank error" is not an acceptable answer.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
        "o_orderkey",
    )
    r = global_row_number(o, ["cents", "o_orderkey"], out="rn")
    t = r.join(
        F.broadcast(o.agg(F.count(F.lit(1)).cast("long").alias("n"))),
        how="cross",  # bounded: 1-row aggregate
    )
    sel = t.filter(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        | (F.col("rn") == F.expr("(n + 2) div 2"))
    )
    return sel.agg(
        F.max("n").alias("n"),
        F.min("cents").alias("med_lo_c"),
        F.max("cents").alias("med_hi_c"),
        F.expr("CAST((MIN(cents) + MAX(cents)) div 2 AS BIGINT)").alias(
            "med_avg_c"
        ),
    )


@register(
    "q_gini_coefficient",
    tags=("W1", "A1", "O1"),
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT rev_c,
         row_number() OVER (ORDER BY rev_c, o_custkey) AS rk
  FROM per_cust
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev_c) AS BIGINT) AS total_c,
         CAST(SUM(rk * rev_c) AS BIGINT) AS wsum
  FROM r
)
SELECT n, total_c,
       CAST(CAST(2 * wsum - (n + 1) * total_c AS HUGEINT) * 1000000
            // (CAST(n AS HUGEINT) * total_c) AS BIGINT) AS gini_ppm
FROM mom
""",
)
def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue (0 = perfectly equal,
    1e6 ppm = one customer is the whole book) via the rank identity
    G = (2·Σ rkᵢ·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over revenue-ascending
    ranks — the inequality number next to q_revenue_concentration's
    Lorenz deciles.

    Scale rationale: the rank is operators/ranking.global_row_number
    over the CUSTOMER-cardinality rollup (no single-partition sort);
    the identity then needs only one integer moment aggregate — no
    cumulative window at all, cheaper than the Lorenz curve.  The
    moments stay BIGINT (Σ rk·rev_c ≤ n²·max_rev_c ≈ 4.5e15 at
    sf0.1, int64-safe past sf1); the final ppm ratio would NOT be —
    numerator·1e6 tops 1e21 — so that one division runs in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact integral
    division, then lands back in BIGINT.
    """
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("long"))
        .cast("long")
        .alias("rev_c")
    )
    r = global_row_number(per_cust, ["rev_c", "o_custkey"], out="rk")
    mom = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_c").alias("total_c"),
        F.sum(F.col("rk") * F.col("rev_c")).alias("wsum"),
    )
    return mom.select(
        "n",
        "total_c",
        F.expr(
            "CAST(CAST(2 * wsum - (n + 1) * total_c AS DECIMAL(38,0)) "
            "* 1000000 div (CAST(n AS DECIMAL(38,0)) * total_c) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@register(
    "q_event_pattern",
    tags=("A1", "FN-string", "W2"),
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(length(s) AS BIGINT) AS seq_len,
       regexp_matches(s, 'c[^e]*p') AS converted_clean,
       regexp_matches(s, 's.*c.*p') AS full_funnel
FROM seq
""",
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (MATCH_RECOGNIZE-style, which Spark
    SQL lacks): detect, per user over the chronologically-ordered
    event-type initials, 'c[^e]*p' = a click eventually converting to
    a purchase with NO error in between, and 's.*c.*p' = the full
    signup→click→purchase funnel.  Subsumes fixed-step funnels
    (q_funnel) for patterns with exclusions and unbounded gaps.

    DAY-BOUNDED state (the 100 TB form): instead of encoding each
    user's ENTIRE history into one string (unbounded per-key state — a
    hot key with 10⁸ events would OOM a task), the events are first
    bucketed by (user_id, day).  Each day's bounded string is then
    collapsed into a constant-size automaton summary — the regexes
    compile to tiny NFAs whose day-chunk behavior is a transition
    FUNCTION, and transition functions compose associatively:

    - ``s.*c.*p`` is a 4-state prefix automaton; a day's summary is
      the vector (f0,f1,f2) = "state reached when entering the day in
      state 0/1/2" (state 3 absorbs), computable with three locate()
      chains over the day string;
    - ``c[^e]*p`` needs three bits per day: matched-within
      (`c[^e]*p`), match-on-entry-if-open (`^[^e]*p`), plus the
      open/no-e carry bits (`c[^e]*$`, absence of 'e').

    The per-user fold then runs over #days constant-size summaries
    (array_sort + F.aggregate), never over events — per-key state is
    bounded by events/day in the first aggregate and by days in the
    second, and the verdicts are IDENTICAL to the global regex (the
    oracle below still runs the plain regexes over the full string).

    Determinism: the per-day order is the total order (ts, event_id),
    day boundaries respect ts order, and the initials v/c/p/s/e are
    distinct for the fixture's five event types.
    """
    ev = _t(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("i"),
            )
        )
    )
    # level 1: (user, day) buckets — collect_list state bounded by one
    # day's events, exactly the q_top_paths discipline
    days = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_d"),
        F.concat_ws(
            "", F.transform(ordered, lambda x: x.getField("i"))
        ).alias("sd"),
    )
    # constant-size per-day automaton summaries (then the string dies)
    summarized = days.select(
        "user_id",
        "day",
        "n_d",
        F.length("sd").cast("long").alias("len_d"),
        F.col("sd").rlike("c[^e]*p").alias("m_within"),
        F.col("sd").rlike("^[^e]*p").alias("m_enter"),
        F.col("sd").rlike("c[^e]*$").alias("open_end"),
        (~F.col("sd").contains("e")).alias("no_e"),
        F.expr(
            "CAST(CASE WHEN locate('s', sd) = 0 THEN 0 "
            " WHEN locate('c', sd, locate('s', sd) + 1) = 0 THEN 1 "
            " WHEN locate('p', sd, "
            "        locate('c', sd, locate('s', sd) + 1) + 1) = 0 THEN 2 "
            " ELSE 3 END AS INT)"
        ).alias("f0"),
        F.expr(
            "CAST(CASE WHEN locate('c', sd) = 0 THEN 1 "
            " WHEN locate('p', sd, locate('c', sd) + 1) = 0 THEN 2 "
            " ELSE 3 END AS INT)"
        ).alias("f1"),
        F.expr(
            "CAST(CASE WHEN locate('p', sd) = 0 THEN 2 ELSE 3 END AS INT)"
        ).alias("f2"),
    )
    # level 2: fold the day summaries in day order — #days entries of
    # ~30 bytes each per user, not #events
    per_user = summarized.groupBy("user_id").agg(
        F.sum("n_d").alias("n_events"),
        F.sum("len_d").cast("long").alias("seq_len"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    "day", "m_within", "m_enter", "open_end",
                    "no_e", "f0", "f1", "f2",
                )
            )
        ).alias("ds"),
    )
    folded = per_user.withColumn(
        "acc",
        F.aggregate(
            "ds",
            F.struct(
                F.lit(False).alias("m"),
                F.lit(False).alias("o"),
                F.lit(0).cast("int").alias("st"),
            ),
            lambda acc, d: F.struct(
                (
                    acc.getField("m")
                    | d.getField("m_within")
                    | (acc.getField("o") & d.getField("m_enter"))
                ).alias("m"),
                (
                    d.getField("open_end")
                    | (acc.getField("o") & d.getField("no_e"))
                ).alias("o"),
                F.when(acc.getField("st") == 0, d.getField("f0"))
                .when(acc.getField("st") == 1, d.getField("f1"))
                .when(acc.getField("st") == 2, d.getField("f2"))
                .otherwise(F.lit(3).cast("int"))
                .alias("st"),
            ),
        ),
    )
    return folded.select(
        "user_id",
        "n_events",
        "seq_len",
        F.col("acc.m").alias("converted_clean"),
        (F.col("acc.st") == 3).alias("full_funnel"),
    )


@register(
    "q_inverted_index",
    tags=("X5", "A1", "FN-array", "O2"),
    oracle="""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
idx AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
         array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
  FROM toks WHERE tok <> '' GROUP BY tok
)
SELECT tok, df, postings
FROM idx WHERE df BETWEEN 5 AND 40
ORDER BY df DESC, tok LIMIT 50
""",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the retrieval-infrastructure
    primitive under BM25/keyword search: token → document frequency +
    SORTED posting list, here materialized for the discriminative
    band (5 ≤ df ≤ 40; stopword-frequency tokens are exactly the ones
    whose posting lists you'd store as bitmaps instead).

    Determinism: postings serialize as comma-joined sorted doc_id
    strings (the driver hashes scalar columns only) and the final
    top-50 orders by (df DESC, tok) — a total order.

    Scale rationale: distinct-(doc,token) then groupBy(token) = two
    shuffles on the token key, both partial-aggregable; posting lists
    for df-bounded tokens are small by selection, and the hot
    (high-df) tail is explicitly excluded — at 100 TB those become
    roaring bitmaps per shard (the q_bitmap_distinct machinery), while
    this query's band stays array-sized."""
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    idx = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings"),
    )
    return (
        idx.filter(F.col("df").between(5, 40))
        .orderBy(F.desc("df"), "tok")
        .limit(50)
    )


@register(
    "q_reconcile_totals",
    tags=("J10", "A1", "P5"),
    oracle="""
WITH li AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS li_total_c,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_orderkey, l_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_total_c,
         li_total_c, n_lines
  FROM orders FULL OUTER JOIN li ON o_orderkey = l_orderkey
)
SELECT
  CASE WHEN o_orderkey IS NULL THEN 'orphan_lineitems'
       WHEN l_orderkey IS NULL THEN 'empty_order'
       WHEN o_total_c = li_total_c THEN 'exact'
       WHEN ABS(o_total_c - li_total_c) * 100 <= o_total_c THEN 'within_1pct'
       ELSE 'mismatch' END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS n_lines,
  CAST(SUM(ABS(COALESCE(o_total_c, 0) - COALESCE(li_total_c, 0))) AS BIGINT)
    AS abs_delta_c
FROM j GROUP BY bucket
""",
)
def q_reconcile_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact reconciliation audit — the production data-quality
    query every warehouse runs nightly: does each order header's total
    agree with the sum of its lines?  FULL OUTER join surfaces BOTH
    orphan classes (lines without a header, headers without lines) and
    the delta distribution buckets in exact cents.

    Scale rationale: the lineitem side pre-aggregates to one row per
    order BEFORE the join (partial-agg'd |lineitem| shuffle), so the
    full-outer join is order-cardinality × order-cardinality on the
    same key — co-partitioned, skew-safe under AQE; the report is 5
    bucket rows.  Integer-cents comparisons make the bucket boundaries
    engine-exact (the 1% band compares ABS(delta)*100 ≤ total — no
    division)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("li_total_c"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    j = o.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("o_total_c")
    ).join(li_agg, F.col("o_orderkey") == F.col("l_orderkey"), "full_outer")
    bucket = (
        F.when(F.col("o_orderkey").isNull(), "orphan_lineitems")
        .when(F.col("l_orderkey").isNull(), "empty_order")
        .when(F.col("o_total_c") == F.col("li_total_c"), "exact")
        .when(
            F.abs(F.col("o_total_c") - F.col("li_total_c")) * 100 <= F.col("o_total_c"),
            "within_1pct",
        )
        .otherwise("mismatch")
    )
    return (
        j.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.coalesce(F.col("n_lines"), F.lit(0))).alias("n_lines"),
            F.sum(
                F.abs(
                    F.coalesce(F.col("o_total_c"), F.lit(0))
                    - F.coalesce(F.col("li_total_c"), F.lit(0))
                )
            ).alias("abs_delta_c"),
        )
    )


@register(
    "q_active_users_rolling",
    tags=("A1", "A2", "FN-datetime", "J5"),
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
),
spread AS (
  SELECT user_id, day + INTERVAL (o) DAY AS target_day
  FROM ud, (SELECT unnest(range(0, 7)) AS o)
),
wau AS (
  SELECT CAST(target_day AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM spread GROUP BY 1
)
SELECT dau.day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
""",
)
def q_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the growth
    metric every product team runs.  A trailing-window COUNT(DISTINCT)
    is NOT window-frame-expressible, so the scalable form is the
    explode-over-offsets trick: each (user, active-day) row is
    replicated to the 7 target days it keeps the user 'weekly-active'
    for, then a plain distinct count per target day.

    Scale rationale: the (user, day) dedup collapses events to at most
    |users|×|days| rows in one shuffle; the 7× row expansion happens
    AFTER that collapse (7·|user-days|, not 7·|events|); both counts
    are partial-aggregable.  The exact-distinct swaps for HLL sketches
    (q_hll_sketch's union machinery) when user-days outgrow a shuffle.
    Stickiness divides two exact BIGINTs once — engine-stable.  The
    inner join on DAU days trims the trailing window's synthetic
    future days (offset 0 guarantees every DAU day has a WAU row)."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("o")).alias("day"))
    wau = spread.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


@register(
    "q_mrl_truncation",
    tags=("X3", "FN-array", "W1"),
    oracle="""
WITH p AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cos_full,
         round(list_cosine_similarity(CAST(a.embedding[1:16] AS DOUBLE[]),
                                      CAST(b.embedding[1:16] AS DOUBLE[])), 6) AS cos_16
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT qid, cid, cos_full, cos_16,
         row_number() OVER (PARTITION BY qid ORDER BY cos_full DESC, cid) AS r_full,
         row_number() OVER (PARTITION BY qid ORDER BY cos_16 DESC, cid) AS r_16
  FROM p
),
fullnn AS (SELECT qid, cid AS nn_full, cos_full AS best_full FROM r WHERE r_full = 1),
shortnn AS (SELECT qid, cid AS nn_16 FROM r WHERE r_16 = 1),
retr AS (
  SELECT p.qid, p.cos_full AS full_of_16
  FROM p JOIN shortnn s ON p.qid = s.qid AND p.cid = s.nn_16
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN nn_full = nn_16 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(SUM(CASE WHEN nn_full = nn_16 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS recall_at_1,
       CAST(SUM(CAST(ROUND((best_full - full_of_16) * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_quality_drop_micro
FROM fullnn
JOIN shortnn USING (qid)
JOIN retr USING (qid)
""",
)
def q_mrl_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation: if embeddings were
    truncated from 64 to their FIRST 16 dimensions, how often does the
    1-NN retrieved under truncated cosine match the full-dim 1-NN
    (recall@1), and how much full-dim similarity does the truncated
    retrieval give up (exact micro-unit sum)?  This is the measurement
    behind every 'can we store fewer dims' decision.

    Determinism: cosines round to 6dp before ANY comparison (the
    q_cosine_topk discipline — absorbs engine last-bit drift), both
    argmaxes tie-break by candidate id, and the quality drop sums as
    micro-unit BIGINTs.

    Scale rationale: the all-pairs join is an EVAL over a bounded
    validation sample (500 vectors here; at scale you sample queries
    and use the IVF/LSH kernels for candidates), computed as one
    broadcast nested-loop over the broadcast-sized sample; the two
    rankings share one key-cardinality window partitioning."""
    from ..operators.guards import assert_allpairs_bounded
    from ..operators.similarity import as_double_array

    emb = assert_allpairs_bounded(
        _t(spark, sf_dir, "embeddings"),
        max_rows=5000,
        what="q_mrl_truncation",
        scale_path="sample the query side + operators.similarity.knn_join "
        "or ivf_topk_pairs for candidates",
    )

    # Interpreted-HOF cost discipline: norms depend on ONE vector, so
    # they are computed n times BEFORE the pair join, never n² times
    # inside it; and the full-dim dot is split prefix+rest so the
    # 16-dim prefix dot serves both cosines.  Per-pair lambda steps
    # drop ~4x (HOF lambdas are interpreted, not codegen'd — they ARE
    # the cost here): 72 s -> 26 s warm at sf0.1.  The split
    # changes float summation order, which the 6dp round absorbs by
    # design (it already absorbs the cross-engine order difference).
    def norm(arr):
        return F.sqrt(
            F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v)
        )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    va = as_double_array("embedding")
    a = emb.select(
        F.col("vec_id").alias("qid"),
        F.slice(va, 1, 16).alias("va16"),
        F.slice(va, 17, 1_000_000).alias("va_rest"),
        norm(va).alias("na_full"),
        norm(F.slice(va, 1, 16)).alias("na_16"),
    )
    b = (
        a.toDF("cid", "vb16", "vb_rest", "nb_full", "nb_16")
    )
    p = (
        a.join(F.broadcast(b), F.col("qid") != F.col("cid"))  # bounded: eval sample is dimension-sized
        .select(
            "qid",
            "cid",
            dot(F.col("va16"), F.col("vb16")).alias("d16"),
            dot(F.col("va_rest"), F.col("vb_rest")).alias("d_rest"),
            "na_full", "na_16", "nb_full", "nb_16",
        )
        .select(
            "qid",
            "cid",
            F.round(
                (F.col("d16") + F.col("d_rest"))
                / (F.col("na_full") * F.col("nb_full")),
                6,
            ).alias("cos_full"),
            F.round(
                F.col("d16") / (F.col("na_16") * F.col("nb_16")), 6
            ).alias("cos_16"),
        )
    )
    from pyspark.sql import Window as W

    w_full = W.partitionBy("qid").orderBy(F.desc("cos_full"), "cid")
    w_16 = W.partitionBy("qid").orderBy(F.desc("cos_16"), "cid")
    r = p.withColumn("r_full", F.row_number().over(w_full)).withColumn(
        "r_16", F.row_number().over(w_16)
    )
    # ONE pass over the ranked pairs: the r_full == 1 and r_16 == 1
    # rows both carry everything needed (cos_full of the truncated
    # pick included), so both argmax picks fold into one conditional
    # aggregate.  The old three-branch formulation (two filters + a
    # re-join against the n² pair relation) evaluated the interpreted
    # HOF-cosine pass up to three times: 77 s -> 26 s at sf0.1.
    sel = r.filter((F.col("r_full") == 1) | (F.col("r_16") == 1))
    joined = sel.groupBy("qid").agg(
        F.max(F.when(F.col("r_full") == 1, F.col("cid"))).alias("nn_full"),
        F.max(F.when(F.col("r_full") == 1, F.col("cos_full"))).alias(
            "best_full"
        ),
        F.max(F.when(F.col("r_16") == 1, F.col("cid"))).alias("nn_16"),
        F.max(F.when(F.col("r_16") == 1, F.col("cos_full"))).alias(
            "full_of_16"
        ),
    )
    agree = F.when(F.col("nn_full") == F.col("nn_16"), 1).otherwise(0)
    return joined.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(agree).alias("n_agree"),
        (F.sum(agree).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "recall_at_1"
        ),
        F.sum(
            F.round((F.col("best_full") - F.col("full_of_16")) * 1_000_000).cast("long")
        ).alias("sum_quality_drop_micro"),
    )


@register(
    "q_burstiness",
    tags=("W2", "A1", "FN-datetime"),
    oracle="""
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
m AS (
  SELECT user_id,
         CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_s) AS BIGINT) AS sum_s,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS sum_s2
  FROM gaps WHERE gap_s IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps, sum_s, sum_s2,
       CAST(n_gaps * sum_s2 - sum_s * sum_s AS DOUBLE)
         / CAST(sum_s * sum_s AS DOUBLE) AS cv2
FROM m WHERE n_gaps >= 2 AND sum_s > 0
""",
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per user: CV² of inter-arrival gaps (CV²≈1
    → Poisson-like arrivals, ≫1 → bursty, ≪1 → regular) — the
    arrival-process statistic behind rate-limiting, bot detection,
    and session-gap tuning.

    Determinism: gaps floor-divide to whole seconds from µs epochs
    (identical integer math both engines), the three moments
    (n, Σg, Σg²) are exact BIGINTs, and CV² = (nΣg² − (Σg)²)/(Σg)²
    is ONE double division of exact integers.  Envelope: gap ≤ 2.6e6 s
    (the fixture month), gap² ≤ 6.8e12, × ~10³ gaps/user → Σg² ≲ 1e16,
    4 orders inside int64 even at 100× the per-user density.

    Scale rationale: one shuffle on user_id serves both the lag
    window and the grouped moments (Catalyst shares the partitioning);
    per-key series are user-sized.  W2's lag is the only ordered
    dependency — no global sort anywhere."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: (F.unix_micros(F.col(c)))
    gap_us = us("ts") - F.lag(us("ts")).over(w)
    gaps = ev.select(
        "user_id",
        # integer floor division, matching the oracle's `//` exactly
        # (a double divide-then-cast would truncate, not floor, and
        # ride on float quotient rounding)
        F.try_divide(gap_us - gap_us % F.lit(1_000_000), F.lit(1_000_000))
        .cast("long")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    m = gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.sum("gap_s").alias("sum_s"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_s2"),
    )
    return (
        m.filter((F.col("n_gaps") >= 2) & (F.col("sum_s") > 0))
        .select(
            "user_id",
            "n_gaps",
            "sum_s",
            "sum_s2",
            (
                (
                    F.col("n_gaps") * F.col("sum_s2")
                    - F.col("sum_s") * F.col("sum_s")
                ).cast("double")
                / (F.col("sum_s") * F.col("sum_s")).cast("double")
            ).alias("cv2"),
        )
    )


@register(
    "q_peak_detection",
    tags=("W2", "A1", "O2"),
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
nb AS (
  SELECT h, n,
         lag(n)  OVER (ORDER BY h) AS prev_n,
         lead(n) OVER (ORDER BY h) AS next_n
  FROM hourly
)
SELECT h, n, prev_n, next_n
FROM nb
WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
  AND n > prev_n AND n > next_n
ORDER BY n DESC, h LIMIT 20
""",
)
def q_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum peak detection over the hourly event-rate series
    (strict peaks: louder than BOTH neighbors; endpoints excluded),
    top-20 by height — the signal-processing primitive under alerting
    and anomaly triage.

    Determinism: hourly counts are exact BIGINTs, the neighborhood
    predicate is integer comparison, and the top-20 orders by
    (n DESC, h) — a total order.

    Scale rationale: the raw stream collapses to |hours| rows in one
    partial-agg'd shuffle BEFORE any window; the lag/lead window runs
    over that BOUNDED series (8,760 rows/year — metadata-scale, the
    legitimate single-partition case the plan pins distinguish from
    data-cardinality windows); top-20 is TakeOrderedAndProject."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("h")
    nb = hourly.select(
        "h",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
    )
    return (
        nb.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
        )
        .orderBy(F.desc("n"), "h")
        .limit(20)
    )
