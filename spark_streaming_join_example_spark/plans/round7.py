"""Round-7 additions: the two corpus-quality signals every
pretraining-data pipeline computes that the registry did not yet have
as first-class queries —

- cross-document duplicated n-gram fraction (the RefinedWeb/Gopher
  "fraction of the document that is boilerplate shared with the rest
  of the corpus" signal; within-doc repetition already exists as
  q_ngram_repetition), and
- a Gopher-style per-document quality-rule battery (word-count and
  mean-word-length bounds, stopword containment, type-token ratio,
  single-word domination), adapted to the fixture corpus (synthetic
  space-separated words: no punctuation or line structure, so the
  line-shape rules don't apply).

Both are pure JVM-side DataFrame compositions with exact DuckDB
oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_cross_doc_ngram_dup",
    tags=("X1", "X2", "X5", "A1", "J4"),
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS s
  FROM w, UNNEST(range(1, len(ws) - 3)) AS t(i)
  WHERE len(ws) >= 5
),
cnt AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup,
       ROUND(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS dup_frac
FROM sh JOIN cnt USING (s)
GROUP BY sh.doc_id
ORDER BY sh.doc_id
""",
)
def q_cross_doc_ngram_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: the fraction of its distinct 5-gram word shingles
    that also occur in at least one OTHER place in the corpus — the
    cross-document boilerplate signal used to down-weight or drop
    template-heavy pages when assembling a pretraining mix (within-doc
    repetition is q_ngram_repetition; this is the corpus-wide
    complement).

    Plan: one explode to distinct (doc, shingle) pairs, then an
    unordered COUNT window partitioned by shingle tags every pair with
    its corpus frequency IN PLACE — one keyed shuffle, no self-join,
    no second scan of the explode (the groupBy-count + join-back
    formulation reads the exploded relation twice and shuffles once
    more) — then one per-doc aggregate.  Nothing quadratic; the
    dominant cost is the shingle shuffle, linear in corpus tokens.

    100 TB: identical shape with two standard reductions — key the
    count/join on ``xxhash64(shingle)`` instead of the string (8-byte
    shuffle keys; the 64-bit collision risk only starts to bite past
    ~10⁹ distinct shingles, where a 128-bit hash pair takes over), and
    pre-aggregate the shingle counts per partition (already automatic:
    partial HashAggregate).  The (doc, shingle) distinct is the same
    dedup-before-count discipline q_exact_dedup_docs uses.
    """
    # r15 (guide §2.5): the 584 KB documents scan is one task, and the
    # shingle explode fuses onto it — 2 s of single-core string work
    # before the first exchange (stage_profile.py).  scan_fanout
    # parallelizes the explode map side; no-op at production sizes.
    from ..sources.batch import scan_fanout

    docs = scan_fanout(_t(spark, sf_dir, "documents"), sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    shingles = F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(1), n - 4),
            lambda i: F.concat_ws(" ", F.slice(words, i, 5)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # r15 (guide §2.4): the (doc, shingle) dedup and the corpus-count
    # window are BOTH clustered by the shingle — an explicit
    # repartition("s") establishes that partitioning once, the dedup
    # aggregate accepts it (hash(s) co-locates every (doc_id, s)
    # duplicate), and the window then needs no second exchange.  The
    # pre-r15 form paid two full shuffles of the exploded relation:
    # Exchange(doc_id, s) for the distinct, then Exchange(s) for the
    # window.  Plan now shows exactly one Exchange before the per-doc
    # aggregate (plans/r15/q_cross_doc_ngram_dup_after.txt); skew on a
    # hot shingle is the same either way — the window always keyed on
    # s alone.
    # r15 (second pass): an explicit exchange WIDTH was probed here
    # while evaluating the (rejected) 128k AQE coalescing floor —
    # under that floor W8 1.038 s < W16 1.252 < W32 ≈ AQE 1.52-1.57 —
    # but with the stock 1 MB floor kept (see session.py), AQE already
    # coalesces this exchange to ~bytes/1MB ≈ 6 partitions, which the
    # probe showed is the right width band; the pin would change
    # nothing and is not adopted.
    sh = (
        docs.select("doc_id", F.explode(shingles).alias("s"))
        .repartition("s")
        .distinct()
    )
    tagged = sh.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("s"))
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 6).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "q_gopher_rules",
    tags=("X5", "A1", "P5", "FN-string"),
    oracle="""
WITH t AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_word_n,
         CAST(SUM(c * length(w)) AS BIGINT) AS n_letters,
         CAST(SUM(CASE WHEN w IN ('the', 'a', 'of', 'to', 'and')
                       THEN c ELSE 0 END) AS BIGINT) AS stop_hits
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_words, n_distinct, top_word_n, stop_hits,
       ROUND(n_letters * 1.0 / n_words, 6) AS mean_word_len,
       ROUND(n_distinct * 1.0 / n_words, 6) AS ttr,
       ROUND(top_word_n * 1.0 / n_words, 6) AS top_word_share,
       (n_words BETWEEN 10 AND 1000)
         AND (n_letters * 1.0 / n_words BETWEEN 2.0 AND 10.0)
         AND stop_hits >= 1
         AND top_word_n * 1.0 / n_words <= 0.2 AS keep
FROM agg
ORDER BY doc_id
""",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality-rule battery: word-count
    bounds, mean-word-length bounds, stopword containment,
    single-word domination — the and-of-rules ``keep`` flag a
    pretraining filter applies before dedup.  (Type-token ratio is
    reported alongside; the original line-shape rules — bullet/ellipsis
    line fractions — don't exist in a corpus with no line structure,
    so they are deliberately absent rather than vacuously true.)

    Plan: explode → (doc, word) counts → per-doc aggregate, all
    partial-aggregable; the per-word level is required anyway for
    top_word_n (max term frequency), and every rule folds into the
    same two HashAggregates — no second scan, no window.  Scales as
    one token-linear shuffle.
    """
    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stop = F.col("w").isin("the", "a", "of", "to", "and")
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_word_n"),
        F.sum(F.col("c") * F.length("w")).cast("long").alias("n_letters"),
        F.sum(F.when(stop, F.col("c")).otherwise(0))
        .cast("long")
        .alias("stop_hits"),
    )
    mean_len = F.col("n_letters") / F.col("n_words")
    top_share = F.col("top_word_n") / F.col("n_words")
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct",
        "top_word_n",
        "stop_hits",
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(F.col("n_distinct") / F.col("n_words"), 6).alias("ttr"),
        F.round(top_share, 6).alias("top_word_share"),
        (
            F.col("n_words").between(10, 1000)
            & mean_len.between(2.0, 10.0)
            & (F.col("stop_hits") >= 1)
            & (top_share <= 0.2)
        ).alias("keep"),
    ).orderBy("doc_id")


@register(
    "q_skew_report",
    tags=("A1", "T5", "U1"),
    oracle="""
WITH k1 AS (
  SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
),
k2 AS (
  SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY user_id
),
s1 AS (
  SELECT 'lineitem.l_orderkey' AS relation,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(SUM(CASE WHEN c > 100 THEN 1 ELSE 0 END) AS BIGINT)
           AS keys_over_100
  FROM k1
),
s2 AS (
  SELECT 'events.user_id' AS relation,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(SUM(CASE WHEN c > 100 THEN 1 ELSE 0 END) AS BIGINT)
           AS keys_over_100
  FROM k2
),
u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
SELECT relation, n_rows, n_keys, max_key_rows, keys_over_100,
       CAST(n_rows * 1000000 // n_keys AS BIGINT) AS mean_rows_ppm,
       CAST(max_key_rows * 1000000 // n_rows AS BIGINT)
         AS top_key_share_ppm,
       CAST(max_key_rows * n_keys * 1000000 // n_rows AS BIGINT)
         AS skew_factor_ppm
FROM u ORDER BY relation
""",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile — the diagnostic you run BEFORE deciding
    whether a shuffle join needs salting or AQE skew handling: per key
    relation, row/key counts, the hottest key's absolute size and
    share, heavy-key count, and the skew factor (hottest key vs the
    mean key, in ppm; 1,000,000 = perfectly uniform).

    Plan: one partial-aggregable per-key count per relation, one
    5-field summary aggregate each, a 2-row union — two scans, two
    shuffles, constant output.  At 100 TB this is the cheap pre-flight
    whose answer picks between a plain shuffle join (skew_factor near
    1 M), AQE skew-split (isolated hot keys), and explicit salting
    (q_salted_join) for pathological keys.  All integer arithmetic
    (ppm with floor division) — engine-exact.
    """

    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        return counts.agg(
            F.lit(label).alias("relation"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_rows"),
            F.sum(F.when(F.col("c") > 100, 1).otherwise(0))
            .cast("long")
            .alias("keys_over_100"),
        )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    ev = _t(spark, sf_dir, "events").select("user_id")
    u = profile(li, "l_orderkey", "lineitem.l_orderkey").unionByName(
        profile(ev, "user_id", "events.user_id")
    )
    return u.select(
        "relation",
        "n_rows",
        "n_keys",
        "max_key_rows",
        "keys_over_100",
        F.expr("CAST(n_rows * 1000000 div n_keys AS BIGINT)").alias(
            "mean_rows_ppm"
        ),
        F.expr("CAST(max_key_rows * 1000000 div n_rows AS BIGINT)").alias(
            "top_key_share_ppm"
        ),
        F.expr(
            "CAST(max_key_rows * n_keys * 1000000 div n_rows AS BIGINT)"
        ).alias("skew_factor_ppm"),
    ).orderBy("relation")


@register(
    "q_curriculum_order",
    tags=("X5", "W1", "O1"),
    oracle="""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) * 1000000
           + CAST(doc_id % 1000 AS BIGINT) AS score
  FROM documents
)
SELECT doc_id, score,
       CAST(NTILE(10) OVER (ORDER BY score, doc_id) AS BIGINT)
         AS curriculum_bucket
FROM s ORDER BY doc_id
""",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: order the corpus by a quality score and
    cut it into 10 global buckets — the shape behind
    shortest/cleanest-first curricula and quality-tiered sampling
    temperatures.  The score here is an integer proxy (word count in
    micro-units + an id jitter term making the order total before the
    tie-break), standing in for any scalar quality model output.

    Runs on the DISTRIBUTED two-phase ranking kernel
    (operators/ranking.global_ntile: range partition + local rank +
    broadcast offsets), not a single-partition window — the 100 TB
    path, oracle-proven lossless against DuckDB's NTILE here by hash
    equality.
    """
    from ..operators.ranking import global_ntile

    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        (
            F.size(F.split("text", " ")).cast("long") * 1_000_000
            + F.pmod(F.col("doc_id"), F.lit(1000))
        ).alias("score"),
    )
    return (
        global_ntile(s, 10, ["score", "doc_id"], out="curriculum_bucket")
        .select(
            "doc_id", "score", F.col("curriculum_bucket").cast("long")
            .alias("curriculum_bucket"),
        )
        .orderBy("doc_id")
    )
