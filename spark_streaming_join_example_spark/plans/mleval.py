"""Model-evaluation / drift-monitoring surface over the embeddings
table: confusion matrix, exact AUC by rank-sum (Mann-Whitney U with
tie-safe average ranks), calibration bins, and PSI population drift.
These are the queries a training pipeline runs AFTER the dedup /
similarity / split operators in extensions.py — closing the loop from
data prep to model scoring.

The "score" is the first embedding coordinate (deterministic data, no
model in the loop); the binary target is label parity.  Float scores
are only compared/ordered (bit-identical across engines since both
read the same parquet floats and widen to double exactly) — every
aggregate that crosses the hash gate is integer (micro-unit sums,
ppm floor-divisions, 2×-scaled rank sums).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.ranking import global_cumsum, global_ntile, global_row_number
from ..sources.batch import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: Shared scored-example CTE: score = first embedding coordinate
#: widened to double (exact), y = label parity.
_SCORED_SQL = """
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score,
         CAST(label % 2 AS BIGINT) AS y
  FROM embeddings
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") % 2).cast("long").alias("y"),
    )


# ---------------------------------------------------------------------------
# Confusion matrix + precision/recall/F1 at a fixed threshold.
# ---------------------------------------------------------------------------


@register(
    "q_confusion_matrix",
    tags=("A1", "P5", "X3"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
p AS (
  SELECT y, CASE WHEN score >= 0.0 THEN 1 ELSE 0 END AS pred FROM s
),
c AS (
  SELECT CAST(SUM(CASE WHEN y=1 AND pred=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN y=0 AND pred=1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN y=1 AND pred=0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN y=0 AND pred=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM p
)
SELECT tp, fp, fn, tn,
       CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // (tp + fn) AS BIGINT) AS recall_ppm,
       CAST(2 * tp * 1000000 // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm
FROM c
""",
)
def q_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary confusion matrix at threshold 0 with precision, recall,
    and F1 in integer ppm — the model-eval primitive every scoring
    pipeline ends with.

    Scale rationale: the entire evaluation is ONE partial-aggregated
    scan (four conditional counts), map-side combined to 4 longs per
    partition; the ratios are BIGINT floor-ppm over the single result
    row.  The float score is only ever compared to the threshold —
    never summed — so the confusion cells are engine- and
    partitioning-exact at any scale.
    """
    s = _scored(spark, sf_dir)
    p = s.select(
        "y", F.when(F.col("score") >= 0.0, F.lit(1)).otherwise(F.lit(0)).alias("pred")
    )
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    c = p.agg(
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), one).otherwise(z)).alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), one).otherwise(z)).alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 0), one).otherwise(z)).alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 0), one).otherwise(z)).alias("tn"),
    )
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(tp * 1000000 div (tp + fp) AS BIGINT)").alias("precision_ppm"),
        F.expr("CAST(tp * 1000000 div (tp + fn) AS BIGINT)").alias("recall_ppm"),
        F.expr("CAST(2 * tp * 1000000 div (2 * tp + fp + fn) AS BIGINT)").alias("f1_ppm"),
    )


# ---------------------------------------------------------------------------
# Exact AUC via the Mann-Whitney rank-sum (tie-safe average ranks).
# ---------------------------------------------------------------------------


@register(
    "q_auc_ranksum",
    tags=("W1", "A1", "X3"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
r AS (
  SELECT y,
         rank() OVER (ORDER BY score) AS rank_lo,
         COUNT(*) OVER (PARTITION BY score) AS cnt_eq
  FROM s
),
mom AS (
  SELECT CAST(SUM(CASE WHEN y = 1 THEN 2 * rank_lo + cnt_eq - 1
                       ELSE 0 END) AS BIGINT) AS r1_x2,
         CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(1 - y) AS BIGINT) AS n0
  FROM r
)
SELECT n0, n1,
       CAST((r1_x2 - n1 * (n1 + 1)) * 1000000 // (2 * n0 * n1) AS BIGINT)
         AS auc_ppm
FROM mom
""",
)
def q_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC by the Mann-Whitney rank-sum identity:
    AUC = (R₁ − n₁(n₁+1)/2) / (n₀n₁), with R₁ the sum of the
    positives' ranks under the score ordering.  Ranks are kept 2×-
    scaled integers (2·rank_lo + cnt_eq − 1 = twice the tie-averaged
    rank), so AUC lands as one BIGINT floor-ppm division — no float
    ever crosses the compare gate, and tied scores are handled by the
    textbook average-rank correction rather than an arbitrary order.

    Scale rationale: the global ordering runs through
    operators/ranking.global_row_number — range-partition on (score,
    vec_id), rank locally, add broadcast per-partition offsets — so no
    single-partition sort exists anywhere in the plan (proven
    bit-equivalent to the one-sort window by the kernel's property
    test and this query's unchanged oracle).  rank() with ties then
    derives as min(rn) over the score-partitioned (parallel, keyed)
    window, cnt_eq as its count; the rest is one integer aggregate.
    Heavily-tied score distributions skew the per-score partitions —
    the usual salting answer applies, but model scores are near-unique
    by construction.
    """
    s = _scored(spark, sf_dir)
    ranked = global_row_number(s, ["score", "vec_id"], out="_rn")
    wscore = Window.partitionBy("score")
    r = ranked.select(
        "y",
        F.min("_rn").over(wscore).alias("rank_lo"),
        F.count(F.lit(1)).over(wscore).alias("cnt_eq"),
    )
    z = F.lit(0).cast("long")
    mom = r.agg(
        F.sum(
            F.when(
                F.col("y") == 1,
                2 * F.col("rank_lo") + F.col("cnt_eq") - 1,
            ).otherwise(z)
        ).alias("r1_x2"),
        F.sum("y").alias("n1"),
        F.sum(1 - F.col("y")).alias("n0"),
    )
    return mom.select(
        "n0",
        "n1",
        F.expr(
            "CAST((r1_x2 - n1 * (n1 + 1)) * 1000000 div (2 * n0 * n1) AS BIGINT)"
        ).alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# Calibration curve: decile bins of score vs observed positive rate.
# ---------------------------------------------------------------------------


@register(
    "q_calibration_bins",
    tags=("W1", "A1"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
b AS (
  SELECT y,
         CAST(ROUND(score * 1000000.0) AS BIGINT) AS score_e6,
         ntile(10) OVER (ORDER BY score, vec_id) AS bin
  FROM s
)
SELECT CAST(bin AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(score_e6) // COUNT(*) AS BIGINT) AS mean_score_e6,
       CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm
FROM b GROUP BY bin
""",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve: split examples into score deciles (ntile
    with a vec_id tie-break, so bin boundaries are engine-identical)
    and compare each bin's mean score against its observed positive
    rate — the reliability-diagram primitive behind every "is the
    model calibrated?" check.

    Scale rationale: scores are micro-unit integers before any sum, so
    bin means are exact floor-divisions.  The decile assignment runs
    through operators/ranking.global_ntile (two-phase range-partitioned
    ranking + broadcast total — NTILE is a closed form of (rn, n)), so
    the plan has no single-partition sort; at extreme scale the same
    binning can also run off approx_percentile cut points with this
    exact aggregation tail.
    """
    s = _scored(spark, sf_dir)
    b = global_ntile(
        s.select(
            "y",
            F.round(F.col("score") * F.lit(1_000_000.0))
            .cast("long")
            .alias("score_e6"),
            "score",
            "vec_id",
        ),
        10,
        ["score", "vec_id"],
        out="bin",
    )
    return b.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(score_e6) div COUNT(*) AS BIGINT)").alias("mean_score_e6"),
        F.expr("CAST(SUM(y) * 1000000 div COUNT(*) AS BIGINT)").alias("pos_rate_ppm"),
    )


# ---------------------------------------------------------------------------
# PSI (population stability index) between two cohorts.
# ---------------------------------------------------------------------------


@register(
    "q_psi_drift",
    tags=("A1", "FN-math"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
b AS (
  SELECT CAST(floor(score * 10.0) AS BIGINT) AS bucket,
         CAST(vec_id % 2 AS BIGINT) AS cohort
  FROM s
),
c AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM b GROUP BY bucket
),
t AS (
  SELECT bucket, a, b,
         CAST(SUM(a) OVER () AS BIGINT) AS ta,
         CAST(SUM(b) OVER () AS BIGINT) AS tb
  FROM c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       round(SUM((CAST(a AS DOUBLE)/ta - CAST(b AS DOUBLE)/tb)
                 * ln((CAST(a AS DOUBLE)/ta) / (CAST(b AS DOUBLE)/tb))), 6)
         AS psi
FROM t WHERE a > 0 AND b > 0
""",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two example cohorts (id
    parity stands in for reference-vs-production): bucket the score at
    0.1 granularity, and sum (pₐ−p_b)·ln(pₐ/p_b) over buckets both
    cohorts populate — the drift alarm (PSI > 0.2 = retrain) every
    model monitor computes.

    Scale rationale: bucket counts are one conditional partial
    aggregate over the scored examples; the PSI sum runs over the
    BUCKET table (≤ dozens of rows, window-over-aggregate).  The only
    float math is the final ln/ratio chain over exact integer counts,
    written term-for-term identically in both engines and rounded to
    6 decimals; floor(score·10) is a single deterministic double op,
    identical IEEE semantics in both engines.
    """
    s = _scored(spark, sf_dir)
    b = s.select(
        F.floor(F.col("score") * F.lit(10.0)).cast("long").alias("bucket"),
        (F.col("vec_id") % 2).cast("long").alias("cohort"),
    )
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    c = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("cohort") == 0, one).otherwise(z)).alias("a"),
        F.sum(F.when(F.col("cohort") == 1, one).otherwise(z)).alias("b"),
    )
    t = c.select(
        "bucket",
        "a",
        "b",
        F.sum("a").over(Window.partitionBy()).alias("ta"),
        F.sum("b").over(Window.partitionBy()).alias("tb"),
    )
    pa = F.col("a").cast("double") / F.col("ta")
    pb = F.col("b").cast("double") / F.col("tb")
    return (
        t.filter((F.col("a") > 0) & (F.col("b") > 0))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram LM perplexity scoring (train on corpus, score each document).
# ---------------------------------------------------------------------------


@register(
    "q_bigram_lm_score",
    tags=("X5", "A1", "W2", "J4"),
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT)
           AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
t AS (SELECT doc_id, pos, tok FROM tok WHERE tok <> ''),
bg AS (
  SELECT doc_id, lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         tok AS cur
  FROM t
),
b AS (SELECT doc_id, prev, cur FROM bg WHERE prev IS NOT NULL),
c2 AS (
  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n2 FROM b GROUP BY prev, cur
),
c1 AS (
  SELECT prev, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY prev
),
scored AS (
  SELECT b.doc_id,
         CAST(ROUND(ln(CAST(c1.n1 AS DOUBLE) / c2.n2) * 1000000.0)
              AS BIGINT) AS nll_e6
  FROM b JOIN c2 ON b.prev = c2.prev AND b.cur = c2.cur
         JOIN c1 ON b.prev = c1.prev
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_e6) // COUNT(*) AS BIGINT) AS avg_nll_e6
FROM scored GROUP BY doc_id
""",
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring: estimate MLE bigram probabilities
    from the corpus itself, then score every document by its average
    negative log-likelihood ln(c₁(prev)/c₂(prev,cur)) in micro-nats —
    the perplexity-based quality filter (cf. CCNet) that flags
    machine-generated / boilerplate shards before training.

    Determinism: each bigram's −ln P is rounded to an INTEGER
    micro-nat term BEFORE the per-document sum, so the aggregate is an
    associative BIGINT sum — bit-identical at any partition count and
    in both engines (a raw double SUM would be accumulation-order-
    dependent).

    Scale rationale: counting is two partial-aggregable groupBys
    (bigram, then prefix — the prefix counts derive from the bigram
    table, touching vocab² not corpus); scoring joins the corpus
    bigram stream to the two count tables on token keys — broadcast
    when the vocabulary is bounded (here), co-partitioned shuffle
    joins at open-vocabulary web scale.  Per-doc sequence order comes
    from posexplode ordinals, zero extra sort beyond the per-doc lag
    window.
    """
    d = _t(spark, sf_dir, "documents")
    t = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    b = (
        t.select("doc_id", F.lag("tok").over(wdoc).alias("prev"), F.col("tok").alias("cur"))
        .filter(F.col("prev").isNotNull())
    )
    c2 = b.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    scored = (
        b.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .select(
            "doc_id",
            F.round(
                F.log(F.col("n1").cast("double") / F.col("n2"))
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("nll_e6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("CAST(SUM(nll_e6) div COUNT(*) AS BIGINT)").alias("avg_nll_e6"),
    )


# ---------------------------------------------------------------------------
# Symmetric int8 embedding quantization (per-vector scale).
# ---------------------------------------------------------------------------


@register(
    "q_quantize_embeddings",
    tags=("X3", "FN-array", "X4"),
    oracle="""
WITH m AS (
  SELECT vec_id, embedding,
         GREATEST(list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS amax
  FROM embeddings
),
q AS (
  SELECT vec_id,
         CAST(ROUND(amax * 1000000000.0) AS BIGINT) AS scale_e9,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0 / amax) AS BIGINT))
           AS qv
  FROM m
)
SELECT vec_id, scale_e9,
       CAST(len(qv) AS INT) AS dim,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_max(qv) AS BIGINT) AS q_max,
       CAST(list_min(qv) AS BIGINT) AS q_min
FROM q
""",
)
def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    absolute-max scale, elements mapped to round(x·127/amax) — the 4×
    storage/bandwidth shrink every billion-vector ANN index applies
    before sharding (int8 dot products then run 4-wide in SIMD).
    Emits the scale and integer summary stats of each quantized vector
    so the whole codebook crosses the exact-hash gate.

    Scale rationale: pure per-row array math (transform/aggregate
    higher-order functions, JVM codegen, zero shuffle) — the
    embarrassingly-parallel map stage that precedes the IVF/LSH
    kernels in operators/similarity.py.  Determinism: float→double
    widening is exact, each element's round happens BEFORE any
    aggregation, and the per-vector sums are integer — so the output
    is bit-stable at any partition count and across engines on the
    same parquet floats.
    """
    e = _t(spark, sf_dir, "embeddings")
    m = e.select(
        "vec_id",
        "embedding",
        F.greatest(
            F.array_max(
                F.transform("embedding", lambda x: F.abs(x.cast("double")))
            ),
            F.lit(1e-12),
        ).alias("amax"),
    )
    q = m.select(
        "vec_id",
        F.round(F.col("amax") * F.lit(1_000_000_000.0)).cast("long").alias("scale_e9"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.lit(127.0) / F.col("amax")).cast(
                "long"
            ),
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        "scale_e9",
        F.size("qv").cast("int").alias("dim"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_max("qv").alias("q_max"),
        F.array_min("qv").alias("q_min"),
    )


# ---------------------------------------------------------------------------
# Histogram AUC — the single-pass approximation of q_auc_ranksum.
# ---------------------------------------------------------------------------


@register(
    "q_auc_histogram",
    tags=("A1", "W3", "X3"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
b AS (
  SELECT CAST(floor(score * 256.0) AS BIGINT) AS bucket,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(1 - y) AS BIGINT) AS neg
  FROM s GROUP BY bucket
),
c AS (
  SELECT bucket, pos, neg,
         COALESCE(SUM(pos) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_pos_before
  FROM b
),
mom AS (
  SELECT CAST(SUM(neg * (2 * cum_pos_before + pos)) AS BIGINT) AS num_x2,
         CAST(SUM(pos) AS BIGINT) AS n1,
         CAST(SUM(neg) AS BIGINT) AS n0
  FROM c
)
SELECT n0, n1,
       CAST(num_x2 * 1000000 // (2 * n0 * n1) AS BIGINT) AS auc_hist_ppm
FROM mom
""",
)
def q_auc_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram AUC — the 100 TB path q_auc_ranksum's docstring
    promises: bucket scores into fixed 1/256-wide bins (one
    partial-aggregable groupBy, NO global sort), then compute the
    trapezoidal P(score⁺ > score⁻) over the bucket table — within-
    bucket pairs count half, exactly the tie-averaged rank convention,
    so the estimate differs from exact AUC only by within-bucket score
    ordering (bound asserted against q_auc_ranksum in
    tests/test_batch_queries.py).

    Everything is integer: bucket ids (IEEE floor of one double
    multiply), counts, and the 2×-scaled trapezoid sum; the cumulative
    window runs over the BUCKET table (≤ few hundred rows).  At 100 TB
    this is one scan + one tiny window — the AUC you can afford on
    every training shard; the rank-sum version stays for the final
    report.
    """
    s = _scored(spark, sf_dir)
    b = s.groupBy(
        F.floor(F.col("score") * F.lit(256.0)).cast("long").alias("bucket")
    ).agg(
        F.sum("y").alias("pos"),
        F.sum(1 - F.col("y")).alias("neg"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    c = b.select(
        "bucket",
        "pos",
        "neg",
        F.coalesce(F.sum("pos").over(w), F.lit(0).cast("long")).alias(
            "cum_pos_before"
        ),
    )
    mom = c.agg(
        F.sum(
            F.col("neg") * (2 * F.col("cum_pos_before") + F.col("pos"))
        ).alias("num_x2"),
        F.sum("pos").alias("n1"),
        F.sum("neg").alias("n0"),
    )
    return mom.select(
        "n0",
        "n1",
        F.expr("CAST(num_x2 * 1000000 div (2 * n0 * n1) AS BIGINT)").alias(
            "auc_hist_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic k-means clustering summary (rows-only).
# ---------------------------------------------------------------------------


@register("q_kmeans_clusters", tags=("X3", "A1"))
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point Lloyd's k-means (k=8, 3 iterations) over the
    embeddings, summarized as per-cluster sizes and integer inertia —
    the coarse-quantizer / segmentation primitive (the IVF index in
    operators/similarity.py trains the same way, sample-based).

    Rows-only lane: an iterative float-free clustering has no single-
    statement SQL twin; determinism and semantics are pinned by
    tests/test_operators.py instead — identical output under
    repartitioning (the property float k-means cannot give) and
    non-increasing inertia across iterations.

    Scale rationale: documented on operators/clustering.py — per
    iteration one broadcast-literal assignment pass (k·d ints in the
    expression) and one partial-aggregable (cluster, dim) sum shuffle;
    driver traffic is the k×d centroid table only.
    """
    from ..operators.clustering import kmeans_fixed_point

    e = _t(spark, sf_dir, "embeddings")
    a = kmeans_fixed_point(e, k=8, iters=3)
    return (
        a.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("dist2").alias("inertia_e12"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Precision-recall curve at decile thresholds (+ integer PR-AUC).
# ---------------------------------------------------------------------------


@register(
    "q_pr_curve",
    tags=("W1", "A1", "X3"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
r AS (
  SELECT y, score,
         row_number() OVER (ORDER BY score DESC, vec_id) AS rnk,
         CAST(SUM(y) OVER (ORDER BY score DESC, vec_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS tp,
         CAST(SUM(y) OVER () AS BIGINT) AS n_pos
  FROM s
),
pts AS (
  SELECT rnk, tp, n_pos FROM r WHERE rnk % 50 = 0
)
SELECT CAST(rnk AS BIGINT) AS k,
       tp,
       CAST(tp * 1000000 // rnk AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // n_pos AS BIGINT) AS recall_ppm
FROM pts
""",
)
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve sampled every 50 ranks of the
    score-descending ordering (ties broken by id): precision@k and
    recall@k in integer ppm from one cumulative-positive window — the
    threshold-picking table behind every alerting/classification
    rollout.

    Scale rationale: the rank and the running-positive count both run
    through operators/ranking.global_cumsum — ONE range shuffle on
    (score desc, vec_id), local running sums, broadcast per-partition
    offsets — so the plan has no single-partition window (integer
    running sums make the split exact); the positive total is a 1-row
    broadcast aggregate, and the tail is a rank-modulo filter with
    BIGINT floor-ppm ratios, engine-exact point for point.
    """
    s = _scored(spark, sf_dir)
    r = global_cumsum(
        s,
        [F.col("score").desc(), "vec_id"],
        sums={"tp": "y"},
        rn_out="rnk",
    ).join(
        F.broadcast(s.agg(F.sum("y").cast("long").alias("n_pos"))),
        how="cross",  # bounded: 1-row aggregate
    )
    return (
        r.filter(F.col("rnk") % 50 == 0)
        .select(
            F.col("rnk").cast("long").alias("k"),
            "tp",
            F.expr("CAST(tp * 1000000 div rnk AS BIGINT)").alias(
                "precision_ppm"
            ),
            F.expr("CAST(tp * 1000000 div n_pos AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov statistic between two cohorts (exact, integer).
# ---------------------------------------------------------------------------


@register(
    "q_ks_statistic",
    tags=("W1", "A1", "FN-math"),
    oracle=f"""
WITH s AS ({_SCORED_SQL}),
m AS (
  SELECT score, CAST(vec_id % 2 AS BIGINT) AS cohort, vec_id FROM s
),
r AS (
  SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)
              OVER w AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)
              OVER w AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) OVER () AS BIGINT)
           AS n0,
         CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) OVER () AS BIGINT)
           AS n1
  FROM m
  WINDOW w AS (ORDER BY score, vec_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(MAX(ABS(c0 * n1 - c1 * n0)) AS BIGINT) AS ks_num,
       CAST(MAX(n0) * MAX(n1) AS BIGINT) AS ks_den,
       CAST(MAX(ABS(c0 * n1 - c1 * n0)) * 1000000
            // (MAX(n0) * MAX(n1)) AS BIGINT) AS ks_ppm
FROM r
""",
)
def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the id-
    parity cohorts: max over the merged score ordering of
    |F̂₀(x) − F̂₁(x)|, kept as the integer |c₀·n₁ − c₁·n₀| (cleared
    denominators) until one final floor-ppm division — the
    distribution-shift test that, unlike PSI (q_psi_drift), needs no
    binning choice and detects ANY CDF divergence.

    Scale rationale: both empirical CDFs run through
    operators/ranking.global_cumsum — ONE range shuffle on the merged
    (score, vec_id) order carrying both conditional running counts,
    broadcast per-partition offsets — so no single-partition window
    survives; the cohort totals are a 1-row broadcast aggregate and
    the tail is one max-aggregate.  Everything BIGINT; ks_num ≤ n₀·n₁
    ≤ ~6e4² here — int64-safe to ~3e9 points per cohort.
    """
    s = _scored(spark, sf_dir)
    m = s.select("score", (F.col("vec_id") % 2).cast("long").alias("cohort"), "vec_id")
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    is0 = F.when(F.col("cohort") == 0, one).otherwise(z)
    is1 = F.when(F.col("cohort") == 1, one).otherwise(z)
    r = global_cumsum(
        m, ["score", "vec_id"], sums={"c0": is0, "c1": is1}
    ).join(
        F.broadcast(
            m.agg(F.sum(is0).alias("n0"), F.sum(is1).alias("n1"))
        ),
        how="cross",  # bounded: 1-row aggregate
    )
    return r.agg(
        F.max(F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0"))).alias("ks_num"),
        (F.max("n0") * F.max("n1")).alias("ks_den"),
        F.expr(
            "CAST(MAX(ABS(c0 * n1 - c1 * n0)) * 1000000 "
            "div (MAX(n0) * MAX(n1)) AS BIGINT)"
        ).alias("ks_ppm"),
    )
