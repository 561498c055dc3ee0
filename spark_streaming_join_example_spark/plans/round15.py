"""Round-15 additions: two LLM-training-pipeline dedup components the
registry did not yet cover as first-class operators —

* **Repeated-span (substring-level) dedup** (Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better"): find
  word-n-gram spans that recur across documents and measure, per
  document, how much of its text is covered by cross-document
  duplicated spans (the signal the ExactSubstr pass thresholds on).
  Document-level near-dup (MinHash/SimHash/prefix families) misses
  these partial overlaps by design.

* **SemDeDup** (Abbas et al. 2023): semantic duplicate groups over
  the embedding column — transitive closure of cosine ≥ τ pairs,
  keep one deterministic representative per group.  The exact mode
  is DuckDB-oracle-checked value-for-value (recursive-CTE closure,
  same contraction shape as q_dup_clusters' oracle); the LSH-blocked
  mode is the sub-quadratic 100 TB path (rows-only; precision exact
  by construction, recall pinned vs the exact mode in
  tests/test_extensions.py).

Conventions as in plans/round10-14.py: every computed column aliased
identically in both engines, BIGINT casts on counts, round(…, 6) on
the one float ratio, 1-based token positions on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.batch import load_table, parquet_num_rows
from .registry import register

# Word-5-gram spans: long enough that duplication means real copying
# on this fixture (docs are 10-99 words over a small vocabulary),
# short enough that partial overlaps still hit — the fixture-scaled
# stand-in for the 50-token spans of the ExactSubstr paper.
_SPAN = 5


def _grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_toks, pos, gram) over the documents table — the
    shared posting-list builder (operators/text.gram_positions, also
    the storable unit of streaming/span_index.py)."""
    from ..operators.text import gram_positions

    return gram_positions(
        load_table(spark, sf_dir, "documents"), span=_SPAN
    )


_GRAMS_CTE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_toks, CAST(i AS BIGINT) AS pos,
         array_to_string(w[i:i+4], ' ') AS gram
  FROM w, UNNEST(range(1, len(w) - 3)) AS r(i)
  WHERE len(w) >= 5
)
"""


@register(
    "q_repeated_grams",
    tags=("X1", "X5", "A1"),
    oracle=_GRAMS_CTE
    + """
SELECT gram,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS first_doc
FROM g
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def q_repeated_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: every word-5-gram appearing in
    ≥ 2 DISTINCT documents, with document frequency, total occurrence
    count, and the earliest document carrying it — the posting-list
    side of substring-level dedup (Lee et al. 2022), and the raw
    input q_span_coverage thresholds per-document.

    Scale: one explode (output ≈ token count, not n²) + one
    hash-partial groupBy on the gram key; the shuffle carries
    (gram, partial counts) — at 100 TB this is the canonical
    inverted-index build, and hot grams (boilerplate) collapse in the
    map-side combine.  No joins, no Python."""
    g = _grams(spark, sf_dir)
    return (
        g.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "q_span_coverage",
    tags=("X1", "X5", "W3", "A1"),
    oracle=_GRAMS_CTE
    + """
, dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), spans AS (
  SELECT doc_id, pos AS s, pos + 4 AS e, n_toks
  FROM g WHERE gram IN (SELECT gram FROM dup)
), isl AS (
  SELECT doc_id, s, e, n_toks,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), -1) + 1 THEN 1 ELSE 0 END AS new_isl
  FROM spans
), isl2 AS (
  SELECT doc_id, s, e, n_toks,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s) AS isl_id
  FROM isl
), islands AS (
  SELECT doc_id, isl_id, MIN(s) AS st, MAX(e) AS en, MAX(n_toks) AS n_toks
  FROM isl2 GROUP BY doc_id, isl_id
)
SELECT doc_id,
       MAX(n_toks) AS n_toks,
       CAST(SUM(en - st + 1) AS BIGINT) AS covered_toks,
       round(CAST(SUM(en - st + 1) AS DOUBLE) / MAX(n_toks), 6) AS dup_coverage,
       CAST(MAX(en - st + 1) AS BIGINT) AS longest_span
FROM islands
GROUP BY doc_id
""",
)
def q_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a
    document's tokens lying inside a word-5-gram that also occurs in
    ANOTHER document — substring-level dedup's keep/trim signal
    (documents above a coverage threshold get trimmed or dropped;
    doc-level Jaccard never sees these partial overlaps).

    Overlapping-or-adjacent hit spans merge into islands first
    (classic gaps-and-islands: a span opens a new island iff its
    start exceeds the running max end + 1), so covered_toks counts
    each token once; longest_span is the largest merged island.

    Scale: gram posting build + one self-semi-join on the gram key
    (duplicated grams only — boilerplate-sized, not corpus-sized) +
    ONE window pass per document ordered by position.  The window
    partition is a single document's hit spans (bounded by its token
    count), never the corpus."""
    from ..operators.text import span_coverage_frame

    g = _grams(spark, sf_dir)
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    return span_coverage_frame(g, dup, span=_SPAN)


@register(
    "q_semdedup_keep",
    tags=("X2", "X3", "J11"),
    oracle="""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.4
), edges AS MATERIALIZED (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id, a_id FROM pairs
), m1 AS MATERIALIZED (
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
), labels AS (
  SELECT n.s AS node, COALESCE(c.comp, n.m) AS component
  FROM m1 n LEFT JOIN comp1 c ON n.m = c.s
)
SELECT v.vec_id,
       COALESCE(l.component, v.vec_id) AS component,
       v.vec_id = COALESCE(l.component, v.vec_id) AS kept
FROM embeddings v LEFT JOIN labels l ON v.vec_id = l.node
""",
)
def q_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embeddings table, exact
    mode: semantic duplicate groups = transitive closure of cosine ≥
    0.4 pairs; each group keeps its min-vec_id representative.  One
    row per vector — (vec_id, component, kept) — so downstream
    filters are a single `WHERE kept` and group sizes are one
    groupBy away.

    The DuckDB oracle recomputes the closure from the quadratic
    cosine join (one min-label contraction round, then a recursive
    CTE over the CONTRACTED graph — same shape as q_dup_clusters'
    oracle), proving pairs→CC→representative end to end.

    Scale: this mode is the bounded correctness yardstick (Θ(n²·d)
    block kernel); the production path is q_semdedup_lsh — identical
    fold, sub-quadratic pair generation."""
    from ..operators.similarity import semdedup_keep

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_keep(
        emb,
        threshold=0.4,
        mode="exact",
        n_rows=parquet_num_rows(sf_dir, "embeddings"),
    )


@register("q_semdedup_lsh", tags=("X2", "X3"))
def q_semdedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at scale: identical closure + keep-representative fold
    as q_semdedup_keep, but pairs come from banded hyperplane LSH
    blocking (operators/similarity.ann_pairs_above) instead of the
    Θ(n²·d) exact kernel — per-bucket work only, output-sized pair
    shuffle, the paper's cluster-then-compare recipe with LSH buckets
    standing in for k-means cells.

    Rows-only (bucket membership has no DuckDB twin).  Precision is
    exact by construction (the in-bucket verify computes the true
    cosine); the keep-set's agreement with the exact mode is pinned
    in tests/test_extensions.py."""
    from ..operators.similarity import semdedup_keep

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_keep(
        emb,
        threshold=0.4,
        mode="lsh",
        bands=8,
        n_rows=parquet_num_rows(sf_dir, "embeddings"),
    )


@register(
    "q_span_trim",
    tags=("X1", "X5", "J10", "P5"),
    oracle=_GRAMS_CTE
    + """
, dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), spans AS (
  SELECT doc_id, pos AS s, pos + 4 AS e
  FROM g WHERE gram IN (SELECT gram FROM dup)
), isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), -1) + 1 THEN 1 ELSE 0 END AS new_isl
  FROM spans
), isl2 AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s) AS isl_id
  FROM isl
), islands AS (
  SELECT doc_id, isl_id, MIN(s) AS st, MAX(e) AS en
  FROM isl2 GROUP BY doc_id, isl_id
), cov AS (
  SELECT doc_id, CAST(SUM(en - st + 1) AS BIGINT) AS covered
  FROM islands GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
       CAST(len(string_split(d.text, ' ')) - COALESCE(c.covered, 0)
            AS BIGINT) AS kept_toks,
       COALESCE(c.covered, 0) * 2
         >= len(string_split(d.text, ' ')) AS dropped
FROM documents d LEFT JOIN cov c ON d.doc_id = c.doc_id
""",
)
def q_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION step of substring-level dedup: every document (left
    join — docs with no duplicated spans keep everything) with its
    retained token count after trimming cross-document duplicated
    islands, and the drop decision at the 50 % coverage rule.  The
    comparison is integer-exact (covered·2 ≥ n_toks), never a float
    divide, so the keep/drop set is bit-identical at any partitioning
    and in any engine.

    Scale: q_span_coverage's island relation (doc-bounded window) +
    one left join back to the corpus on the id key — corpus rows flow
    through untouched; only the covered-token column joins in."""
    from ..operators.text import span_coverage_frame

    g = _grams(spark, sf_dir)
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    cov = span_coverage_frame(g, dup, span=_SPAN).select(
        "doc_id", F.col("covered_toks").alias("covered")
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )
    out = d.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        (F.col("n_toks") - F.coalesce("covered", F.lit(0))).alias("kept_toks"),
        (F.coalesce("covered", F.lit(0)) * 2 >= F.col("n_toks")).alias(
            "dropped"
        ),
    )
    return out


@register("q_semdedup_kmeans", tags=("X2", "X3"))
def q_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup, the paper's literal recipe: k-means cells as the
    blocking stage (operators/similarity.ivf_pairs_above — seeded
    sample-trained quantizer, per-cell exact-cosine verify) feeding
    the same closure + min-id-representative fold as its exact and
    LSH siblings.  Rows-only (cell membership has no DuckDB twin);
    precision exact by construction; keep-set containment
    (exact_kept ⊆ kmeans_kept) and planted pile-up equality pinned in
    tests/test_extensions.py."""
    from ..operators.similarity import semdedup_keep

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_keep(emb, threshold=0.4, mode="kmeans")


@register(
    "q_common_span",
    tags=("X1", "X2", "W2", "J4"),
    oracle=_GRAMS_CTE
    + """
, m AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
), runs AS (
  SELECT a_id, b_id, diag,
         pa - row_number() OVER (PARTITION BY a_id, b_id, diag
                                 ORDER BY pa) AS grp
  FROM m
), rl AS (
  SELECT a_id, b_id, CAST(COUNT(*) AS BIGINT) AS run_grams
  FROM runs GROUP BY a_id, b_id, diag, grp
)
SELECT a_id, b_id,
       CAST(MAX(run_grams) + 4 AS BIGINT) AS longest_common_toks,
       CAST(SUM(run_grams) AS BIGINT) AS n_shared_grams
FROM rl GROUP BY a_id, b_id
""",
)
def q_common_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise LONGEST COMMON SPAN — the dedup-EXPLANATION op: for
    every document pair sharing at least one word-5-gram, the length
    in tokens of their longest contiguous shared run and the total
    aligned gram-match count.  This is the evidence a reviewer wants
    next to any near-dup score ("these two share a 93-token span"),
    and the contiguous-run generalization of q_repeated_grams.

    Algorithm: matched gram positions of a pair lie on DIAGONALS
    (pa − pb constant); consecutive positions on one diagonal are one
    contiguous common substring, so a per-(pair, diagonal) window +
    the pa − row_number() islands identity recovers exact run lengths
    — the classic dot-plot / LCS-band trick as two shuffles.

    Scale: join work is Σ df² over gram postings — bounded on real
    corpora because 5-gram doc frequencies are Zipf-tiny (measured
    here: hottest df = 4, join output 13.5 k rows at sf0.1), and the
    boilerplate grams that would blow it up are exactly the ones
    q_repeated_grams surfaces for stop-listing first.  The window
    partition is one pair's matches on one diagonal — bounded by the
    shorter document."""
    g = _grams(spark, sf_dir)
    a = g.select(
        F.col("doc_id").alias("a_id"), F.col("pos").alias("pa"), "gram"
    )
    b = g.select(
        F.col("doc_id").alias("b_id"), F.col("pos").alias("pb"), "gram"
    )
    m = (
        a.join(b, "gram")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("a_id", "b_id", "diag").orderBy("pa")
    runs = m.withColumn("grp", F.col("pa") - F.row_number().over(w))
    rl = runs.groupBy("a_id", "b_id", "diag", "grp").agg(
        F.count(F.lit(1)).alias("run_grams")
    )
    return rl.groupBy("a_id", "b_id").agg(
        (F.max("run_grams") + (_SPAN - 1)).alias("longest_common_toks"),
        F.sum("run_grams").alias("n_shared_grams"),
    )


@register(
    "q_curation_funnel",
    tags=("X1", "X5", "A1", "P5"),
    oracle=_GRAMS_CTE
    + """
, dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), spans AS (
  SELECT doc_id, pos AS s, pos + 4 AS e
  FROM g WHERE gram IN (SELECT gram FROM dup)
), isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), -1) + 1 THEN 1 ELSE 0 END AS ni
  FROM spans
), isl2 AS (
  SELECT doc_id, s, e, SUM(ni) OVER (PARTITION BY doc_id ORDER BY s) AS iid
  FROM isl
), islands AS (
  SELECT doc_id, iid, MIN(s) AS st, MAX(e) AS en
  FROM isl2 GROUP BY doc_id, iid
), cov AS (
  SELECT doc_id, CAST(SUM(en - st + 1) AS BIGINT) AS covered
  FROM islands GROUP BY doc_id
), base AS (
  SELECT d.doc_id, d.text,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
         COALESCE(c.covered, 0) AS covered
  FROM documents d LEFT JOIN cov c ON d.doc_id = c.doc_id
),
s1 AS (SELECT * FROM base WHERE n_toks >= 12),
s2 AS (SELECT * FROM s1 WHERE covered * 2 < n_toks),
s3 AS (SELECT MIN(doc_id) AS keep FROM s2 GROUP BY text)
SELECT stage, n_docs FROM (
  SELECT 0 AS ord, 'ingested' AS stage,
         CAST(COUNT(*) AS BIGINT) AS n_docs FROM base
  UNION ALL SELECT 1, 'quality', CAST(COUNT(*) AS BIGINT) FROM s1
  UNION ALL SELECT 2, 'span_dedup', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s3
) ORDER BY ord
""",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation FUNNEL report: surviving document counts
    after each cumulative pipeline stage — (1) ingest, (2) quality
    gate (n_toks ≥ 12, the fixture-scaled stand-in for a Gopher-style
    length rule), (3) substring-level dedup (drop docs whose
    cross-document duplicated-span coverage reaches the integer-exact
    50 % rule — q_span_trim's decision), (4) exact content dedup
    (keep the min doc_id per identical text).  One row per stage, the
    report every curation run ships with its output corpus.

    Stage semantics pinned deliberately: span coverage is computed on
    the FULL ingested corpus (dedup signals are corpus properties;
    filtering first would hide duplication between a kept and a
    dropped doc), then the stages apply cumulatively.

    Scale: the span relation is shared with q_span_trim (one posting
    build + one doc-bounded window); every stage count is a
    partial-aggregable COUNT; the exact-dedup stage shuffles one
    (text-hash) key.  The four scalar counts union at the end — at
    100 TB this whole report is one pass over the corpus plus the
    posting join."""
    from ..operators.text import span_coverage_frame

    g = _grams(spark, sf_dir)
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    cov = span_coverage_frame(g, dup, span=_SPAN).select(
        "doc_id", F.col("covered_toks").alias("covered")
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    base = d.join(cov, "doc_id", "left").select(
        "doc_id",
        "text",
        "n_toks",
        F.coalesce("covered", F.lit(0)).alias("covered"),
    ).localCheckpoint(eager=False)
    s1 = base.filter(F.col("n_toks") >= 12)
    s2 = s1.filter(F.col("covered") * 2 < F.col("n_toks"))
    s3 = s2.groupBy("text").agg(F.min("doc_id").alias("keep"))

    def stage(df, ord_, name):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(ord_).alias("ord"),
            F.lit(name).alias("stage"),
            F.col("n_docs"),
        )

    out = (
        stage(base, 0, "ingested")
        .unionByName(stage(s1, 1, "quality"))
        .unionByName(stage(s2, 2, "span_dedup"))
        .unionByName(stage(s3, 3, "exact_dedup"))
    )
    return out.orderBy("ord").select("stage", "n_docs")
