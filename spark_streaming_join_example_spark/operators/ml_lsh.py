"""pyspark.ml LSH variants of the hand-rolled similarity/dedup paths
(SURVEY §2.11 X2/X3 scale alternatives).

The engine's primary implementations (`operators/dedup.py`,
`operators/similarity.py`) are pure-DataFrame pipelines because they
keep every stage visible to Catalyst. These wrappers exercise the
standard MLlib estimators over the same data — the off-the-shelf path
a user migrating from an ML codebase expects — and the tests assert
both paths agree on what a near-duplicate is.

Scale: both estimators emit per-row hash tables and implement
``approxSimilarityJoin`` as explode(hashes) → equi-join on
(table, band) → distance filter — the same O(Σ bucket²) plan shape as
our hand-rolled LSH, so everything in SCALE.md's similarity section
applies unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ml_minhash_pairs(
    docs: DataFrame,
    jaccard_threshold: float = 0.9,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """MinHashLSH near-dup pairs over token sets.

    Pipeline: tokens → CountVectorizer (binary presence vectors; the
    fit is one distinct-token pass) → MinHashLSH.approxSimilarityJoin
    at Jaccard distance ≤ 1 - threshold.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    # MinHashLSH requires ≥1 non-zero vector entry; filtering empty
    # token arrays BEFORE CountVectorizer is equivalent (binary=True,
    # minDF=1 ⇒ every surviving row has ≥1 non-zero) and stays JVM-side
    # where a post-hoc VectorUDT filter would need a row-at-a-time UDF.
    toks = docs.select(
        "doc_id",
        F.array_remove(F.array_distinct(F.split("text", " ")), "").alias("toks"),
    ).filter(F.size("toks") > 0)
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", binary=True, minDF=1.0
    ).fit(toks)
    vecs = cv.transform(toks).select("doc_id", "features")
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(vecs)
    pairs = mh.approxSimilarityJoin(
        vecs, vecs, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jac"),
        )
        .filter(F.col("a_id") < F.col("b_id"))
    )


def ml_brp_neighbors(
    emb: DataFrame,
    radius: float = 6.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """BucketedRandomProjectionLSH (Euclidean) neighbor pairs within
    `radius` — MLlib's ANN primitive for dense vectors."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        "vec_id",
        array_to_vector(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(vecs)
    pairs = brp.approxSimilarityJoin(vecs, vecs, radius, distCol="l2_dist")
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("a_id"),
            F.col("datasetB.vec_id").alias("b_id"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
        .filter(F.col("a_id") < F.col("b_id"))
    )
