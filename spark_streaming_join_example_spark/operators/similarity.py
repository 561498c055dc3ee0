"""Vector similarity search (SURVEY.md §2.11 X3).

Everything is built from JVM-side higher-order array functions
(zip_with/aggregate) — no Python in the hot path; whole-stage codegen
keeps the dot products inside one stage.

Two paths, per the scale mandate:
- exact top-k: all-pairs cosine — O(n²), correct, the oracle-checkable
  baseline (fine to a few 10⁴ vectors);
- ANN: random-hyperplane LSH bucketing — vectors hash to sign-pattern
  buckets, candidates only form within a bucket, turning O(n²) into
  O(Σ bucket²). Deterministic (hyperplanes from a seeded generator),
  rows-only checked + recall-tested in pytest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def as_double_array(col: Column | str) -> Column:
    """float[] → double[]: do similarity math in f64 on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_pairs(emb: DataFrame, k: int = 10, round_to: int = 6) -> DataFrame:
    """Exact top-k most-similar vector pairs (all-pairs baseline).

    Deterministic: ties broken by (a_id, b_id); displayed similarity
    rounded so the last-ulp difference between engines' libm can't
    flip the hash.
    """
    a = emb.select(
        F.col("vec_id").alias("a_id"), as_double_array("embedding").alias("a_vec")
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), as_double_array("embedding").alias("b_vec")
    )
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    cos = cosine(F.col("a_vec"), F.col("b_vec"))
    return (
        pairs.select("a_id", "b_id", F.round(cos, round_to).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG — no
    global RNG state, reproducible across runs/machines)."""
    planes: list[list[float]] = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(state / 0x40000000 - 1.0)  # uniform-ish in [-1, 1)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Sign-pattern LSH signature: array of n_planes bits (0/1)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = [
        (dot(vec, F.array(*[F.lit(w) for w in p])) >= 0).cast("int")
        for p in planes
    ]
    return F.array(*bits)


def ann_topk_pairs(
    emb: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k cosine pairs via banded hyperplane LSH.

    Bands of n_planes/bands bits each; a pair is a candidate if any
    band matches exactly. Candidates get exact (double) cosine, global
    top-k with id tiebreaks. Recall vs the exact path is asserted in
    tests/test_extensions.py.

    Scale: the band-explode + equi-join on (band, bucket) is a plain
    shuffle join — no quadratic blowup; skewed buckets are split by
    AQE.
    """
    rows_per_band = n_planes // bands
    sig = emb.select(
        "vec_id",
        as_double_array("embedding").alias("vec"),
    ).withColumn("sig", lsh_signature(F.col("vec"), dim, n_planes))
    banded = sig.select(
        "vec_id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.slice("sig", i * rows_per_band + 1, rows_per_band).alias(
                            "bucket"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "vec", "bb.band", "bb.bucket")
    a = banded.select(
        F.col("vec_id").alias("a_id"),
        F.col("vec").alias("a_vec"),
        "band",
        "bucket",
    )
    b = banded.select(
        F.col("vec_id").alias("b_id"),
        F.col("vec").alias("b_vec"),
        "band",
        "bucket",
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_vec", "b_vec")
        .dropDuplicates(["a_id", "b_id"])
    )
    cos = cosine(F.col("a_vec"), F.col("b_vec"))
    return (
        cand.select("a_id", "b_id", F.round(cos, round_to).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(k)
    )
