"""Deterministic distributed k-means (Lloyd's) in fixed-point integer
arithmetic.

Float k-means is not reproducible across partitionings: centroid means
accumulate doubles in shuffle order, so two runs on the same data can
drift and re-assign boundary points.  This implementation quantizes
vectors to micro-unit BIGINTs once up front; from then on every
quantity — squared distances, per-dimension sums, centroid floor-means,
inertia — is integer, so the fixpoint trajectory is bit-identical at
ANY partition count and cluster size.  (The quantization error is
1e-6 per coordinate — noise relative to any practical cluster scale.)

Distributed shape per iteration (the standard Pregel-style Lloyd's):
  1. broadcast the k×d integer centroid table into the assignment
     expression (k·d literals — a few hundred ints);
  2. assign each vector to the nearest centroid with an
     integer-squared-distance argmin, ties to the lowest cluster id
     (total order — no arbitrary choice);
  3. recompute centroids as per-cluster per-dimension integer sums
     (posexplode → groupBy — partial-aggregable, one shuffle of
     n·d skinny rows) floor-divided by counts.
The only driver materialization is the k×d sum table per iteration —
coordination metadata, bounded by k·d, never data.

Init is deterministic: the k vectors with the smallest ids (a
TakeOrderedAndProject, no RNG) — biased as an initializer but stable,
which is what a differential-tested pipeline needs; swap in k-means‖
sampling at quality-critical call sites.

BIGINT envelope: dist² ≤ d·(2·maxabs·1e6)² — for unit-ish embeddings
(|x| ≤ ~0.4, d=64) that is ~3.5e13 per vector; inertia sums stay under
2^63 through ~2.6e5× more rows than the sf0.1 fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 1_000_000


def kmeans_fixed_point(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Cluster ``vectors`` and return ``(id_col, cluster, dist2)`` —
    each point's cluster and its integer squared distance (micro-unit²)
    to the final centroid.  Deterministic: same data → same result at
    any partitioning."""
    q = vectors.select(
        F.col(id_col).alias("_id"),
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * F.lit(float(SCALE))).cast("long")
        ).alias("qv"),
    ).persist()

    # ---- deterministic init: k smallest ids (no RNG, plan = top-k) ----
    init = q.orderBy("_id").limit(k).collect()
    if len(init) < k:
        q.unpersist()
        raise ValueError(
            f"kmeans_fixed_point: need at least k={k} vectors, got {len(init)}"
        )
    centroids = [list(r.qv) for r in init]  # k × d ints

    def assign(df: DataFrame, cents: list[list[int]]) -> DataFrame:
        cent_lit = F.array(
            *[F.array(*[F.lit(int(v)) for v in c]) for c in cents]
        )
        dists = F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with("qv", c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        # argmin with ties to the LOWEST index: array_position returns
        # the first occurrence of the minimum
        return df.withColumn("_d", dists).select(
            "_id",
            "qv",
            (F.array_position("_d", F.array_min("_d")) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min("_d").alias("dist2"),
        )

    for _ in range(iters):
        a = assign(q, centroids)
        # per-cluster per-dimension integer sums: one partial-agg shuffle
        sums = (
            a.select("cluster", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(r.cluster, {})[r.pos] = (r.s, r.n)
        new_cents = []
        for ci in range(k):
            dims = by_cluster.get(ci)
            if not dims:  # empty cluster keeps its centroid (stable)
                new_cents.append(centroids[ci])
                continue
            d = len(dims)
            # Python floor-division mean: integer inputs are exact sums,
            # so the mean is a pure function of the data (floor vs
            # truncate toward zero is irrelevant for reproducibility —
            # this runs driver-side, one convention, every run)
            new_cents.append([dims[p][0] // dims[p][1] for p in range(d)])
        centroids = new_cents

    out = assign(q, centroids).select("_id", "cluster", "dist2").withColumnRenamed("_id", id_col)
    q.unpersist()
    return out
