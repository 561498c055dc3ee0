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


def cosine_topk_pairs(
    emb: DataFrame, k: int = 10, round_to: int = 6
) -> DataFrame:
    """Exact top-k most-similar vector pairs — block matrix-multiply.

    The right-hand side (ids + f64 matrix) is broadcast to executors;
    each Arrow batch of left rows computes a BLAS `A_n @ B_nᵀ` block,
    keeps its block-local top-3k pairs (a_id < b_id), and only those
    survive to the global TakeOrderedAndProject. Work is O(n²·d) flops
    but vectorized, and the shuffled data is O(k·batches), not O(n²).

    At 100 TB the broadcast side becomes the IVF/LSH bucket list
    (ann_topk_pairs) — this function is the per-bucket kernel.

    Deterministic: ties broken by (a_id, b_id); displayed similarity
    rounded so the last-ulp difference between engines' float math
    can't flip the hash.
    """
    import numpy as np

    spark = emb.sparkSession
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))
    keep = max(3 * k, 64)

    def block_topk(batches):
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ b_mat.T
            mask = a_ids[:, None] < b_ids[None, :]
            flat = np.where(mask.ravel(), sims.ravel(), -np.inf)
            n_take = min(keep, flat.size)
            idx = np.argpartition(-flat, n_take - 1)[:n_take]
            idx = idx[np.isfinite(flat[idx])]
            ai, bi = np.unravel_index(idx, sims.shape)
            yield pd.DataFrame(
                {
                    "a_id": a_ids[ai],
                    "b_id": b_ids[bi],
                    "cos_sim": sims[ai, bi],
                }
            )

    # spread the left side so the BLAS blocks run in parallel: ~500
    # rows per Python worker measured fastest (fewer → task overhead
    # dominates, more → workers idle). len(rows) is already known from
    # building the broadcast, so sizing costs nothing.
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 500))
    cand = (
        emb.select("vec_id", "embedding")
        .repartition(n_parts)
        .mapInPandas(block_topk, "a_id long, b_id long, cos_sim double")
    )
    return (
        cand.select("a_id", "b_id", F.round("cos_sim", round_to).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(k)
    )


def cosine_topk_pairs_hof(emb: DataFrame, k: int = 10, round_to: int = 6) -> DataFrame:
    """Pure-JVM all-pairs variant (zip_with/aggregate fold): no Python
    workers, sequential accumulation order. Slower than the BLAS block
    kernel at n ≳ 10³ — kept as the UDF-free reference formulation.
    """
    v = emb.select(
        F.col("vec_id"), as_double_array("embedding").alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    a = v.select(
        F.col("vec_id").alias("a_id"),
        F.col("vec").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    b = v.select(
        F.col("vec_id").alias("b_id"),
        F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
    cos = dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))
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


def cosine_pairs_above(
    emb: DataFrame, threshold: float, round_to: int = 6
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold — embedding-based
    near-duplicate detection (the vector twin of Jaccard near-dup).

    Same block matrix-multiply kernel as cosine_topk_pairs, but the
    block filter is the threshold, so emitted rows ≈ true near-dup
    pairs (output-sized, not n²-sized).
    """
    import numpy as np

    spark = emb.sparkSession
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def block_filter(batches):
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ b_mat.T
            keep = (a_ids[:, None] < b_ids[None, :]) & (sims >= threshold)
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "a_id": a_ids[ai],
                    "b_id": b_ids[bi],
                    "cos_sim": sims[ai, bi],
                }
            )

    cand = emb.select("vec_id", "embedding").mapInPandas(
        block_filter, "a_id long, b_id long, cos_sim double"
    )
    return cand.select(
        "a_id", "b_id", F.round("cos_sim", round_to).alias("cos_sim")
    )


def _kmeans_centroids(
    mat, n_cells: int, n_iter: int = 10, seed: int = 42
):
    """Tiny driver-side k-means over the (sampled) training matrix.

    At 100 TB you train on a ~1M-row sample exactly like this — IVF
    coarse quantizers are always trained on a sample; only assignment
    is distributed.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)  # cosine: rows are unit-norm
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_topk_pairs(
    emb: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    round_to: int = 6,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine pairs.

    Scale path for X3: a seeded k-means coarse quantizer (trained on a
    driver-side sample, broadcast) partitions vectors into cells; each
    vector is assigned to its `n_probe` nearest cells; candidate pairs
    only form inside a cell (equi-join on cell_id — a plain shuffled
    hash join, no O(n²) crossJoin); exact cosine re-ranks candidates.

    At 100 TB: assignment is a linear mapInPandas pass (d·n_cells flops
    per row), the per-cell joins shuffle on cell_id (AQE splits any fat
    cell), and the final top-k is a TakeOrderedAndProject. Recall is
    tuned by (n_cells, n_probe) exactly as in FAISS-style IVF-Flat.
    """
    import numpy as np

    spark = emb.sparkSession
    sample = emb.select("embedding").limit(4096).collect()
    mat = np.array([r.embedding for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent = _kmeans_centroids(mat, n_cells, seed=seed)
    bc = spark.sparkContext.broadcast(cent)

    def assign(batches):
        import pandas as pd

        c = bc.value
        for pdf in batches:
            v = np.array(list(pdf["embedding"]), dtype=np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ c.T
            order = np.argsort(-sims, axis=1)[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_probe),
                    "cell": order.ravel().astype("int32"),
                    "embedding": [
                        pdf["embedding"].iloc[i] for i in range(n) for _ in range(n_probe)
                    ],
                }
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell int, embedding array<float>"
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    cand = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            cosine(
                as_double_array(F.col("a.embedding")),
                as_double_array(F.col("b.embedding")),
            ).alias("cos_sim"),
        )
        .dropDuplicates(["a_id", "b_id"])  # pairs sharing >1 probed cell
    )
    return (
        cand.select("a_id", "b_id", F.round("cos_sim", round_to).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Query-vs-corpus k-nearest-neighbor join: for every query vector,
    its top-k corpus neighbors by cosine → (q_id, n_id, cos_sim, rank).

    The search shape of a retrieval pipeline (distinct from the
    all-pairs kernels): corpus (ids + unit-norm f64 matrix) broadcasts,
    queries stream through in Arrow batches, each batch does one BLAS
    block multiply and an O(n·k) argpartition — no shuffle at all until
    the (|Q|·k)-row result.

    At 100 TB the corpus side outgrows a broadcast; the plan becomes
    IVF: assign queries to probe cells (ivf_topk_pairs' quantizer),
    equi-join with cell-bucketed corpus, then this same kernel per
    cell. Deterministic: ties break by neighbor id.
    """
    import numpy as np

    spark = queries.sparkSession
    rows = corpus.select(id_col, vec_col).collect()
    c_ids = np.array([r[0] for r in rows], dtype=np.int64)
    c_mat = np.array([r[1] for r in rows], dtype=np.float64)
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    def block_knn(batches):
        import pandas as pd

        n_ids, n_mat = bc.value
        kk = min(k, len(n_ids))
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
            sims = q_mat @ n_mat.T
            # stable top-k: order by (-sim, neighbor_id)
            order = np.lexsort((n_ids[None, :].repeat(len(q_ids), 0), -sims), axis=1)[:, :kk]
            rows_out = {
                "q_id": np.repeat(q_ids, kk),
                "n_id": n_ids[order].ravel(),
                "cos_sim": np.take_along_axis(sims, order, axis=1).ravel(),
                "rank": np.tile(np.arange(1, kk + 1), len(q_ids)),
            }
            yield pd.DataFrame(rows_out)

    out = queries.select(id_col, vec_col).mapInPandas(
        block_knn, "q_id long, n_id long, cos_sim double, rank int"
    )
    return out.select(
        "q_id", "n_id", F.round("cos_sim", round_to).alias("cos_sim"), "rank"
    )
