"""Vector similarity search (SURVEY.md §2.11 X3).

One kernel shape everywhere: vectors shuffle into bounded groups
(triangular block-pairs for exact, LSH buckets / IVF cells for
approximate), each group runs a unit-norm BLAS `A @ Bᵀ` block in an
Arrow-batched applyInPandas and emits only its group-local top-3k —
candidate PAIRS never materialize as rows, so shuffle volume is
O(n·replication) vector rows + O(k·groups) results, never O(pairs).
HOF (zip_with/aggregate) formulations are kept for per-row scoring
and as the UDF-free reference twin (cosine_topk_pairs_hof).

Paths, per the scale mandate:
- exact top-k / threshold: distributed block-pair all-pairs — O(n²·d)
  flops (it is exact), oracle-checked, the per-bucket kernel for the
  approximate paths;
- ANN: seeded random-hyperplane LSH, bits-per-band auto-scaled with n;
- IVF: sample-trained k-means cells, n_probe assignment;
- knn: corpus-streaming bounded-query broadcast, or IVF-celled cogroup
  when the query set outgrows a broadcast.
All seeded/deterministic; approximate paths recall-pinned in pytest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


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


def _block_pair_groups(emb: DataFrame, n_blocks: int) -> DataFrame:
    """Replicate rows into triangular block-pair groups for exact
    distributed all-pairs: row with block b joins every group
    (min(b, j), max(b, j)) for j in 0..P-1, so any pair of rows meets
    in exactly one (gi, gj) group, gi <= gj.

    Shuffle volume is O(n·P) rows (NOT O(n²)); per-group compute is
    O((n/P)²·d) BLAS flops. No driver materialization anywhere — this
    replaces the round-1 collect()+broadcast kernel whose driver-side
    full-table materialization was the one non-distributed step in the
    engine. At 100 TB raise P so n/P fits an executor's Arrow batch.
    """
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    pairs = F.array(
        *[
            F.struct(
                F.least(blk, F.lit(j)).alias("gi"),
                F.greatest(blk, F.lit(j)).alias("gj"),
            )
            for j in range(n_blocks)
        ]
    )
    return (
        emb.select("vec_id", "embedding")
        .withColumn("blk", blk)
        .withColumn("g", F.explode(pairs))
        .select("vec_id", "embedding", "blk", "g.gi", "g.gj")
    )


def _group_sims(pdf):
    """Unit-norm BLAS sims for one block-pair group: side A = rows in
    block gi, side B = rows in block gj (identical when gi == gj).

    Returns (a_ids, b_ids, sims, mask). Within-block groups (gi == gj)
    mask to the strict upper triangle (a_id < b_id kills self-pairs
    and mirror duplicates); cross-block groups keep EVERY A×B cell —
    the two blocks are disjoint, so each unordered pair appears in
    exactly one cell regardless of which side holds the smaller id
    (emitters reorient to (min_id, max_id) afterwards)."""
    import numpy as np

    gi = int(pdf["gi"].iloc[0])
    gj = int(pdf["gj"].iloc[0])
    blk = pdf["blk"].to_numpy()
    a_sel = blk == gi
    b_sel = blk == gj
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(list(pdf["embedding"]), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    a_ids, a_mat = ids[a_sel], mat[a_sel]
    b_ids, b_mat = ids[b_sel], mat[b_sel]
    sims = a_mat @ b_mat.T
    if gi == gj:
        mask = a_ids[:, None] < b_ids[None, :]
    else:
        mask = np.ones_like(sims, dtype=bool)
    return a_ids, b_ids, sims, mask


def _pairs_topk_frame(ids_a, ids_b, sims, mask, keep, reorient=False):
    """Shared group-local top-k emitter for the BLAS kernels: mask the
    sims matrix, argpartition the top `keep` finite cells, and build
    the (a_id, b_id, cos_sim) pandas frame.  With reorient=True the id
    pair is normalized to (min, max) — required when side A may hold
    the larger id (cross-block groups)."""
    import numpy as np
    import pandas as pd

    flat = np.where(mask.ravel(), sims.ravel(), -np.inf)
    n_take = min(keep, flat.size)
    if n_take == 0:
        return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []}).astype(
            {"a_id": "int64", "b_id": "int64", "cos_sim": "float64"}
        )
    idx = np.argpartition(-flat, n_take - 1)[:n_take]
    idx = idx[np.isfinite(flat[idx])]
    ai, bi = np.unravel_index(idx, sims.shape)
    a_out, b_out = ids_a[ai], ids_b[bi]
    if reorient:
        a_out, b_out = np.minimum(a_out, b_out), np.maximum(a_out, b_out)
    return pd.DataFrame({"a_id": a_out, "b_id": b_out, "cos_sim": sims[ai, bi]})


def _auto_blocks(
    emb: DataFrame, n_blocks: int | None, n_rows: int | None = None
) -> int:
    """Pick P so BLAS groups hold ~500 rows (measured fastest: fewer →
    Python-worker overhead dominates, more → workers idle), bounded to
    [2, 64] — P² group count must stay sane; past the cap the exact
    kernel is the wrong tool and ANN/IVF take over anyway.

    Auto-sizing costs one count() action per invocation — cheap
    (metadata-only) when `emb` is a bare parquet scan, a real pass when
    it is a filtered/derived plan. Callers that know the cardinality
    (or want to skip the action) pass `n_rows` or an explicit
    `n_blocks`."""
    if n_blocks is not None:
        return n_blocks
    n = emb.count() if n_rows is None else n_rows
    return max(2, min(64, (n + 499) // 500))


def cosine_topk_pairs(
    emb: DataFrame,
    k: int = 10,
    round_to: int = 6,
    n_blocks: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Exact top-k most-similar vector pairs — distributed block
    matrix-multiply, no driver-side materialization.

    Rows replicate into P(P+1)/2 triangular block-pair groups
    (_block_pair_groups); each group runs one BLAS `A @ Bᵀ` block and
    keeps its group-local top-3k (a_id < b_id) pairs; only those reach
    the global TakeOrderedAndProject. Work is O(n²·d) flops (it is an
    exact all-pairs) but fully distributed: shuffle O(n·P + k·groups),
    driver sees k rows. For sub-quadratic compute at extreme n, switch
    to ann_topk_pairs / ivf_topk_pairs, which reuse this shape per
    bucket.

    Deterministic: ties broken by (a_id, b_id); displayed similarity
    rounded so the last-ulp difference between engines' float math
    can't flip the hash.
    """
    n_blocks = _auto_blocks(emb, n_blocks, n_rows)
    keep = max(3 * k, 64)

    def group_topk(pdf):
        a_ids, b_ids, sims, mask = _group_sims(pdf)
        return _pairs_topk_frame(a_ids, b_ids, sims, mask, keep, reorient=True)

    cand = (
        _block_pair_groups(emb, n_blocks)
        .groupBy("gi", "gj")
        .applyInPandas(group_topk, "a_id long, b_id long, cos_sim double")
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


def _banded_salted(
    emb: DataFrame,
    dim: int,
    n_planes: int,
    bands: int,
    max_bucket: int,
) -> DataFrame:
    """The shared LSH blocking relation: band-sliced sign signatures
    exploded to (vec_id, vec, band, bucket) rows, hot buckets salted
    into triangular sub-block pair groups (see ann_topk_pairs' skew
    guard note — P=1 buckets come through untouched)."""
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
                        F.array_join(
                            F.slice("sig", i * rows_per_band + 1, rows_per_band),
                            "",
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "vec", "bb.band", "bb.bucket")

    # Salt-within-bucket: P sub-blocks per bucket (P=1 when not hot),
    # triangular sub-block pair groups, each row replicated P times
    # within its bucket only.
    w_bucket = Window.partitionBy("band", "bucket")
    return (
        banded.withColumn(
            "p",
            F.ceil(F.count(F.lit(1)).over(w_bucket) / F.lit(max_bucket)).cast(
                "int"
            ),
        )
        .withColumn("sb", F.pmod(F.xxhash64("vec_id"), F.col("p")).cast("int"))
        .withColumn(
            "g",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("p") - 1),
                    lambda j: F.struct(
                        F.least(F.col("sb"), j).alias("gi"),
                        F.greatest(F.col("sb"), j).alias("gj"),
                    ),
                )
            ),
        )
        .select("vec_id", "vec", "band", "bucket", "sb", "g.gi", "g.gj")
    )


def ann_topk_pairs(
    emb: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int | None = None,
    bands: int = 4,
    round_to: int = 6,
    n_rows: int | None = None,
    max_bucket: int = 4096,
) -> DataFrame:
    """Approximate top-k cosine pairs via banded hyperplane LSH with a
    per-bucket BLAS kernel.

    Bands of n_planes/bands sign bits each; a pair is a candidate iff
    some band matches exactly. Candidates are NEVER materialized as
    pair rows: each (band, bucket) group runs one unit-norm `A @ Aᵀ`
    block in applyInPandas and emits only its bucket-local top-3k
    (a_id < b_id) pairs — shuffle is O(n·bands) vector rows plus
    O(k·buckets) result rows, not O(Σ bucket²) pairs dragging two
    vectors each (the round-1 per-pair HOF-join form shuffled ~1 GB at
    8k vectors; this form shuffles ~32k rows). Cross-band duplicate
    winners collapse in the final dedup + TakeOrdered.

    Bits per band auto-scale with corpus size (buckets ≈ n/64 per
    band) so bucket population stays bounded as n grows — the knob a
    fixed 16-plane signature lacks. Auto-scaling costs one count()
    action (metadata-only on a bare scan; a real pass on derived
    inputs — pass `n_planes` or `n_rows` to skip it). Recall vs the
    exact kernel is asserted in tests/test_extensions.py.

    Skew guard (``max_bucket``): auto-scaled bits bound the AVERAGE
    bucket, but a hot bucket (near-duplicate pile-ups: boilerplate
    docs, zero vectors) concentrates B rows in ONE applyInPandas group
    — O(B²·d) flops in a single task that AQE cannot split (group
    semantics are opaque to it; skew-join splitting only helps the
    join-shaped MinHash candidate path).  So any bucket larger than
    ``max_bucket`` is salted within the bucket: rows hash into
    P = ceil(B/max_bucket) sub-blocks and each triangular sub-block
    pair (gi ≤ gj) becomes its own group — every within-bucket pair
    still meets exactly once, tasks are bounded at 2·max_bucket rows,
    and sub-blocking only widens the set of surviving local winners
    (recall can only improve).  Cost when no bucket is hot: one extra
    window count over the already-shuffled (band, bucket) partitions;
    P=1 buckets explode to a single group exactly as before.  Pinned
    by tests/test_extensions.py::test_ann_hot_bucket_salting.
    """
    import math

    if n_planes is None:
        n = emb.count() if n_rows is None else n_rows
        bits = max(2, min(16, math.ceil(math.log2(max(2, n / 64)))))
        n_planes = bands * bits
    keep = max(3 * k, 64)
    salted = _banded_salted(emb, dim, n_planes, bands, max_bucket)

    def bucket_topk(pdf):
        import numpy as np

        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        sb = pdf["sb"].to_numpy()
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        a_sel, b_sel = sb == gi, sb == gj
        a_ids, b_ids = ids[a_sel], ids[b_sel]
        sims = mat[a_sel] @ mat[b_sel].T
        if gi == gj:
            mask = a_ids[:, None] < b_ids[None, :]
        else:
            mask = np.ones_like(sims, dtype=bool)
        return _pairs_topk_frame(a_ids, b_ids, sims, mask, keep, reorient=True)

    cand = (
        salted.groupBy("band", "bucket", "gi", "gj")
        .applyInPandas(bucket_topk, "a_id long, b_id long, cos_sim double")
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.select("a_id", "b_id", F.round("cos_sim", round_to).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(k)
    )


def ann_pairs_above(
    emb: DataFrame,
    threshold: float,
    dim: int = 64,
    n_planes: int | None = None,
    bands: int = 4,
    round_to: int = 6,
    n_rows: int | None = None,
    max_bucket: int = 4096,
) -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs at scale: every pair with
    cosine ≥ ``threshold`` whose vectors share at least one LSH band
    bucket — the vector twin of the MinHash banded join
    (operators/dedup.minhash_near_duplicates), and the sub-quadratic
    path where :func:`cosine_pairs_above` (the exact reference) pays
    Θ(n²·d) block-pair flops.

    Same banded hyperplane blocking + hot-bucket salting as
    :func:`ann_topk_pairs`, but the per-bucket kernel emits ALL
    bucket-local pairs meeting the threshold instead of a local
    top-k, and there is no global limit.  The verify is the exact
    cosine on the raw vectors inside the kernel, so PRECISION IS
    EXACT — every emitted pair truly clears the threshold; recall is
    the LSH collision probability 1 − (1 − s^bits)^bands (high where
    near-dups live, s → 1), pinned against the exact kernel in
    tests/test_extensions.py.  Cross-band rediscoveries carry the
    same exact cosine, so the dedup keeps an arbitrary-but-identical
    row.

    At 100 TB: shuffle is O(n·bands) vector rows; per-bucket work is
    bounded by ``max_bucket`` (salting splits hot near-dup pile-ups);
    output is near-dup-pair-sized.  Like the Jaccard indexes, the
    plane seed and band scheme must stay FROZEN for any persisted
    signature store."""
    import math

    if n_planes is None:
        n = emb.count() if n_rows is None else n_rows
        bits = max(2, min(16, math.ceil(math.log2(max(2, n / 64)))))
        n_planes = bands * bits
    salted = _banded_salted(emb, dim, n_planes, bands, max_bucket)

    def bucket_pairs(pdf):
        import numpy as np
        import pandas as pd

        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        sb = pdf["sb"].to_numpy()
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        a_sel, b_sel = sb == gi, sb == gj
        a_ids, b_ids = ids[a_sel], ids[b_sel]
        sims = mat[a_sel] @ mat[b_sel].T
        if gi == gj:
            mask = a_ids[:, None] < b_ids[None, :]
        else:
            mask = np.ones_like(sims, dtype=bool)
        keep = mask & (sims >= threshold)
        ai, bi = np.nonzero(keep)
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame(
            {"a_id": lo, "b_id": hi, "cos_sim": sims[ai, bi]}
        )

    cand = (
        salted.groupBy("band", "bucket", "gi", "gj")
        .applyInPandas(bucket_pairs, "a_id long, b_id long, cos_sim double")
        .dropDuplicates(["a_id", "b_id"])
    )
    return cand.select(
        "a_id", "b_id", F.round("cos_sim", round_to).alias("cos_sim")
    )


def _assign_nearest_1d(x, cent):
    """Exact 1-D nearest-centroid assignment — the same result as
    ``np.argmin`` over the full |x−c|² matrix, including its
    first-minimum-index tie-break, at O(N log K) instead of O(N·K).

    Sort the centroids once; each point's nearest centroid VALUE is
    one of the two bracketing its ``searchsorted`` insertion point.
    ``argmin`` resolves a distance tie (midpoint hit, or duplicate
    centroid values) to the smallest ORIGINAL index, so per run of
    equal sorted values we carry the run's smallest original index
    (stable argsort ⇒ the run's first element) and break the
    left/right midpoint tie toward the smaller of those.  Equivalence
    to the matrix path — on the real fixture samples and on crafted
    tie/duplicate inputs — is pinned in tests/test_extensions.py."""
    import numpy as np

    k = len(cent)
    order = np.argsort(cent, kind="stable")
    cs = cent[order]
    run_start = np.empty(k, dtype=bool)
    run_start[0] = True
    run_start[1:] = cs[1:] != cs[:-1]
    # per sorted position: the index argmin would report for that value
    cand = order[np.nonzero(run_start)[0]][np.cumsum(run_start) - 1]
    pos = np.searchsorted(cs, x)
    left = np.clip(pos - 1, 0, k - 1)
    right = np.clip(pos, 0, k - 1)
    dl = np.abs(x - cs[left])
    dr = np.abs(x - cs[right])
    il, ir = cand[left], cand[right]
    pick_right = (dr < dl) | ((dr == dl) & (ir < il))
    return np.where(pick_right, ir, il)


def _kmeans_l2(mat, kk: int, n_iter: int = 10, seed: int = 42):
    """Plain Euclidean k-means for PQ sub-quantizers (the cosine
    variant `_kmeans_centroids` re-normalizes centroids — wrong for
    subspace residuals, whose magnitude carries information).

    Fully vectorized Lloyd rounds (r8): distances via the BLAS
    |a|²−2ab+|b|² form and per-cluster means via bincount over the
    ≤16 subspace dims — the old per-centroid Python loop was 256
    fancy-indexing passes per round and dominated q_pq_topk's
    wall-clock (driver-side training 7.2 s → ~0.3 s).  Still fully
    deterministic (seeded init, fixed iteration order); empty
    clusters keep their previous centroid, as before.

    r16 (guide §1.2 — q_pq_topk's registered m=16 over d=16 makes
    every subspace ONE-dimensional, and the N×K distance matrix was
    ~100 % of the remaining training cost): 1-D subspaces route
    through :func:`_assign_nearest_1d` (sorted centroids +
    searchsorted), which returns bit-identical assignments — same
    centroids out, measured ~15× faster per round."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cent = mat[
        rng.choice(len(mat), size=min(kk, len(mat)), replace=False)
    ].copy()
    one_d = mat.shape[1] == 1
    x = mat[:, 0] if one_d else None
    sq = None if one_d else (mat**2).sum(axis=1)[:, None]
    for _ in range(n_iter):
        if one_d:
            assign = _assign_nearest_1d(x, cent[:, 0])
        else:
            d2 = sq - 2.0 * (mat @ cent.T) + (cent**2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
        counts = np.bincount(assign, minlength=len(cent))
        sums = np.stack(
            [
                np.bincount(assign, weights=mat[:, d], minlength=len(cent))
                for d in range(mat.shape[1])
            ],
            axis=1,
        )
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz][:, None]
    return cent


def pq_codebooks(
    emb: DataFrame, m: int = 4, nbits: int = 4, seed: int = 42,
    n_iter: int = 4,
):
    """Train product-quantization codebooks on the deterministic
    bounded sample (same discipline as the IVF coarse quantizer):
    unit-normalize, split the dimension into ``m`` subspaces, run L2
    k-means with ``2**nbits`` centroids per subspace.  Returns
    ``(books, tables)`` where ``books[j]`` is the subspace-j codebook
    and ``tables[j][a][b] = books[j][a] · books[j][b]`` is the
    symmetric-distance-computation (SDC) lookup table.

    ``n_iter`` (r16, VERDICT r15 item 4): 4 Lloyd rounds, down from
    the kernel's old 10 — the codebooks only have to RANK candidates
    well enough that the true top-k survives the generous per-group
    ``keep`` cut (the re-rank is exact), and the driver-side training
    was ~0.5 s of q_pq_topk's 2.4 s wall.  Measured: the registered
    query's output is IDENTICAL at n_iter 10 / 4 / 2 on every fixture
    (full 10/10 recall vs the exact kernel at each — the equality is
    pinned in tests/test_extensions.py); 4 keeps convergence margin
    over 2 for unseen corpora."""
    import numpy as np

    sample = _deterministic_sample(emb, "embedding")
    mat = np.array([r[0] for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    ds = d // m
    books = [
        _kmeans_l2(
            mat[:, j * ds : (j + 1) * ds], 2**nbits,
            n_iter=n_iter, seed=seed + j,
        )
        for j in range(m)
    ]
    tables = [b @ b.T for b in books]
    return books, tables


def pq_encode(
    emb: DataFrame, books, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """PQ-encode every vector: per subspace, the index of its nearest
    codebook centroid (L2, on the unit-normalized vector).  A d-dim
    float vector becomes ``m`` small ints — at (d=16, m=4, nbits=4)
    that is 64 bytes → 4 codes, the 10-100× shuffle/memory shrink that
    makes billion-vector pair search feasible."""
    import numpy as np

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(books)

    def fn(batches):
        import pandas as pd

        bks = bc.value
        ds = bks[0].shape[1]
        for pdf in batches:
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            codes = np.empty((len(v), len(bks)), dtype=np.int32)
            for j, b in enumerate(bks):
                sub = v[:, j * ds : (j + 1) * ds]
                d2 = (
                    (sub**2).sum(1, keepdims=True)
                    - 2.0 * (sub @ b.T)
                    + (b**2).sum(1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        fn, f"{id_col} long, codes array<int>"
    )


def pq_topk_pairs(
    emb: DataFrame,
    k: int = 10,
    m: int = 8,
    nbits: int = 4,
    round_to: int = 6,
    seed: int = 42,
    n_blocks: int | None = None,
    n_rows: int | None = None,
    keep: int | None = None,
) -> DataFrame:
    """Product-quantization approximate top-k cosine pairs: the X3
    memory-side scale path, complementing IVF (which prunes the
    CANDIDATE set; PQ shrinks the PER-CANDIDATE cost).

    Vectors are PQ-encoded once (a linear mapInPandas pass), then the
    same triangular block-pair layout as the exact kernel runs over
    CODES instead of floats — the shuffle moves m small ints per row
    instead of d floats, and each candidate pair costs m table lookups
    instead of d multiplies, from broadcast ksub×ksub SDC tables.  The
    estimate is the cosine of the RECONSTRUCTIONS (dot normalized by
    reconstruction norms — unnormalized SDC is biased low because
    centroids shrink toward subspace means).  Each group emits its
    top-`keep` pairs BY ESTIMATE; an exact re-rank then joins the raw
    vectors back for only those O(P²·keep) candidates — the standard
    PQ-then-rerank retrieval shape, so reported similarities are
    exact and recall depends only on the candidate stage.  At 100 TB
    this is the difference between shuffling 4 KB and 8-64 B per
    vector in the quadratic stage; recall is tuned by (m, nbits,
    keep) exactly as in FAISS.  ``keep`` (candidates emitted per
    group, default 50·k) is deliberately much larger than the exact
    kernel's 3·k margin: quantization noise means a true top-k pair
    may rank hundreds deep in the ESTIMATE order, and candidates are
    cheap — the re-rank join is linear in P²·keep.  Note the fixture
    embeddings are near-random (dims uncorrelated): PQ's adversarial
    case, where sub-quantizers find no structure — real embedding
    corpora (which are anisotropic) quantize far better at the same
    bit budget.  Recall vs the exact kernel is pinned in
    tests/test_extensions.py."""
    import numpy as np

    spark = emb.sparkSession
    books, tables = pq_codebooks(emb, m=m, nbits=nbits, seed=seed)
    bc_tables = spark.sparkContext.broadcast(np.stack(tables))
    codes = pq_encode(emb, books)
    p = _auto_blocks(codes, n_blocks, n_rows)
    keep = max(50 * k, 256) if keep is None else keep

    blk = F.pmod(F.col("vec_id"), F.lit(p)).cast("int")
    pairs = F.array(
        *[
            F.struct(
                F.least(blk, F.lit(j)).alias("gi"),
                F.greatest(blk, F.lit(j)).alias("gj"),
            )
            for j in range(p)
        ]
    )
    grouped = (
        codes.withColumn("blk", blk)
        .withColumn("g", F.explode(pairs))
        .select("vec_id", "codes", "blk", "g.gi", "g.gj")
    )

    def group_pq(pdf):
        t = bc_tables.value
        gi = int(pdf["gi"].iloc[0])
        gj = int(pdf["gj"].iloc[0])
        blk_ = pdf["blk"].to_numpy()
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        cds = np.array(list(pdf["codes"]), dtype=np.int64)
        a_sel, b_sel = blk_ == gi, blk_ == gj
        a_ids, a_c = ids[a_sel], cds[a_sel]
        b_ids, b_c = ids[b_sel], cds[b_sel]
        sims = np.zeros((len(a_ids), len(b_ids)))
        # |recon|² = Σ_j T[j][c][c] — diagonal lookups, m per row
        na2 = np.zeros(len(a_ids))
        nb2 = np.zeros(len(b_ids))
        for j in range(t.shape[0]):
            sims += t[j][a_c[:, j]][:, b_c[:, j]]
            na2 += t[j][a_c[:, j], a_c[:, j]]
            nb2 += t[j][b_c[:, j], b_c[:, j]]
        with np.errstate(divide="ignore", invalid="ignore"):
            sims /= np.sqrt(na2)[:, None] * np.sqrt(nb2)[None, :]
        sims = np.nan_to_num(sims, nan=-2.0)
        if gi == gj:
            mask = a_ids[:, None] < b_ids[None, :]
        else:
            mask = np.ones_like(sims, dtype=bool)
        return _pairs_topk_frame(
            a_ids, b_ids, sims, mask, keep, reorient=True
        ).rename(columns={"cos_sim": "pq_sim"})

    cand = (
        grouped.groupBy("gi", "gj")
        .applyInPandas(group_pq, "a_id long, b_id long, pq_sim double")
        .dropDuplicates(["a_id", "b_id"])
    )
    # exact re-rank: raw vectors join back for ONLY the O(P²·keep)
    # candidates; reported similarity is exact JVM-side cosine
    va = emb.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("_va")
    )
    vb = emb.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("_vb")
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                cosine(as_double_array("_va"), as_double_array("_vb")),
                round_to,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "a_id", "b_id")
        .limit(k)
    )


def cosine_pairs_above(
    emb: DataFrame,
    threshold: float,
    round_to: int = 6,
    n_blocks: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold — embedding-based
    near-duplicate detection (the vector twin of Jaccard near-dup).

    Same distributed block-pair kernel as cosine_topk_pairs (no driver
    materialization), but the per-group filter is the threshold, so
    emitted rows ≈ true near-dup pairs (output-sized, not n²-sized).
    `n_blocks`/`n_rows` skip the auto-sizing count() action — pass one
    when the input is a derived plan for which a count is a real pass.
    """

    def group_filter(pdf):
        import numpy as np
        import pandas as pd

        a_ids, b_ids, sims, mask = _group_sims(pdf)
        keep = mask & (sims >= threshold)
        ai, bi = np.nonzero(keep)
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame({"a_id": lo, "b_id": hi, "cos_sim": sims[ai, bi]})

    cand = (
        _block_pair_groups(emb, _auto_blocks(emb, n_blocks, n_rows))
        .groupBy("gi", "gj")
        .applyInPandas(group_filter, "a_id long, b_id long, cos_sim double")
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


def _deterministic_sample(df: DataFrame, col: str, n: int = 4096) -> list:
    """Layout-independent bounded quantizer-training sample.

    A bare ``limit(n).collect()`` returns whichever rows the first
    partitions happen to serve — the sample (and therefore the trained
    IVF centroids) silently changed with file layout, partition count,
    or scheduler timing.  Ordering by a content hash first makes the
    take a distributed top-n (TakeOrderedAndProject: per-partition
    heads, merged on the driver — never a full sort) that selects the
    SAME pseudo-random rows on any layout, any engine run.  The column
    itself is the tie-break so the order is total even under hash
    collisions of distinct values.  Sample-trained coarse quantizers
    are standard FAISS practice; this just makes ours reproducible.
    """
    c = F.col(col)
    return df.select(col).orderBy(F.xxhash64(c), c).limit(n).collect()


def _unit_rows(v):
    """Row-normalize a float matrix, mapping zero-norm rows to zero
    rows instead of NaN (r12 advisor fix): a NaN row makes argsort
    cell assignment arbitrary and silently drops the vector from
    every ≥-threshold pair.  With the zero-row convention, a zero
    vector has cosine 0 against everything — deterministically below
    any positive threshold and assigned to a stable cell — which is
    the documented zero-vector contract of ivf_pairs_above."""
    import numpy as np

    n = np.linalg.norm(v, axis=1, keepdims=True)
    return v / np.where(n > 0, n, 1.0)


def _assign_cells(
    df: DataFrame,
    bc,
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Linear IVF cell-assignment pass shared by ivf_topk_pairs /
    knn_join_ivf (and the candidate-count scale probe in
    tools/stress_vectors.py): each row emits its ``n_probe`` nearest
    broadcast centroids — d·n_cells flops per row, no shuffle."""
    import numpy as np

    def fn(batches):
        import pandas as pd

        c = bc.value
        # the quantizer may hold fewer centroids than requested (tiny
        # corpus sample / n_cells > sample size) — probing more cells
        # than exist would misalign repeat vs ravel
        k_out = min(n_probe, len(c))
        for pdf in batches:
            v = _unit_rows(np.array(list(pdf[vec_col]), dtype=np.float64))
            sims = v @ c.T
            order = np.argsort(-sims, axis=1)[:, :k_out]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), k_out),
                    "cell": order.ravel().astype("int32"),
                    vec_col: [
                        pdf[vec_col].iloc[i]
                        for i in range(n)
                        for _ in range(k_out)
                    ],
                }
            )

    schema = f"{id_col} long, cell int, {vec_col} array<float>"
    return df.select(id_col, vec_col).mapInPandas(fn, schema)


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
    per row); each cell runs ONE unit-norm `A @ Aᵀ` BLAS block in
    applyInPandas and emits only its cell-local top-3k pairs — like
    ann_topk_pairs, candidates never materialize as pair rows, so the
    shuffle is O(n·n_probe) vector rows + O(k·cells) results (AQE
    splits any fat cell). The final top-k is a TakeOrderedAndProject.
    Recall is tuned by (n_cells, n_probe) exactly as in FAISS-style
    IVF-Flat.
    """
    import numpy as np

    spark = emb.sparkSession
    sample = _deterministic_sample(emb, "embedding")
    mat = np.array([r.embedding for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent = _kmeans_centroids(mat, n_cells, seed=seed)
    bc = spark.sparkContext.broadcast(cent)
    keep = max(3 * k, 64)
    assigned = _assign_cells(emb, bc, n_probe)

    def cell_topk(pdf):
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat_ = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat_ /= np.linalg.norm(mat_, axis=1, keepdims=True)
        sims = mat_ @ mat_.T
        mask = ids[:, None] < ids[None, :]
        return _pairs_topk_frame(ids, ids, sims, mask, keep)

    cand = (
        assigned.groupBy("cell")
        .applyInPandas(cell_topk, "a_id long, b_id long, cos_sim double")
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
    max_queries: int = 65536,
) -> DataFrame:
    """Query-vs-corpus k-nearest-neighbor join: for every query vector,
    its top-k corpus neighbors by cosine → (q_id, n_id, cos_sim, rank).

    The search shape of a retrieval pipeline, oriented for scale: the
    CORPUS (the side that grows to 100 TB) is never materialized — it
    streams through Arrow batches; the QUERY set (ids + unit-norm f64
    matrix) is the broadcast side, bounded by `max_queries` exactly
    like the IVF quantizer's bounded training sample (the collect is a
    `limit(max_queries + 1)` plan, never full-table). Each corpus
    batch does one BLAS block multiply and emits its batch-local top-k
    per query; a groupBy(q_id) merge reduces batch-local candidates to
    the global top-k. Shuffle volume is O(|Q|·k·batches), not O(|C|).

    When the QUERY side also outgrows a broadcast, the plan becomes
    IVF: assign both sides to probe cells (ivf_topk_pairs' quantizer),
    equi-join on cell, this kernel per cell. Deterministic: ties break
    by neighbor id.
    """
    import numpy as np

    spark = queries.sparkSession
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"knn_join query side exceeds max_queries={max_queries}; "
            "route through the IVF cell join for large query sets"
        )
    if not q_rows:
        return spark.createDataFrame(
            [], "q_id long, n_id long, cos_sim double, rank int"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def block_knn(batches):
        import pandas as pd

        qids, qmat = bc.value
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = qmat @ c_mat.T  # |Q| × batch
            kk = min(k, sims.shape[1])
            # batch-local stable top-k per query: order by (-sim, n_id)
            order = np.lexsort(
                (c_ids[None, :].repeat(len(qids), 0), -sims), axis=1
            )[:, :kk]
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(qids, kk),
                    "n_id": c_ids[order].ravel(),
                    "cos_sim": np.take_along_axis(sims, order, axis=1).ravel(),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        block_knn, "q_id long, n_id long, cos_sim double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.round("cos_sim", round_to).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def knn_join_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    seed: int = 42,
) -> DataFrame:
    """k-NN join for query sets too large to broadcast: both sides are
    assigned to IVF cells (the quantizer trains on a bounded corpus
    sample, exactly as ivf_topk_pairs), queries probe their n_probe
    nearest cells, and candidates form only inside a cell — a plain
    equi-join on cell id, no broadcast of either side.  Exact cosine
    re-ranks candidates; the global per-query top-k is one window.

    Approximate (recall tuned by n_cells/n_probe, pinned in pytest) —
    the scale analogue of exact knn_join: O(|Q|·n_probe + |C|) shuffle
    instead of an O(|Q|·|C|) cross product, AQE splitting any fat cell.
    """
    import numpy as np

    spark = corpus.sparkSession
    sample = _deterministic_sample(corpus, vec_col)
    if not sample:
        return spark.createDataFrame(
            [], "q_id long, n_id long, cos_sim double, rank int"
        )
    mat = np.array([r[0] for r in sample], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cent = _kmeans_centroids(mat, n_cells, seed=seed)
    bc = spark.sparkContext.broadcast(cent)
    q_assigned = _assign_cells(queries, bc, n_probe, id_col, vec_col)
    c_assigned = _assign_cells(corpus, bc, 1, id_col, vec_col)

    def cell_knn(qpdf, cpdf):
        import pandas as pd

        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({"q_id": [], "n_id": [], "cos_sim": []}).astype(
                {"q_id": "int64", "n_id": "int64", "cos_sim": "float64"}
            )
        q_ids = qpdf[id_col].to_numpy(dtype=np.int64)
        q_mat = np.array(list(qpdf[vec_col]), dtype=np.float64)
        q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
        c_ids = cpdf[id_col].to_numpy(dtype=np.int64)
        c_mat = np.array(list(cpdf[vec_col]), dtype=np.float64)
        c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
        sims = q_mat @ c_mat.T
        kk = min(k, sims.shape[1])
        order = np.lexsort(
            (c_ids[None, :].repeat(len(q_ids), 0), -sims), axis=1
        )[:, :kk]
        return pd.DataFrame(
            {
                "q_id": np.repeat(q_ids, kk),
                "n_id": c_ids[order].ravel(),
                "cos_sim": np.take_along_axis(sims, order, axis=1).ravel(),
            }
        )

    # per-cell BLAS via cogroup — queries and corpus rows meet inside
    # their shared cell only; candidate pairs never materialize as rows
    cand = (
        q_assigned.groupby("cell")
        .cogroup(c_assigned.groupby("cell"))
        .applyInPandas(cell_knn, "q_id long, n_id long, cos_sim double")
        .dropDuplicates(["q_id", "n_id"])  # same pair via >1 probed cell
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.round("cos_sim", round_to).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def semdedup_keep(
    emb: DataFrame,
    threshold: float,
    mode: str = "exact",
    n_rows: int | None = None,
    bands: int = 8,
) -> DataFrame:
    """SemDeDup — semantic deduplication over an embedding column
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): vectors whose cosine
    clears ``threshold`` are semantic duplicates; each duplicate
    GROUP (transitive closure of the pair graph) keeps exactly one
    representative and drops the rest.

    Returns one row per input vector: ``(vec_id, component, kept)``
    where ``component`` is the min vec_id reachable through ≥-threshold
    pairs (singletons map to themselves) and ``kept`` marks the
    deterministic representative (the min id — stable across runs and
    partitionings, so the kept corpus is reproducible).

    ``mode='exact'`` generates pairs with the Θ(n²·d) block-matmul
    kernel (:func:`cosine_pairs_above`) — the oracle-checkable
    reference.  ``mode='lsh'`` swaps in the banded hyperplane blocking
    (:func:`ann_pairs_above`) — the sub-quadratic 100 TB path; its
    precision is exact by construction (in-bucket verify is the true
    cosine) so dropped-but-should-keep errors come only from LSH
    recall, pinned vs the exact mode in tests/test_extensions.py.

    ``mode='kmeans'`` is the paper's literal recipe — cluster with
    k-means first, compare within cells only (:func:`ivf_pairs_above`,
    the seeded IVF quantizer); ``mode='lsh'`` trades the trained
    quantizer for hyperplane buckets (nothing to train or freeze
    beyond the plane seed).  Both share the containment guarantee
    below.  Cluster contraction uses
    :func:`operators.graph.connected_components_star` with
    ``strict=True`` (r12 advisor fix): at a low threshold a semantic
    chain a≈b≈c≈… can have diameter far beyond plain label
    propagation's default 20 rounds, and an unconverged keep-set is
    silently wrong in a pipeline that never surfaces warnings — star
    contraction converges in O(log² n) rounds regardless of diameter,
    and ``strict`` turns residual non-convergence into
    :class:`~operators.graph.ConvergenceError` instead of a warning.

    At 100 TB: pair generation is the dominant cost and is
    output-sized under LSH blocking; the CC loop runs over the
    PAIR graph (near-dup-sized, ≪ corpus-sized); the final left join
    back to the corpus is a broadcast when the dup set is small, a
    key-partitioned shuffle otherwise — never all-pairs.
    """
    from .graph import connected_components_star

    if mode == "exact":
        pairs = cosine_pairs_above(emb, threshold=threshold, n_rows=n_rows)
    elif mode == "lsh":
        pairs = ann_pairs_above(
            emb, threshold=threshold, bands=bands, n_rows=n_rows
        )
    elif mode == "kmeans":
        # the literal SemDeDup recipe: k-means cells as the blocking
        # stage (ivf_pairs_above) — same containment guarantee as
        # 'lsh' (missing cross-cell pairs only SPLIT components)
        pairs = ivf_pairs_above(emb, threshold=threshold)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown semdedup mode: {mode}")

    # star contraction, strict: O(log² n) rounds at any chain diameter,
    # and non-convergence raises rather than warns (keep-set safety)
    comp = connected_components_star(pairs, strict=True)
    ids = emb.select(F.col("vec_id"))
    out = ids.join(comp, ids["vec_id"] == comp["node"], "left").select(
        "vec_id",
        F.coalesce("component", "vec_id").alias("component"),
    )
    return out.select(
        "vec_id",
        "component",
        (F.col("vec_id") == F.col("component")).alias("kept"),
    )


def ivf_pairs_above(
    emb: DataFrame,
    threshold: float,
    n_cells: int = 16,
    n_probe: int = 2,
    round_to: int = 6,
    seed: int = 42,
) -> DataFrame:
    """All vector pairs with cosine ≥ ``threshold`` that share at
    least one probed IVF cell — the k-means-cell analogue of
    :func:`ann_pairs_above` (hyperplane buckets), and the literal
    SemDeDup recipe's blocking stage (cluster with k-means, compare
    within cells).

    Same seeded sample-trained quantizer + linear assignment pass as
    :func:`ivf_topk_pairs`, but the per-cell kernel emits EVERY
    cell-local pair meeting the threshold instead of a local top-k.
    The verify is the exact cosine inside the cell kernel, so
    precision is 1.0 by construction; recall is the probability that
    a ≥-threshold pair shares a probed cell (rising with ``n_probe``,
    and → 1 as similarity → 1: near-identical vectors land in the
    same nearest cell), pinned vs the exact kernel in
    tests/test_extensions.py.

    At 100 TB: assignment is a linear mapInPandas pass; per-cell work
    is one unit-norm BLAS block over the cell's members (AQE splits
    fat cells at the groupBy); output is near-dup-pair-sized.  Like
    every blocked index, the quantizer must stay FROZEN (seed +
    sample) for reproducible candidate sets.

    Zero-vector contract (r12 advisor fix): a zero-norm embedding is
    normalized to the zero row (see :func:`_unit_rows`), so its
    cosine against everything is exactly 0 — deterministically below
    any positive ``threshold`` (it appears in NO pair, matching the
    exact kernel's behavior) and assigned to a stable cell rather
    than wherever NaN ordering lands."""
    import numpy as np

    spark = emb.sparkSession
    sample = _deterministic_sample(emb, "embedding")
    mat = _unit_rows(np.array([r.embedding for r in sample], dtype=np.float64))
    cent = _kmeans_centroids(mat, n_cells, seed=seed)
    bc = spark.sparkContext.broadcast(cent)
    assigned = _assign_cells(emb, bc, n_probe)

    def cell_pairs(pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat_ = _unit_rows(np.array(list(pdf["embedding"]), dtype=np.float64))
        sims = mat_ @ mat_.T
        keep = (ids[:, None] < ids[None, :]) & (sims >= threshold)
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {"a_id": ids[ai], "b_id": ids[bi], "cos_sim": sims[ai, bi]}
        )

    cand = (
        assigned.groupBy("cell")
        .applyInPandas(cell_pairs, "a_id long, b_id long, cos_sim double")
        .dropDuplicates(["a_id", "b_id"])  # pairs sharing >1 probed cell
    )
    return cand.select(
        "a_id", "b_id", F.round("cos_sim", round_to).alias("cos_sim")
    )
