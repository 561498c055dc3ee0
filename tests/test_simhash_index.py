"""Streaming SimHash near-dup index (round 10): the third text index
must be EXACTLY equivalent to the batch pigeonhole pipeline — same
fingerprints, same chunk layout (the shared simhash_chunks helper),
same bit_count verify — on the drained corpus, with each pair claimed
by exactly one batch.  Blocking is lossless at the frozen radius, so
the read-only lookup is pinned EQUAL to brute force (not ≥-recall like
the statistical MinHash twin)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_streaming_join_example_spark import load_table
from spark_streaming_join_example_spark.operators.dedup import (
    distinct_tokens,
    simhash63,
    simhash_near_duplicates,
)
from spark_streaming_join_example_spark.streaming.simhash_index import (
    lookup_near_duplicates,
    maintain_simhash_index,
    simhash_pairs,
)


def _replay_stream(spark, docs, replay_dir, n_chunks):
    docs.repartition(n_chunks).write.mode("overwrite").parquet(
        str(replay_dir)
    )
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay_dir))
    )


def test_streaming_simhash_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 4)
    idx = str(tmp_path / "sh_idx")
    maintain_simhash_index(
        stream, idx, str(tmp_path / "ckpt"), max_hamming=3
    ).awaitTermination()

    streamed = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    }
    batch = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert batch, "fixture lost its planted near-dup structure"
    assert streamed == batch

    # each pair claimed by exactly ONE batch
    raw = spark.read.parquet(f"{idx}/pairs").groupBy("a_id", "b_id").count()
    assert raw.filter(F.col("count") > 1).count() == 0

    # really incremental, and with cross-batch discoveries
    fps = spark.read.parquet(f"{idx}/fps")
    assert fps.select("batch_id").distinct().count() >= 3
    first = {
        r.doc_id
        for r in fps.filter(F.col("batch_id") == 0).select("doc_id").collect()
    }
    assert [
        p for p in streamed if (p[0] in first) != (p[1] in first)
    ], "replay produced no cross-batch pairs; equivalence vacuous"


def test_streaming_simhash_restart_is_idempotent(spark, sf_dir, tmp_path):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    replay = tmp_path / "replay"
    docs.repartition(2).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "sh_idx")

    def start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
        )
        return maintain_simhash_index(stream, idx, str(tmp_path / "ckpt"))

    start().awaitTermination()
    before = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    )
    n_before = (
        spark.read.parquet(f"{idx}/fps").select("batch_id").distinct().count()
    )
    start().awaitTermination()  # same checkpoint: nothing new to do
    after = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    )
    n_after = (
        spark.read.parquet(f"{idx}/fps").select("batch_id").distinct().count()
    )
    assert after == before
    assert n_after == n_before


def test_simhash_scheme_mismatch_refuses_to_run(spark, sf_dir, tmp_path):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
    )
    replay = tmp_path / "replay"
    docs.write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "sh_idx")

    def start(ckpt: str, **kw):
        stream = spark.readStream.schema(docs.schema).parquet(str(replay))
        return maintain_simhash_index(
            stream, idx, str(tmp_path / ckpt), **kw
        )

    start("ckpt1").awaitTermination()
    m = spark.read.json(f"{idx}/_scheme").collect()[0]
    assert (m.kind, m.n_bits, m.max_hamming) == ("simhash", 63, 3)

    q = start("ckpt2", max_hamming=4)
    with pytest.raises(Exception, match="versioned rebuild"):
        q.awaitTermination()

    start("ckpt3").awaitTermination()  # same scheme: verifies and runs


def test_simhash_lookup_equals_brute_force(spark, sf_dir, tmp_path):
    """Pigeonhole blocking is lossless at the frozen radius, so the
    read-only lookup must find EXACTLY the brute-force cross pairs —
    and the index must be unchanged by the lookup."""
    all_docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = all_docs.filter(F.col("doc_id") < 400)
    queries = all_docs.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("q_id"), "text"
    )
    stream = _replay_stream(spark, corpus, tmp_path / "replay", 2)
    idx = str(tmp_path / "sh_idx")
    maintain_simhash_index(
        stream, idx, str(tmp_path / "ckpt"), max_hamming=3
    ).awaitTermination()
    pairs_before = sorted(
        (r.a_id, r.b_id) for r in simhash_pairs(spark, idx).collect()
    )

    got = {
        (r.q_id, r.doc_id, r.hamming)
        for r in lookup_near_duplicates(spark, idx, queries).collect()
    }
    fp = all_docs.select(
        "doc_id", simhash63(distinct_tokens("text")).alias("fp")
    )
    a = fp.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("q_id"), F.col("fp").alias("a_fp")
    )
    b = fp.filter(F.col("doc_id") < 400).select(
        F.col("doc_id").alias("d_id"), F.col("fp").alias("b_fp")
    )
    brute = {
        (r.q_id, r.d_id, r.hamming)
        for r in a.crossJoin(b)
        .withColumn(
            "hamming",
            F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert brute, "fixture has no cross-boundary planted pairs"
    assert got == brute  # lossless blocking + exact verify

    # tighter radius is allowed and is exactly the brute subset
    tighter = {
        (r.q_id, r.doc_id, r.hamming)
        for r in lookup_near_duplicates(
            spark, idx, queries, max_hamming=1
        ).collect()
    }
    assert tighter == {p for p in brute if p[2] <= 1}

    # looser-than-frozen refuses (pigeonhole layout sized for frozen r)
    with pytest.raises(ValueError, match="frozen radius"):
        lookup_near_duplicates(spark, idx, queries, max_hamming=5)

    assert (
        sorted((r.a_id, r.b_id) for r in simhash_pairs(spark, idx).collect())
        == pairs_before
    )


def test_simhash_maintain_clusters_matches_batch_cc(spark, sf_dir, tmp_path):
    """maintain_clusters=True on the SimHash index folds pair deltas
    into the shared incremental cluster snapshots — drained clusters
    must equal batch connected components over the batch pairs."""
    from spark_streaming_join_example_spark.operators.graph import (
        connected_components,
    )
    from spark_streaming_join_example_spark.streaming.cluster_index import (
        latest_clusters,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 3)
    idx = str(tmp_path / "sh_idx")
    maintain_simhash_index(
        stream, idx, str(tmp_path / "ckpt"), maintain_clusters=True
    ).awaitTermination()

    def cc_set(df):
        from collections import defaultdict

        groups = defaultdict(set)
        for r in df.collect():
            groups[r.component].add(r.node)
        return {frozenset(v) for v in groups.values()}

    batch_pairs = simhash_near_duplicates(docs, max_hamming=3).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    batch_cc = connected_components(batch_pairs, src="src", dst="dst")
    assert cc_set(latest_clusters(spark, idx)) == cc_set(batch_cc)


def test_compact_pairs_preserves_simhash_layout(spark, sf_dir, tmp_path):
    """The shared OPTIMIZE pass keys on (a_id, b_id) and preserves the
    index's own score column — hamming here, jac for the twins."""
    from spark_streaming_join_example_spark.streaming.neardup_index import (
        compact_pairs,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    stream = _replay_stream(spark, docs, tmp_path / "replay", 2)
    idx = str(tmp_path / "sh_idx")
    maintain_simhash_index(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()

    dest = str(tmp_path / "pairs_compacted")
    n = compact_pairs(spark, idx, dest)
    live = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    )
    compacted = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in spark.read.parquet(dest).collect()
    )
    assert compacted == live
    assert n == len(live)


def test_simhash_chunk_blocking_is_lossless_for_random_flips(spark):
    """Pigeonhole coverage of the SHARED chunk helper, driven through
    the distributed expression itself: 2,000 seeded fingerprint pairs
    with 0–3 random bit flips must EVERY one share at least one
    (chunk_idx, chunk_value) bucket at r=3 — the invariant both the
    batch pairing and the streaming index's candidate join stand on.
    A control with 4 flips concentrated past every chunk boundary is
    also checked to document what the guarantee does NOT promise."""
    import random

    from spark_streaming_join_example_spark.operators.dedup import (
        simhash_chunks,
    )

    rng = random.Random(20260815)
    rows = []
    for i in range(2000):
        a = rng.getrandbits(63)
        ham = rng.randint(0, 3)
        b = a
        for bit in rng.sample(range(63), ham):
            b ^= 1 << bit
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "pair_id long, fa long, fb long")
    chunked = df.select(
        "pair_id",
        F.explode(
            F.arrays_zip(
                simhash_chunks(F.col("fa"), 63, 3).alias("ca"),
                simhash_chunks(F.col("fb"), 63, 3).alias("cb"),
            )
        ).alias("z"),
    ).select(
        "pair_id",
        F.col("z.ca.cv").alias("cva"),
        F.col("z.cb.cv").alias("cvb"),
    )
    sharing = (
        chunked.filter(F.col("cva") == F.col("cvb"))
        .select("pair_id")
        .distinct()
        .count()
    )
    assert sharing == 2000  # every hamming<=3 pair shares a chunk

    # negative control: 4 flips, one per chunk (layout 16/16/16/15 →
    # offsets 0/16/32/48), never share a chunk — the pigeonhole bound
    # is tight, not conservative
    offsets = [0, 16, 32, 48]
    a = rng.getrandbits(63)
    b = a
    for off in offsets:
        b ^= 1 << off
    ctl = spark.createDataFrame([(0, a, b)], "pair_id long, fa long, fb long")
    ctl_share = (
        ctl.select(
            F.explode(
                F.arrays_zip(
                    simhash_chunks(F.col("fa"), 63, 3).alias("ca"),
                    simhash_chunks(F.col("fb"), 63, 3).alias("cb"),
                )
            ).alias("z")
        )
        .filter(F.col("z.ca.cv") == F.col("z.cb.cv"))
        .count()
    )
    assert ctl_share == 0


def test_simhash_shingle_mode_equals_batch_and_prunes(spark, sf_dir, tmp_path):
    """shingle=3 — the scale-safe unit (the same fix that rescued
    MinHash/prefix on the small-vocabulary fixture): streamed must
    still equal batch EXACTLY, the lookup must still equal brute
    force, the scheme manifest must carry the unit width, and the
    shingle fingerprints must be dramatically sparser than token-unit
    ones (the measured 14 % → 0.01 % candidate collapse in SCALE.md)."""
    from spark_streaming_join_example_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 3)
    idx = str(tmp_path / "sh_idx")
    maintain_simhash_index(
        stream, idx, str(tmp_path / "ckpt"), max_hamming=3, shingle=3
    ).awaitTermination()

    streamed = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    }
    batch = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_near_duplicates(
            docs, max_hamming=3, shingle=3
        ).collect()
    }
    assert batch, "fixture lost its shingle-mode near-dup structure"
    assert streamed == batch
    # far sparser than the token-unit relation on the same corpus
    token_pairs = simhash_near_duplicates(docs, max_hamming=3).count()
    assert len(batch) * 10 < token_pairs

    m = spark.read.json(f"{idx}/_scheme").collect()[0]
    assert m.shingle == 3

    # read-only lookup at the frozen shingle scheme == brute force
    corpus_ids = {r.doc_id for r in docs.select("doc_id").collect()
                  if r.doc_id < 400}
    queries = docs.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("q_id"), "text"
    )
    # index contains ALL docs here; restrict brute force accordingly
    got = {
        (r.q_id, r.doc_id, r.hamming)
        for r in lookup_near_duplicates(spark, idx, queries).collect()
        if r.doc_id in corpus_ids
    }
    fp = docs.select(
        "doc_id", simhash63(shingles("text", n=3)).alias("fp")
    )
    a = fp.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("q_id"), F.col("fp").alias("a_fp")
    )
    b = fp.filter(F.col("doc_id") < 400).select(
        F.col("doc_id").alias("d_id"), F.col("fp").alias("b_fp")
    )
    brute = {
        (r.q_id, r.d_id, r.hamming)
        for r in a.crossJoin(b)
        .withColumn(
            "hamming",
            F.bit_count(F.col("a_fp").bitwiseXOR(F.col("b_fp"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert brute, "no cross-boundary shingle-mode pairs; test vacuous"
    assert got == brute

    # restarting with a DIFFERENT unit width refuses (frozen scheme)
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "replay"))
    )
    q = maintain_simhash_index(
        stream2, idx, str(tmp_path / "ckpt2"), max_hamming=3, shingle=1
    )
    with pytest.raises(Exception, match="versioned rebuild"):
        q.awaitTermination()


def test_simhash_index_mid_batch_crash_recovery(spark, sf_dir, tmp_path):
    """Crash-window chaos (the same scenario pinned for both Jaccard
    indexes): a batch whose fps/pairs output landed but whose
    checkpoint commit did not is re-executed on restart — the
    per-batch_id overwrite must converge to the exact same pair set,
    with every pair still claimed exactly once."""
    import glob
    import os as _os

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    replay = tmp_path / "replay"
    docs.repartition(3).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "sh_idx")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
        )
        return maintain_simhash_index(stream, idx, ckpt)

    start().awaitTermination()
    before = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    )
    assert before, "fixture produced no pairs; chaos test vacuous"

    commits = sorted(
        glob.glob(_os.path.join(ckpt, "commits", "[0-9]*")),
        key=lambda p: int(_os.path.basename(p)),
    )
    assert len(commits) >= 2
    _os.remove(commits[-1])
    crc = _os.path.join(
        _os.path.dirname(commits[-1]),
        f".{_os.path.basename(commits[-1])}.crc",
    )
    if _os.path.exists(crc):
        _os.remove(crc)
    start().awaitTermination()
    after = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(spark, idx).collect()
    )
    assert after == before
    raw = spark.read.parquet(f"{idx}/pairs").groupBy("a_id", "b_id").count()
    assert raw.filter(F.col("count") > 1).count() == 0
