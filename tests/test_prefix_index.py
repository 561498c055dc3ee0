"""Streaming EXACT prefix-filter dedup index (r9): the lossless twin
of the MinHash signature index.  The streamed pair set must equal the
batch prefix join under BOTH canonical orders AND the brute-force
all-pairs answer on the drained corpus — completeness is the whole
point of this index — with each pair claimed by exactly one batch."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from spark_streaming_join_example_spark import load_table
from spark_streaming_join_example_spark.operators.dedup import (
    jaccard,
    prefix_filter_jaccard_pairs,
    shingles,
)
from spark_streaming_join_example_spark.streaming.prefix_index import (
    exact_pairs,
    maintain_prefix_index,
)

_SF_DIR = "/root/testdata/sf0.01"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(_SF_DIR),
    reason=f"equivalence fixture {_SF_DIR} not generated on this machine",
)


def test_streaming_prefix_index_equals_batch_and_brute_force(spark, tmp_path):
    docs = load_table(spark, _SF_DIR, "documents").select("doc_id", "text")

    replay = tmp_path / "replay"
    docs.repartition(4).write.mode("overwrite").parquet(str(replay))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay))
    )
    idx = str(tmp_path / "prefix_idx")
    q = maintain_prefix_index(stream, idx, str(tmp_path / "ckpt"), threshold=0.9)
    q.awaitTermination()
    streamed = {
        (r.a_id, r.b_id, r.jac) for r in exact_pairs(spark, idx).collect()
    }

    # batch prefix join, both canonical orders — losslessness means the
    # order must not change the OUTPUT, only the candidate count
    batch_hash = {
        (r.a_id, r.b_id, r.jac)
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=0.9, shingle=3, order="hash"
        ).collect()
    }
    batch_df = {
        (r.a_id, r.b_id, r.jac)
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=0.9, shingle=3, order="df"
        ).collect()
    }

    # brute force over the same shingle sets
    t = docs.select("doc_id", shingles("text", n=3).alias("toks"))
    a = t.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    b = t.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    jac = jaccard(F.col("a_toks"), F.col("b_toks"))
    brute = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(jac >= 0.9)
        .select("a_id", "b_id")
        .collect()
    }
    assert brute, "fixture lost its planted near-dup pairs"

    assert streamed == batch_hash == batch_df
    assert {(p[0], p[1]) for p in streamed} == brute

    # each pair claimed by exactly ONE batch, and the index really was
    # built incrementally with cross-batch discoveries
    raw = spark.read.parquet(f"{idx}/pairs").groupBy("a_id", "b_id").count()
    assert raw.filter(F.col("count") > 1).count() == 0
    n_batches = (
        spark.read.parquet(f"{idx}/prefix").select("batch_id").distinct().count()
    )
    assert n_batches >= 3
    first_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/prefix")
        .filter(F.col("batch_id") == 0)
        .select("doc_id")
        .distinct()
        .collect()
    }
    cross = [p for p in streamed if (p[0] in first_ids) != (p[1] in first_ids)]
    assert cross, "replay produced no cross-batch pairs; equivalence vacuous"


def test_prefix_index_restart_and_scheme_freeze(spark, tmp_path):
    docs = (
        load_table(spark, _SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    replay = tmp_path / "replay"
    docs.repartition(2).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "prefix_idx")

    def start(ckpt: str, **kw):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
        )
        return maintain_prefix_index(
            stream, idx, str(tmp_path / ckpt), threshold=0.9, **kw
        )

    start("ckpt").awaitTermination()
    before = sorted(
        (r.a_id, r.b_id, r.jac) for r in exact_pairs(spark, idx).collect()
    )
    manifest = spark.read.json(f"{idx}/_scheme").collect()[0]
    assert (manifest.kind, manifest.order, manifest.shingle) == (
        "prefix", "hash", 3,
    )

    # same checkpoint: drained, nothing re-processed
    start("ckpt").awaitTermination()
    after = sorted(
        (r.a_id, r.b_id, r.jac) for r in exact_pairs(spark, idx).collect()
    )
    assert after == before

    # different scheme against the same out_dir → refuse
    q = start("ckpt2", shingle=2)
    with pytest.raises(Exception, match="versioned rebuild"):
        q.awaitTermination()


def test_prefix_index_mid_batch_crash_recovery(spark, tmp_path):
    """Crash-window chaos: a batch whose OUTPUT files landed but whose
    checkpoint commit did not (foreachBatch is at-least-once) is
    re-executed on restart — the per-batch_id overwrite must converge
    to the exact same pair set, not double-claim pairs."""
    import glob
    import os as _os

    docs = (
        load_table(spark, _SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    replay = tmp_path / "replay"
    docs.repartition(3).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "prefix_idx")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
        )
        return maintain_prefix_index(stream, idx, ckpt, threshold=0.9)

    start().awaitTermination()
    before = sorted(
        (r.a_id, r.b_id, r.jac) for r in exact_pairs(spark, idx).collect()
    )

    # simulate the crash window: the last batch's sink output exists
    # but its checkpoint commit is gone → the engine re-runs the batch
    commits = sorted(
        glob.glob(_os.path.join(ckpt, "commits", "[0-9]*")),
        key=lambda p: int(_os.path.basename(p)),
    )
    assert len(commits) >= 2
    _os.remove(commits[-1])
    # the local-FS checkpoint keeps a .N.crc sidecar; the retried
    # commit's rename fails if it survives the "crash"
    crc = _os.path.join(
        _os.path.dirname(commits[-1]), f".{_os.path.basename(commits[-1])}.crc"
    )
    if _os.path.exists(crc):
        _os.remove(crc)
    start().awaitTermination()
    after = sorted(
        (r.a_id, r.b_id, r.jac) for r in exact_pairs(spark, idx).collect()
    )
    assert after == before
    # the retried batch overwrote its own subtree: still one claim per pair
    raw = spark.read.parquet(f"{idx}/pairs").groupBy("a_id", "b_id").count()
    assert raw.filter(F.col("count") > 1).count() == 0


def test_lookup_near_duplicates_without_ingest(spark, tmp_path):
    """Read-only lookup: query documents checked against the index
    find EXACTLY the brute-force cross pairs (lossless — this is the
    dedup-check-before-ingest path), the index is unchanged, and a
    threshold below the frozen one refuses."""
    from spark_streaming_join_example_spark.streaming.prefix_index import (
        lookup_near_duplicates,
    )

    all_docs = load_table(spark, _SF_DIR, "documents").select("doc_id", "text")
    corpus = all_docs.filter(F.col("doc_id") < 400)
    queries = all_docs.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("q_id"), "text"
    )

    replay = tmp_path / "replay"
    corpus.repartition(2).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "prefix_idx")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay))
    )
    maintain_prefix_index(
        stream, idx, str(tmp_path / "ckpt"), threshold=0.9
    ).awaitTermination()
    pairs_before = sorted(
        (r.a_id, r.b_id) for r in exact_pairs(spark, idx).collect()
    )

    got = {
        (r.q_id, r.doc_id, r.jac)
        for r in lookup_near_duplicates(spark, idx, queries).collect()
    }

    # brute force: every (query, corpus) shingle-Jaccard >= 0.9 pair
    t = all_docs.select("doc_id", shingles("text", n=3).alias("toks"))
    a = t.filter(F.col("doc_id") >= 400).select(
        F.col("doc_id").alias("q_id"), F.col("toks").alias("a_toks")
    )
    b = t.filter(F.col("doc_id") < 400).select(
        F.col("doc_id").alias("d_id"), F.col("toks").alias("b_toks")
    )
    jac = jaccard(F.col("a_toks"), F.col("b_toks"))
    brute = {
        (r.q_id, r.d_id)
        for r in a.crossJoin(b).filter(jac >= 0.9).select("q_id", "d_id").collect()
    }
    assert brute, "fixture has no cross-boundary planted pairs"
    assert {(q, d) for q, d, _ in got} == brute

    # read-only: the index's pair set is untouched
    pairs_after = sorted(
        (r.a_id, r.b_id) for r in exact_pairs(spark, idx).collect()
    )
    assert pairs_after == pairs_before

    # stricter threshold allowed (subset); looser refused
    strict = lookup_near_duplicates(spark, idx, queries, threshold=0.95)
    assert {(r.q_id, r.doc_id) for r in strict.collect()} <= brute
    with pytest.raises(ValueError, match="below the index's frozen"):
        lookup_near_duplicates(spark, idx, queries, threshold=0.5)


def test_compact_pairs_preserves_output(spark, tmp_path):
    """The pairs OPTIMIZE pass: the consolidated dir returns exactly
    the live readers' pair set, from far fewer files."""
    import glob
    import os as _os

    from spark_streaming_join_example_spark.streaming.neardup_index import (
        compact_pairs,
    )

    docs = (
        load_table(spark, _SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    replay = tmp_path / "replay"
    docs.repartition(3).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "prefix_idx")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay))
    )
    maintain_prefix_index(
        stream, idx, str(tmp_path / "ckpt"), threshold=0.9
    ).awaitTermination()
    live = {(r.a_id, r.b_id, r.jac) for r in exact_pairs(spark, idx).collect()}
    assert live

    dest = str(tmp_path / "pairs_compacted")
    n = compact_pairs(spark, idx, dest)
    compacted = {
        (r.a_id, r.b_id, r.jac) for r in spark.read.parquet(dest).collect()
    }
    assert compacted == live and n == len(live)
    # actually consolidated: fewer data files than live batch dirs
    live_files = glob.glob(_os.path.join(idx, "pairs", "*", "*.parquet"))
    dest_files = glob.glob(_os.path.join(dest, "*.parquet"))
    assert len(dest_files) < len(live_files)


def test_lookup_honors_custom_id_col_from_manifest(spark, tmp_path):
    """r10 advisor fix: lookup_near_duplicates used to hardcode the
    index-side id column as 'doc_id'; an index maintained with a
    custom id_col failed lookup with column-not-found even though the
    frozen manifest records exactly the needed name.  Pin: a
    custom-id index answers lookups, and the answer matches brute
    force."""
    from spark_streaming_join_example_spark.streaming.prefix_index import (
        lookup_near_duplicates,
    )

    all_docs = (
        load_table(spark, _SF_DIR, "documents")
        .select(F.col("doc_id").alias("news_id"), "text")
        .filter(F.col("news_id") < 200)
    )
    corpus = all_docs.filter(F.col("news_id") < 150)
    queries = all_docs.filter(F.col("news_id") >= 150).select(
        F.col("news_id").alias("q_id"), "text"
    )

    replay = tmp_path / "replay"
    corpus.write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "prefix_idx_custom")
    stream = spark.readStream.schema(corpus.schema).parquet(str(replay))
    maintain_prefix_index(
        stream, idx, str(tmp_path / "ckpt"), threshold=0.9, id_col="news_id"
    ).awaitTermination()

    got = {
        (r.q_id, r.doc_id)
        for r in lookup_near_duplicates(spark, idx, queries).collect()
    }

    t = all_docs.select("news_id", shingles("text", n=3).alias("toks"))
    a = t.filter(F.col("news_id") >= 150).select(
        F.col("news_id").alias("q_id"), F.col("toks").alias("a_toks")
    )
    b = t.filter(F.col("news_id") < 150).select(
        F.col("news_id").alias("d_id"), F.col("toks").alias("b_toks")
    )
    jac = jaccard(F.col("a_toks"), F.col("b_toks"))
    brute = {
        (r.q_id, r.d_id)
        for r in a.crossJoin(b)
        .filter(jac >= 0.9)
        .select("q_id", "d_id")
        .collect()
    }
    assert got == brute
