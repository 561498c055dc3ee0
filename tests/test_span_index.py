"""Streaming repeated-span index (round 11, second session): the
substring member of the index family must be EXACTLY equivalent to
the batch span-dedup queries (plans/round15.py) on the drained
corpus — same gram relation, same duplicated-gram set, same
island-merged coverage — with every duplicated gram claimed by
exactly one batch, and the read-only lookup screening incoming
documents against corpus-present grams without writing anything."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_streaming_join_example_spark import load_table
from spark_streaming_join_example_spark.operators.text import (
    gram_positions,
    span_coverage_frame,
)
from spark_streaming_join_example_spark.streaming.span_index import (
    duplicated_grams,
    grams_store,
    lookup_span_coverage,
    maintain_span_index,
    span_coverage,
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


def _batch_dup(g):
    return (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )


def test_streamed_coverage_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 4)
    idx = str(tmp_path / "span_idx")
    maintain_span_index(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()

    # 1. posting store == the batch gram relation
    g_batch = gram_positions(docs)
    streamed_g = sorted(
        (r.doc_id, r.pos, r.gram)
        for r in grams_store(spark, idx).collect()
    )
    batch_g = sorted(
        (r.doc_id, r.pos, r.gram) for r in g_batch.collect()
    )
    assert streamed_g == batch_g

    # 2. accumulated duplicated-gram set == the batch dup set
    streamed_dup = {r.gram for r in duplicated_grams(spark, idx).collect()}
    batch_dup = {r.gram for r in _batch_dup(g_batch).collect()}
    assert streamed_dup == batch_dup

    # 3. coverage read == the batch coverage frame, value for value
    got = {
        r.doc_id: (r.n_toks, r.covered_toks, r.dup_coverage, r.longest_span)
        for r in span_coverage(spark, idx).collect()
    }
    want = {
        r.doc_id: (r.n_toks, r.covered_toks, r.dup_coverage, r.longest_span)
        for r in span_coverage_frame(g_batch, _batch_dup(g_batch)).collect()
    }
    assert got == want
    assert want, "fixture produced no duplicated spans; test vacuous"


def test_each_dup_gram_claimed_once(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 5)
    idx = str(tmp_path / "span_idx")
    maintain_span_index(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()
    raw = spark.read.parquet(f"{idx}/dup_grams")
    multi = (
        raw.groupBy("gram")
        .agg(F.countDistinct("batch_id").alias("nb"))
        .filter(F.col("nb") > 1)
    )
    assert multi.count() == 0
    # and the claim-time doc frequency is honest: every claimed gram
    # really has >= 2 distinct docs in the final store
    check = (
        raw.select("gram", "n_docs")
        .join(
            grams_store(spark, idx)
            .groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("nd_final")),
            "gram",
        )
        .filter(
            (F.col("n_docs") < 2) | (F.col("nd_final") < F.col("n_docs"))
        )
    )
    assert check.count() == 0


def test_restart_is_idempotent(spark, sf_dir, tmp_path):
    """Full re-delivery: a second run over the same files with a FRESH
    checkpoint re-executes every batch; per-batch_id overwrites must
    converge to the identical index."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    replay = tmp_path / "replay"
    docs.repartition(3).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "span_idx")

    def run(ckpt):
        # SAME files both runs (a redelivery replays the same batch
        # contents); only the checkpoint is fresh
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
        )
        return maintain_span_index(stream, idx, str(tmp_path / ckpt))

    run("ckpt1").awaitTermination()
    before = sorted(
        (r.gram, r.n_docs) for r in duplicated_grams(spark, idx).collect()
    )
    cov_before = sorted(
        tuple(r) for r in span_coverage(spark, idx).collect()
    )
    run("ckpt2").awaitTermination()
    after = sorted(
        (r.gram, r.n_docs) for r in duplicated_grams(spark, idx).collect()
    )
    cov_after = sorted(tuple(r) for r in span_coverage(spark, idx).collect())
    assert after == before
    assert cov_after == cov_before


def test_mid_batch_crash_recovery(spark, sf_dir, tmp_path):
    """Crash-window chaos (the scenario pinned for every sibling): a
    batch whose grams/dup_grams landed but whose checkpoint commit did
    not is re-executed on restart — the per-batch_id overwrite must
    converge to the same state, claim-once intact."""
    import glob
    import os as _os

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 300)
    )
    replay = tmp_path / "replay"
    docs.repartition(3).write.mode("overwrite").parquet(str(replay))
    idx = str(tmp_path / "span_idx")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
        )
        return maintain_span_index(stream, idx, ckpt)

    start().awaitTermination()
    before = sorted(
        (r.gram, r.n_docs) for r in duplicated_grams(spark, idx).collect()
    )
    assert before, "fixture produced no duplicated grams; chaos vacuous"

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
        (r.gram, r.n_docs) for r in duplicated_grams(spark, idx).collect()
    )
    assert after == before
    raw = spark.read.parquet(f"{idx}/dup_grams")
    assert (
        raw.groupBy("gram")
        .agg(F.countDistinct("batch_id").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
        == 0
    )


def test_scheme_mismatch_refuses_to_run(spark, sf_dir, tmp_path):
    from spark_streaming_join_example_spark.streaming.neardup_index import (
        SchemeMismatch,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
    )
    idx = str(tmp_path / "span_idx")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 2)
    maintain_span_index(
        stream, idx, str(tmp_path / "ckpt1"), span=5
    ).awaitTermination()

    stream2 = _replay_stream(spark, docs, tmp_path / "replay2", 2)
    q = maintain_span_index(stream2, idx, str(tmp_path / "ckpt2"), span=4)
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc:
        q.awaitTermination()
    assert "scheme" in str(exc.value).lower() or "SchemeMismatch" in str(
        exc.value
    )
    # the frozen-scheme read APIs also refuse a wrong index kind
    with pytest.raises(SchemeMismatch):
        from spark_streaming_join_example_spark.streaming.neardup_index import (
            read_scheme,
        )

        read_scheme(spark, idx, "minhash")


def test_lookup_screens_incoming_shard(spark, sf_dir, tmp_path):
    """Read-only admission screen: coverage of an incoming shard
    against CORPUS-PRESENT grams equals the same computation done
    from scratch, and the index on disk is untouched by the lookup."""
    import glob

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    shard = docs.filter(F.col("doc_id") >= 400)
    idx = str(tmp_path / "span_idx")
    stream = _replay_stream(spark, corpus, tmp_path / "replay", 3)
    maintain_span_index(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()

    files_before = set(glob.glob(f"{idx}/**/*.parquet", recursive=True))
    got = {
        r.doc_id: (r.n_toks, r.covered_toks, r.dup_coverage, r.longest_span)
        for r in lookup_span_coverage(
            spark, idx, shard, id_col="doc_id"
        ).collect()
    }
    files_after = set(glob.glob(f"{idx}/**/*.parquet", recursive=True))
    assert files_after == files_before  # read-only

    corpus_keys = gram_positions(corpus).select("gram").distinct()
    hits = {
        r.doc_id: (r.n_toks, r.covered_toks, r.dup_coverage, r.longest_span)
        for r in span_coverage_frame(
            gram_positions(shard), corpus_keys
        ).collect()
    }
    # r12 contract: the lookup emits one row for EVERY query doc —
    # docs with no corpus-present span come back with explicit zeros
    want = {
        r.doc_id: hits.get(r.doc_id, (len(r.text.split(" ")), 0, 0.0, 0))
        for r in shard.collect()
    }
    assert got == want
    assert len(got) == shard.count()
    assert hits, "shard shares no spans with the corpus; test vacuous"
    assert set(want) - set(hits), (
        "every shard doc hit the corpus; the zero-row leg is vacuous"
    )


def test_common_spans_read_equals_batch(spark, sf_dir, tmp_path):
    """The index's pairwise longest-common-span read equals the batch
    q_common_span computation over the same (drained) corpus."""
    from spark_streaming_join_example_spark.plans.round15 import (
        q_common_span,
    )
    from spark_streaming_join_example_spark.streaming.span_index import (
        common_spans,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stream = _replay_stream(spark, docs, tmp_path / "replay", 3)
    idx = str(tmp_path / "span_idx")
    maintain_span_index(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()
    got = sorted(tuple(r) for r in common_spans(spark, idx).collect())
    want = sorted(tuple(r) for r in q_common_span(spark, sf_dir).collect())
    assert got == want
    assert want, "corpus shares no spans; test vacuous"
