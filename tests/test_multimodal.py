"""Multimodal column plumbing: binary payloads, metadata, and the
Arrow-batched (stubbed) decode stage."""

from __future__ import annotations

import hashlib

import pytest

from spark_streaming_join_example_spark import load_table
from spark_streaming_join_example_spark.operators.multimodal import (
    DECODED_SCHEMA,
    attach_binary,
    decode_images,
)


def test_attach_binary_metadata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    out = attach_binary(docs).select("doc_id", "text", "payload", "meta").collect()
    for r in out:
        raw = r.text.encode("utf-8")
        assert bytes(r.payload) == raw
        assert r.meta.n_bytes == len(raw)
        assert r.meta.sha256 == hashlib.sha256(raw).hexdigest()


def test_decode_images_fake_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    withbin = attach_binary(docs)
    out1 = decode_images(withbin).collect()
    out2 = decode_images(withbin).collect()
    assert [f.name for f in DECODED_SCHEMA.fields] == list(out1[0].asDict())
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    for r in out1:
        assert r.n_bytes > 0 and 16 <= r.width < 256 and 16 <= r.height < 256
        assert r.channels in (1, 2, 3) and r.format == "fake/png"


def test_decode_images_real_path_is_marked(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    withbin = attach_binary(docs)
    with pytest.raises(Exception) as ei:
        decode_images(withbin, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)


def test_resize_images_bounds_output(spark, sf_dir):
    from spark_streaming_join_example_spark.operators.multimodal import (
        RESIZED_SCHEMA,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = resize_images(attach_binary(docs), target=64).collect()
    assert [f.name for f in RESIZED_SCHEMA.fields] == list(out[0].asDict())
    for r in out:
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert len(bytes(r.thumb)) <= 64 * 64


def test_sample_frames_fanout_bounded_and_deterministic(spark, sf_dir):
    import pyspark.sql.functions as F

    from spark_streaming_join_example_spark.operators.multimodal import (
        FRAMES_SCHEMA,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    frames = sample_frames(attach_binary(docs), every_ms=100, max_frames=4)
    out1 = frames.collect()
    out2 = frames.collect()
    assert [f.name for f in FRAMES_SCHEMA.fields] == list(out1[0].asDict())
    assert sorted(map(repr, out1)) == sorted(map(repr, out2))
    per_doc = (
        sample_frames(attach_binary(docs), every_ms=100, max_frames=4)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(1 <= r.n <= 4 for r in per_doc)
    assert len(per_doc) == 20


def test_binary_file_corpus_end_to_end(spark, tmp_path):
    """X4 real-world ingestion: a directory of media files read via
    Spark's binaryFile source lands in the SAME corpus shape
    attach_binary produces, the glob prunes non-matching files at
    listing time, doc_ids are deterministic, and the existing decode
    stage runs unchanged on top."""
    import pyspark.sql.functions as F

    from spark_streaming_join_example_spark.operators.multimodal import (
        DECODED_SCHEMA,
        binary_file_corpus,
        decode_images,
    )

    media = tmp_path / "media"
    media.mkdir()
    payloads = {}
    for i in range(8):
        name = f"img_{i}.png" if i % 2 == 0 else f"clip_{i}.wav"
        data = bytes([i * 31 % 256]) * (40 + i)
        (media / name).write_bytes(data)
        payloads[name] = data
    (media / "notes.skip").write_bytes(b"not media")

    corpus = binary_file_corpus(spark, str(media), glob="*.{png,wav}")
    rows = corpus.collect()
    assert len(rows) == 8  # .skip pruned at listing time
    by_path = {r.meta.path.rsplit("/", 1)[-1]: r for r in rows}
    assert set(by_path) == set(payloads)
    for name, r in by_path.items():
        assert bytes(r.payload) == payloads[name]
        assert r.meta.n_bytes == len(payloads[name])
        assert r.meta.mime == (
            "image/png" if name.endswith("png") else "audio/wav"
        )
    # deterministic ids across re-reads, unique per file
    again = {r.doc_id for r in binary_file_corpus(
        spark, str(media), glob="*.{png,wav}").collect()}
    assert again == {r.doc_id for r in rows}
    assert len(again) == 8

    # the standard decode stage runs unchanged on this corpus
    decoded = decode_images(corpus)
    assert [f.name for f in DECODED_SCHEMA.fields] == decoded.columns
    got = decoded.collect()
    assert len(got) == 8
    assert all(r.width >= 16 and r.height >= 16 for r in got)

    # exact dedup by content hash works straight off meta.sha256
    dup = media / "img_dup.png"
    dup.write_bytes(payloads["img_0.png"])
    c2 = binary_file_corpus(spark, str(media), glob="*.png")
    n_files = c2.count()
    n_distinct = c2.select("meta.sha256").distinct().count()
    assert n_files == n_distinct + 1  # exactly the planted duplicate
