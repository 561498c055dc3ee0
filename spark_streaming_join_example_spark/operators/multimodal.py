"""Multimodal column support (SURVEY.md §2.11 X4).

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; heavy per-item work (decode,
resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` stages so each Python worker handles a columnar batch,
never a row at a time.

The decode step itself is STUBBED (this container has no image/audio
libraries): ``decode_images(..., fake=True)`` produces a deterministic
fake decode derived from the bytes, and ``fake=False`` raises
NotImplementedError where a real PIL/ffmpeg call would go. The
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output schema of the decode stage — what a real image decoder would
#: attach (dimensions, channels, format guess).
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload + typed metadata columns.

    (The fixtures carry no real media, so the text bytes stand in for
    the payload; the schema/partitioning shape is what matters.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for an image decode: derive plausible
    dimensions from the payload bytes."""
    n = len(payload)
    width = 16 + (payload[0] if n else 0) % 240
    height = 16 + (payload[-1] if n else 0) % 240
    channels = 1 + (n % 3)
    return width, height, channels, "fake/png"


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched decode stage over binary payloads.

    Real decoders (PIL, torchaudio, pyav) are not installed in this
    environment — ``fake=False`` marks exactly where they'd slot in.
    """

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/pyav — not available "
                    "in this container; pass fake=True"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, c, fmt = _fake_decode(data)
                rows.append((doc_id, len(data), w, h, c, fmt))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_images(
    decoded_payloads: DataFrame,
    target: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Resize/thumbnail stage: binary in → (dims, binary thumb) out.

    The Spark shape is what matters at scale: a second mapInPandas
    stage pipelined after decode, Arrow both ways, output bytes
    bounded by `target` so the shuffle after this stage carries
    thumbnails, never originals. Fake kernel = deterministic
    truncation standing in for PIL's `Image.resize` (fake=False marks
    the slot)."""

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resize requires PIL — not available here; "
                    "pass fake=True"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, _, _ = _fake_decode(data)
                scale = target / max(w, h, 1)
                out_w, out_h = max(1, int(w * scale)), max(1, int(h * scale))
                rows.append((doc_id, out_w, out_h, data[: out_w * out_h]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return decoded_payloads.select(id_col, payload_col).mapInPandas(
        resize_batches, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    videos: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Frame-sampling stage: one binary video → N (frame_idx, ts,
    frame-bytes) rows — the 1:N explode shape of video pipelines.

    Output cardinality is bounded (`max_frames`) so the stage's fan-out
    is predictable at 100 TB; frames inherit the input partitioning, so
    a following per-frame featurizer needs no shuffle. Fake kernel:
    deterministic byte-slices as stand-in frames (fake=False marks
    where pyav/ffmpeg slots in)."""

    def frame_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires pyav/ffmpeg — not "
                    "available here; pass fake=True"
                )
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                # fake "duration": 1 ms per byte
                n_frames = min(max_frames, max(1, len(data) // max(1, every_ms)))
                for i in range(n_frames):
                    ts = i * every_ms
                    rows.append((doc_id, i, ts, data[ts : ts + 16]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return videos.select(id_col, payload_col).mapInPandas(
        frame_batches, FRAMES_SCHEMA
    )


#: extension → mime for the formats a media pipeline meets most; the
#: fallback is the generic byte-stream type (decode stages dispatch on
#: sniffed magic bytes anyway — the column is a routing hint).
_MIME_BY_EXT = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "webp": "image/webp",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "flac": "audio/flac",
    "mp4": "video/mp4",
    "mkv": "video/x-matroska",
    "webm": "video/webm",
    "txt": "text/plain",
}


def binary_file_corpus(
    spark, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest a directory tree of media files as the engine's
    multimodal corpus shape — the real-world entry point for X4
    (attach_binary is the fixture stand-in; THIS is how image/audio
    corpora actually arrive).

    Built on Spark's ``binaryFile`` source (whole-file rows: path,
    modificationTime, length, content), so ingestion is a plain scan:
    ``pathGlobFilter`` prunes at the LISTING level (files that don't
    match are never opened), and small files are packed multiple per
    task under ``spark.sql.files.maxPartitionBytes`` — at 100 TB the
    standard practice still applies (media items are the unit of
    work; archive tiny files upstream, binaryFile does not split
    single large files across tasks).

    Output: (doc_id, payload, meta{n_bytes, sha256, mime, path}) —
    the same shape attach_binary produces, so every downstream stage
    (decode_images, resize_images, sample_frames, the dedup-by-sha256
    exact pass) runs unchanged.  doc_id = xxhash64(path):
    deterministic across runs and layouts, unique per file within a
    corpus snapshot."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = F.lit("application/octet-stream")
    for e, m in _MIME_BY_EXT.items():
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return df.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.octet_length("content").alias("n_bytes"),
            F.sha2(F.col("content"), 256).alias("sha256"),
            mime.alias("mime"),
            F.col("path").alias("path"),
        ).alias("meta"),
    )
