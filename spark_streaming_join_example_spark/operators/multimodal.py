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
