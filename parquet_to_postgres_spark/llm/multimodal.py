"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real decode step (image/audio/video) needs codec libraries that are
not in this environment, so decoding is STUBBED — `fake_decode_meta`
derives deterministic pseudo-metadata from the bytes.  Everything Spark-
side is real and tested: the schema contract, the Arrow batch boundary
(``mapInPandas``), partition behavior, and batch shapes.  Swapping the
stub for PIL/ffmpeg is a one-function change.

At 100 TB the binary column dominates I/O: the iterator-of-batches shape
below never materializes a partition of blobs in memory, and metadata-
only queries prune the binary column at the parquet scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_checksum", T.LongType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: UTF-8 bytes as the opaque
    payload (stands in for image/audio blobs in tests)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.col("n_chars").cast("int").alias("meta_width"),
        F.lit(1).alias("meta_height"),
    )


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: deterministic metadata from raw bytes.

    Real deployments replace the body with e.g. PIL.Image.open /
    soundfile.read; the signature, batching, and output schema stay.
    ``byte_checksum`` = sum of byte values mod 1e9+7 (replicable in SQL,
    so the plumbing itself is oracle-checkable)."""
    import numpy as np

    for pdf in batches:
        content = pdf["content"]
        # numpy over the buffer, not a python loop over every byte — the
        # per-byte work is the whole cost of this operator at scale
        checksum = content.map(
            lambda b: int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64))
            % 1_000_000_007
            if b is not None
            else None
        )
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": content.map(lambda b: len(b) if b is not None else None),
                "first_byte": content.map(
                    lambda b: b[0] if b is not None and len(b) else None
                ),
                "byte_checksum": checksum,
            }
        )


def decode_media(media: DataFrame) -> DataFrame:
    """Run the (stub) decoder over Arrow batches via mapInPandas."""
    return media.select("media_id", "content").mapInPandas(
        fake_decode_meta, DECODED_SCHEMA
    )


def real_decode_image(content: bytes) -> dict:
    """Placeholder for a real image decode (no codec libs here)."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this environment; "
        "swap fake_decode_meta's body for the real decoder"
    )
