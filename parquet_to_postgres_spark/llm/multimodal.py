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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)


def resize_media(media: DataFrame, factor: int = 4) -> DataFrame:
    """STUB resize: keep every ``factor``-th byte of the payload and
    scale the width metadata to match.

    A real image resize swaps the body for PIL/opencv ``resize``; the
    plumbing under test is what matters at scale — binary in, SMALLER
    binary out through the Arrow boundary (the common shape of every
    thumbnail / downsample stage in a multimodal training pipeline, where
    the output table is deliberately a fraction of the input bytes)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            content = pdf["content"].map(
                lambda b: np.frombuffer(b, dtype=np.uint8)[::factor].tobytes()
                if b is not None
                else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": content,
                    # ceil-divide: every started stride contributes a byte
                    "meta_width": (pdf["meta_width"] + factor - 1) // factor,
                    "meta_height": pdf["meta_height"],
                }
            )

    return media.select(
        "media_id", "content", "meta_width", "meta_height"
    ).mapInPandas(_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 16, every: int = 4
) -> DataFrame:
    """STUB frame sampling: treat the payload as fixed-size frames and
    emit every ``every``-th one — one OUTPUT ROW PER FRAME (row-exploding
    mapInPandas, the video-keyframe-extraction shape).

    ``frame_idx`` is the index in the ORIGINAL frame sequence, so
    downstream temporal logic (scene cuts, clip assembly) keeps real
    timestamps after sampling.  A real implementation swaps the
    byte-slicing for an ffmpeg/pyav keyframe decode; partitioning,
    fan-out row counts, and the Arrow batch contract are identical."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                if b is None:
                    continue
                for i in range(0, len(b) // frame_bytes, every):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", "content").mapInPandas(
        _frames, FRAME_SCHEMA
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("histogram", T.ArrayType(T.LongType()), True),
    ]
)


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """STUB feature extraction: byte-value histogram (``bins`` buckets)
    as a dense vector — the embed-every-asset shape (real version: a
    vision/audio model forward pass; same fixed-width array<numeric>
    output schema feeding the similarity operators in llm/similarity).

    numpy ``bincount`` over the buffer — no per-byte Python loop."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        width = 256 // bins

        def hist(b):
            if b is None:
                return None
            arr = np.frombuffer(b, dtype=np.uint8) // width
            return np.bincount(arr, minlength=bins)[:bins].tolist()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "histogram": pdf["content"].map(hist),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        _feat, FEATURES_SCHEMA
    )


def real_decode_image(content: bytes) -> dict:
    """Placeholder for a real image decode (no codec libs here)."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this environment; "
        "swap fake_decode_meta's body for the real decoder"
    )
