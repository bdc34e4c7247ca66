"""Multimodal plumbing: resize, frame sampling, feature extraction.

The decode bodies are stubs (no codec libs in this environment); these
tests pin the REAL parts — schema contracts, Arrow-batch row fan-out,
null payloads, and agreement with plain-Spark twins on the byte math.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_to_postgres_spark.llm import multimodal as M


def _media(spark):
    rows = [
        (1, b"abcdefgh" * 10, "text/plain", 80, 1),
        (2, b"xy", "text/plain", 2, 1),
        (3, None, "text/plain", None, None),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_resize_keeps_every_kth_byte(spark):
    out = {r["media_id"]: r for r in M.resize_media(_media(spark), factor=4).collect()}
    src = b"abcdefgh" * 10
    assert bytes(out[1]["content"]) == src[::4]
    assert out[1]["meta_width"] == 20
    assert bytes(out[2]["content"]) == b"x"
    assert out[2]["meta_width"] == 1  # ceil(2/4) = 1: started stride counts
    assert out[3]["content"] is None


def test_sample_frames_fanout_and_indices(spark):
    """80 bytes / 16-byte frames = 5 frames; every 2nd -> indices 0,2,4.
    Frame bytes must equal the original slice at that ORIGINAL index."""
    out = M.sample_frames(_media(spark), frame_bytes=16, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["media_id"], []).append(r)
    src = b"abcdefgh" * 10
    got = sorted((r["frame_idx"], bytes(r["frame"])) for r in by_doc[1])
    assert got == [(i, src[i * 16 : (i + 1) * 16]) for i in (0, 2, 4)]
    assert 2 not in by_doc  # shorter than one frame -> no rows
    assert 3 not in by_doc  # null payload -> no rows


def test_extract_features_matches_sql_histogram(spark):
    """Histogram from the pandas UDF == histogram computed with plain
    Spark expressions over the exploded bytes (twin-check the math)."""
    media = _media(spark).where(F.col("media_id") == 1)
    got = M.extract_features(media, bins=16).collect()[0]["histogram"]
    twin = (
        media.select(F.hex("content").alias("h"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(h) div 2), "
                    "i -> cast(conv(substring(h, 2*i - 1, 2), 16, 10) as int))"
                )
            ).alias("byte")
        )
        .groupBy((F.col("byte") / 16).cast("int").alias("bin"))
        .count()
        .collect()
    )
    want = [0] * 16
    for r in twin:
        want[r["bin"]] = r["count"]
    assert got == want
    assert sum(got) == 80


def test_feature_null_payload_yields_null(spark):
    rows = M.extract_features(_media(spark)).collect()
    by_id = {r["media_id"]: r["histogram"] for r in rows}
    assert by_id[3] is None
