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


# ---- real decoders (BMP / PPM / WAV — dependency-free formats) ---------


def _make_bmp(width=4, height=3, bpp=24):
    """Hand-assemble an uncompressed BI_RGB BMP with a known pixel mean."""
    import numpy as np

    row_bytes = width * (bpp // 8)
    stride = (bpp * width + 31) // 32 * 4
    rng = np.arange(height * row_bytes, dtype=np.uint8).reshape(
        height, row_bytes
    )
    rows = b"".join(
        r.tobytes() + b"\x00" * (stride - row_bytes) for r in rng
    )
    data_offset = 54
    header = (
        b"BM"
        + (data_offset + len(rows)).to_bytes(4, "little")
        + b"\x00" * 4
        + data_offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 20
    )
    return header + rows, float(rng.mean(dtype=np.float64))


def _make_ppm(width=5, height=2):
    import numpy as np

    samples = np.arange(width * height * 3, dtype=np.uint8)
    head = f"P6\n# comment\n{width} {height}\n255\n".encode()
    return head + samples.tobytes(), float(samples.mean(dtype=np.float64))


def _make_wav(n=100, rate=8000, channels=1):
    import numpy as np

    samples = (np.arange(n, dtype=np.int16) - n // 2).astype("<i2")
    data = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    riff = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    import numpy as _np

    mean = float(_np.abs(samples.astype(_np.int32)).mean(dtype=_np.float64))
    return riff, mean


def test_decode_bytes_bmp_ppm_wav_headers_and_stats():
    bmp, bmp_mean = _make_bmp(width=4, height=3)
    got = M.decode_media_bytes(bmp)
    assert (got["fmt"], got["width"], got["height"], got["channels"]) == (
        "bmp", 4, 3, 3,
    )
    assert got["n_values"] == 4 * 3 * 3
    assert got["mean_value"] == bmp_mean  # padding bytes must be excluded

    ppm, ppm_mean = _make_ppm(width=5, height=2)
    got = M.decode_media_bytes(ppm)
    assert (got["fmt"], got["width"], got["height"]) == ("ppm", 5, 2)
    assert got["mean_value"] == ppm_mean

    wav, wav_mean = _make_wav(n=100, rate=8000)
    got = M.decode_media_bytes(wav)
    assert (got["fmt"], got["sample_rate"], got["channels"]) == ("wav", 8000, 1)
    assert got["mean_value"] == wav_mean


def test_decode_bytes_rejects_garbage_and_compressed():
    import pytest

    with pytest.raises(ValueError, match="unrecognized"):
        M.decode_media_bytes(b"GIF8 not a supported payload")
    with pytest.raises(ValueError, match="IHDR"):
        M.decode_media_bytes(b"\x89PNG\r\n\x1a\n garbage")
    bmp, _ = _make_bmp()
    rle = bmp[:30] + (1).to_bytes(4, "little") + bmp[34:]  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        M.decode_media_bytes(rle)


def _make_png(width=6, height=5, channels=3, filters=(0, 1, 2, 3, 4)):
    """Hand-assemble a real zlib-compressed PNG, cycling through the
    given scanline filter types, with a known pixel mean."""
    import struct
    import zlib

    import numpy as np

    stride, bpp = width * channels, channels
    arr = (
        (np.arange(height * stride, dtype=np.uint32) * 37 + 11) % 256
    ).astype(np.uint8).reshape(height, stride)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = filters[y % len(filters)]
        row = arr[y].astype(np.int32)
        enc = np.empty_like(row)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            c = prev[x - bpp] if x >= bpp else 0
            up = prev[x]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (a + up) // 2
            else:  # Paeth
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            enc[x] = (row[x] - pred) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = row
    raw = zlib.compress(b"".join(lines))

    def chunk(cid, body):
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body))
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    return png, float(arr.mean(dtype=np.float64))


def test_decode_png_all_filter_types():
    """The dependency-free PNG decoder reconstructs a DEFLATE-compressed
    raster bit-exactly across every scanline filter type (None / Sub /
    Up / Average / Paeth) and both RGB and grayscale layouts."""
    png, mean = _make_png(width=6, height=5, channels=3)
    got = M.decode_media_bytes(png)
    assert (got["fmt"], got["width"], got["height"], got["channels"]) == (
        "png", 6, 5, 3,
    )
    assert got["n_values"] == 6 * 5 * 3
    assert got["mean_value"] == mean

    gray, gray_mean = _make_png(width=9, height=4, channels=1)
    got = M.decode_media_bytes(gray)
    assert (got["channels"], got["mean_value"]) == (1, gray_mean)

    rgba, rgba_mean = _make_png(width=3, height=7, channels=4)
    got = M.decode_media_bytes(rgba)
    assert (got["channels"], got["mean_value"]) == (4, rgba_mean)


def test_decode_png_rejects_unsupported_variants():
    import struct
    import pytest

    png, _ = _make_png()
    # patch IHDR bit depth to 16 (offset: 8 sig + 8 len/id + 8 w/h)
    depth16 = png[:24] + b"\x10" + png[25:]
    with pytest.raises(ValueError, match="8-bit"):
        M.decode_media_bytes(depth16)
    # palette color type (3)
    pal = png[:25] + struct.pack("B", 3) + png[26:]
    with pytest.raises(ValueError, match="color type"):
        M.decode_media_bytes(pal)


def test_decode_jpeg_native_no_pillow_needed():
    """Baseline JPEG decodes NATIVELY (r9) — no Pillow on this box —
    and a garbage payload behind the JPEG magic still raises a clear
    ValueError rather than nonsense stats."""
    import numpy as np
    import pytest

    from ._jpeg_ref import encode_jpeg

    arr = np.full((4, 4, 3), 128, dtype=np.uint8)
    got = M.decode_media_bytes(encode_jpeg(arr))
    assert got["fmt"] == "jpeg"
    assert (got["width"], got["height"], got["channels"]) == (4, 4, 3)

    with pytest.raises(ValueError):
        M.decode_media_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_decode_png_through_spark_plumbing(spark):
    """A compressed-codec payload decodes through the same mapInPandas
    path as the uncompressed tier."""
    png, mean = _make_png(width=6, height=5, channels=3)
    media = spark.createDataFrame(
        [(10, png, "image/png", None, None)], M.MEDIA_SCHEMA
    )
    row = M.decode_media_real(media).collect()[0]
    assert row["fmt"] == "png" and row["mean_value"] == mean


def test_decode_media_real_through_spark(spark):
    """The real decoders run through the same mapInPandas plumbing: a
    mixed-format media table decodes to correct per-row metadata."""
    bmp, bmp_mean = _make_bmp(width=4, height=3)
    ppm, ppm_mean = _make_ppm(width=5, height=2)
    wav, wav_mean = _make_wav(n=100, rate=8000)
    media = spark.createDataFrame(
        [(1, bmp, "image/bmp", None, None),
         (2, ppm, "image/x-portable-pixmap", None, None),
         (3, wav, "audio/wav", None, None)],
        M.MEDIA_SCHEMA,
    ).repartition(2)
    out = {r["media_id"]: r for r in M.decode_media_real(media).collect()}
    assert out[1]["fmt"] == "bmp" and out[1]["mean_value"] == bmp_mean
    assert (out[1]["width"], out[1]["height"]) == (4, 3)
    assert out[2]["fmt"] == "ppm" and out[2]["mean_value"] == ppm_mean
    assert out[3]["fmt"] == "wav" and out[3]["sample_rate"] == 8000
    assert out[3]["mean_value"] == wav_mean


# ---- native baseline JPEG (r9) ------------------------------------------


def _np():
    import numpy as np

    return np


def test_decode_jpeg_flat_gray_is_exact():
    """DC-only blocks round-trip EXACTLY (8*(v-128) is integral, q=1
    divides it, IDCT of a DC-only block is a flat value) — so any
    zigzag/scale/level-shift bug shows as a hard mismatch here and
    CANNOT cancel against the test encoder's own math."""
    np = _np()
    from ._jpeg_ref import encode_jpeg

    for v in (0, 17, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        got = M.decode_media_bytes(encode_jpeg(img))
        assert (got["fmt"], got["width"], got["height"], got["channels"]) == (
            "jpeg", 24, 16, 1
        )
        assert got["mean_value"] == float(v), (v, got["mean_value"])
        pix = M._jpeg_pixels(encode_jpeg(img))
        assert int(pix.min()) == int(pix.max()) == v


def test_decode_jpeg_gray_noise_near_lossless():
    """q=1 4:4:4 grayscale: the only error is DCT float rounding —
    every pixel within ±2 of the source."""
    np = _np()
    from ._jpeg_ref import encode_jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    pix = M._jpeg_pixels(encode_jpeg(img))
    assert pix.shape == (24, 40, 1)
    err = np.abs(pix[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_decode_jpeg_rgb_444_near_lossless():
    """q=1 4:4:4 color: adds two colorspace roundings — within ±4."""
    np = _np()
    from ._jpeg_ref import encode_jpeg

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    pix = M._jpeg_pixels(encode_jpeg(img))
    assert pix.shape == (16, 16, 3)
    err = np.abs(pix.astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()


def test_decode_jpeg_420_restart_odd_dims():
    """The realistic shape: 4:2:0 subsampling, quantization, restart
    markers, and non-MCU-multiple dimensions (21x13).  Smooth gradient
    so chroma box-downsampling stays honest; tolerance covers quant +
    nearest-neighbor chroma upsampling."""
    np = _np()
    from ._jpeg_ref import encode_jpeg

    h, w = 13, 21
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (40 + 6 * xx) % 256,
            (200 - 4 * yy) % 256,
            (90 + 3 * xx + 2 * yy) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    q = np.full(64, 2, dtype=int)
    qc = np.full(64, 4, dtype=int)
    b = encode_jpeg(img, q_luma=q, q_chroma=qc, subsampling="420",
                    restart_interval=1)
    got = M.decode_media_bytes(b)
    assert (got["width"], got["height"], got["channels"]) == (21, 13, 3)
    pix = M._jpeg_pixels(b)
    err = np.abs(pix.astype(int) - img.astype(int))
    assert float(err.mean()) <= 6.0, err.mean()
    assert err.max() <= 40, err.max()


def test_decode_jpeg_progressive_full_band_scan_rejected():
    """r10: SOF2 now decodes natively, but a full-band (Ss=0,Se=63)
    scan inside a progressive frame is invalid (T.81 G.1.1.1.1 —
    progressive scans carry DC xor AC) and must raise.  Flipping the
    SOF marker on a valid baseline stream produces exactly that."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg

    b = bytearray(encode_jpeg(np.full((8, 8), 99, dtype=np.uint8)))
    i = bytes(b).index(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive|mixes"):
        M._jpeg_pixels(bytes(b))


def test_decode_jpeg_progressive_matches_sequential_exactly():
    """Successive approximation is a LOSSLESS re-encoding of the same
    quantized coefficients, so the progressive decode must be pixel-
    IDENTICAL to the sequential decode of the same image — across
    gray, 4:4:4 / 4:2:2 / 4:2:0, odd dims, and restart markers.  No
    tolerance: any EOB-run, refinement-bit, or band-walk bug is a hard
    mismatch."""
    np = _np()
    from ._jpeg_ref import encode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(7)
    cases = [
        (rng.randint(0, 256, (16, 16), dtype=np.uint8), {}),
        (rng.randint(0, 256, (13, 21), dtype=np.uint8), {}),
        (rng.randint(0, 256, (24, 17, 3), dtype=np.uint8),
         dict(subsampling="444")),
        (rng.randint(0, 256, (20, 18, 3), dtype=np.uint8),
         dict(subsampling="420")),
        (rng.randint(0, 256, (16, 8, 3), dtype=np.uint8),
         dict(subsampling="422")),
        (rng.randint(0, 256, (33, 34, 3), dtype=np.uint8),
         dict(subsampling="420", restart_interval=2)),
    ]
    for img, kw in cases:
        seq = M._jpeg_pixels(encode_jpeg(img, **kw))
        prog = M._jpeg_pixels(encode_jpeg_progressive(img, **kw))
        assert prog.shape == seq.shape, (img.shape, kw)
        assert (prog == seq).all(), (img.shape, kw)


def test_decode_jpeg_progressive_eob_runs_and_refinement():
    """Adversarial entropy shapes: a near-flat sparse image drives
    long cross-block EOB runs (with correction bits inside the run);
    high-contrast stripes under coarse quant drive multi-bit
    refinements and ZRL-in-refinement; a deep Al=3 chain exercises
    repeated DC+AC refinement.  All must stay exactly equal to the
    sequential decode."""
    np = _np()
    from ._jpeg_ref import encode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(11)

    sparse = np.full((64, 64), 128, dtype=np.uint8)
    sparse[5, 7] = 255
    sparse[40, 40] = 0
    sparse[63, 1] = 77
    assert (
        M._jpeg_pixels(encode_jpeg_progressive(sparse))
        == M._jpeg_pixels(encode_jpeg(sparse))
    ).all()

    q = np.full(64, 16, dtype=np.int32)
    q[0] = 8
    stripes = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    stripes[::2] = 255
    stripes[1::4] = 0
    kw = dict(q_luma=q, subsampling="420")
    assert (
        M._jpeg_pixels(encode_jpeg_progressive(stripes, **kw))
        == M._jpeg_pixels(encode_jpeg(stripes, **kw))
    ).all()

    deep = [
        dict(comps=[0], ss=0, se=0, ah=0, al=3),
        dict(comps=[0], ss=1, se=63, ah=0, al=3),
        dict(comps=[0], ss=0, se=0, ah=3, al=2),
        dict(comps=[0], ss=1, se=63, ah=3, al=2),
        dict(comps=[0], ss=0, se=0, ah=2, al=1),
        dict(comps=[0], ss=1, se=63, ah=2, al=1),
        dict(comps=[0], ss=0, se=0, ah=1, al=0),
        dict(comps=[0], ss=1, se=63, ah=1, al=0),
    ]
    img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    assert (
        M._jpeg_pixels(encode_jpeg_progressive(img, scans=deep))
        == M._jpeg_pixels(encode_jpeg(img))
    ).all()

    # restarts interleaved with EOB runs (runs must not cross RSTn)
    sp2 = np.full((48, 48), 200, dtype=np.uint8)
    sp2[10:12, 10:30] = 0
    assert (
        M._jpeg_pixels(encode_jpeg_progressive(sp2, restart_interval=3))
        == M._jpeg_pixels(encode_jpeg(sp2, restart_interval=3))
    ).all()


def test_decode_jpeg_progressive_truncated_script_decodes():
    """A script that stops before Al reaches 0 is a legal (lower
    quality) progressive stream — real encoders emit these and real
    decoders render them.  Must decode without error, with every pixel
    within the coarser quantization's bound of the full decode."""
    np = _np()
    from ._jpeg_ref import (
        default_progressive_scans,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (24, 24), dtype=np.uint8)
    full = M._jpeg_pixels(encode_jpeg(img))
    scans = default_progressive_scans(1)
    # keep DC initial + both AC initial bands only (coefficients stay
    # at Al=2 for AC / Al=1 for DC)
    trunc = M._jpeg_pixels(encode_jpeg_progressive(img, scans=scans[:3]))
    assert trunc.shape == full.shape
    err = np.abs(trunc.astype(int) - full.astype(int))
    # DC off by <2^1, AC by <2^2 per coefficient; IDCT spreads it
    assert err.max() <= 40, err.max()


def test_decode_jpeg_sequential_noninterleaved_matches_interleaved():
    """SOF0 with one single-component scan per component (T.81 A.2.2
    non-interleaved order, multi-scan sequential) decodes identically
    to the interleaved single-scan stream — including subsampled
    chroma walking its OWN ceil-dims block grid (w=17 luma: 3-block
    rows vs the 4-block padded plane) and per-scan restart numbering."""
    np = _np()
    from ._jpeg_ref import encode_jpeg, encode_jpeg_noninterleaved

    rng = np.random.RandomState(17)
    for shape, kw in [
        ((16, 16), {}),
        ((24, 17, 3), dict(subsampling="444")),
        ((20, 18, 3), dict(subsampling="420")),
        ((13, 21, 3), dict(subsampling="420", restart_interval=2)),
    ]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        seq = M._jpeg_pixels(encode_jpeg(img, **kw))
        ni = M._jpeg_pixels(encode_jpeg_noninterleaved(img, **kw))
        assert (ni == seq).all(), (shape, kw)


def test_decode_jpeg_progressive_flat_is_exact():
    """Progressive DC-only path has the same no-rounding property as
    sequential: flat images decode EXACTLY, so the DC initial+refine
    bit plumbing cannot hide a scale error."""
    np = _np()
    from ._jpeg_ref import encode_jpeg_progressive

    for v in (0, 17, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        got = M.decode_media_bytes(encode_jpeg_progressive(img))
        assert (got["fmt"], got["width"], got["height"], got["channels"]) \
            == ("jpeg", 24, 16, 1)
        assert got["mean_value"] == float(v), (v, got["mean_value"])


def test_decode_jpeg_single_component_ignores_sampling_factors():
    """T.81 A.2.2: a single-component scan is NON-interleaved — one
    8x8 data unit per MCU in raster order, whatever the SOF sampling
    factors say.  Patching a grayscale stream's factors to 2x2 must
    decode to the identical pixels (r9 review finding: honoring the
    factors mis-tiled such streams)."""
    np = _np()

    from ._jpeg_ref import encode_jpeg

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 16), dtype=np.uint8)
    b = encode_jpeg(img)
    want = M._jpeg_pixels(b)
    patched = bytearray(b)
    i = bytes(b).index(b"\xff\xc0")
    assert patched[i + 4 + 7] == 0x11  # the component's HiVi byte
    patched[i + 4 + 7] = 0x22
    got = M._jpeg_pixels(bytes(patched))
    assert got.shape == want.shape
    assert (got == want).all()


def test_decode_jpeg_422_horizontal_subsampling():
    """4:2:2 (2x1 luma over 1x1 chroma) exercises the asymmetric MCU
    walk (16x8 MCUs) and horizontal-only chroma upsampling — the third
    standard sampling grid alongside the 4:4:4 and 4:2:0 tests."""
    np = _np()

    from ._jpeg_ref import encode_jpeg

    h, w = 12, 22
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(30 + 5 * xx) % 256, (180 - 3 * yy) % 256, (70 + 2 * xx + 4 * yy) % 256],
        axis=2,
    ).astype(np.uint8)
    b = encode_jpeg(img, subsampling="422")
    got = M.decode_media_bytes(b)
    assert (got["width"], got["height"], got["channels"]) == (22, 12, 3)
    pix = M._jpeg_pixels(b)
    err = np.abs(pix.astype(int) - img.astype(int))
    assert float(err.mean()) <= 5.0, err.mean()
    assert err.max() <= 35, err.max()


def test_decode_jpeg_16bit_quant_tables():
    """DQT precision=1 (16-bit entries) must parse and dequantize
    correctly.  T.81 forbids 16-bit tables in 8-bit baseline streams,
    but lenient decoders accept them in the wild and ours pins that
    parse path (the fixture encoder documents the non-conformance).
    Flat image + q[DC]=8 keeps the DC math exact, so the large AC
    steps change nothing and the roundtrip must be EXACT — any
    table-offset parse bug shifts every entry and breaks it."""
    np = _np()

    from ._jpeg_ref import encode_jpeg

    q = np.full(64, 300, dtype=int)  # > 255 -> 16-bit table
    q[0] = 8
    img = np.full((16, 16), 200, dtype=np.uint8)
    b = encode_jpeg(img, q_luma=q)
    # the 16-bit table really was emitted: DQT length 2+1+128=131
    # (an 8-bit table would be 0x43) — pins the intended parse path
    assert b"\xff\xdb\x00\x83" in b
    got = M.decode_media_bytes(b)
    assert got["mean_value"] == 200.0
    pix = M._jpeg_pixels(b)
    assert int(pix.min()) == int(pix.max()) == 200


def test_decode_jpeg_zero_dims_raise():
    """r9 ADVICE: an SOF declaring height or width 0 must surface the
    uniform ValueError contract, not an empty array whose NaN mean
    poisons downstream stat aggregates (this also honestly refuses the
    legal h=0 + DNL deferred-height form)."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg

    base = encode_jpeg(np.full((8, 8), 50, dtype=np.uint8))
    i = base.index(b"\xff\xc0")
    # SOF payload: len(2) precision(1) h(2) w(2) ncomp(1)
    for off in (5, 7):  # height bytes, width bytes
        b = bytearray(base)
        b[i + off] = b[i + off + 1] = 0
        with pytest.raises(ValueError, match="empty frame"):
            M.decode_jpeg(bytes(b))


def test_decode_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes; a conformant stream padded that way must still decode
    (r9 ADVICE — the segment walk used to desync on the fill run).
    Exactness on a flat image pins that no segment was skipped."""
    np = _np()

    from ._jpeg_ref import encode_jpeg

    base = encode_jpeg(np.full((8, 8), 200, dtype=np.uint8))
    # insert fill runs before the DQT, DHT and SOS markers
    out = bytearray()
    i = 0
    while i < len(base):
        if base[i] == 0xFF and base[i + 1] in (0xDB, 0xC4, 0xDA):
            out += b"\xff\xff\xff"  # fill run, then the real FF-marker
        out.append(base[i])
        i += 1
    got = M.decode_media_bytes(bytes(out))
    assert (got["width"], got["height"]) == (8, 8)
    assert got["mean_value"] == 200.0


def test_media_fixtures_expected_matches_decode():
    """The frozen driver-gate fixtures (llm/media_fixtures.py) must
    decode to exactly their pinned EXPECTED stats — the same identity
    the CORRECTNESS gate hashes, checked here so a decoder change that
    shifts any deterministic output is caught at pytest time, not at
    the round gate."""
    from parquet_to_postgres_spark.llm import media_fixtures as MF

    rows = dict(MF.payloads())
    assert len(rows) == len(MF.EXPECTED)
    for (mid, fmt, w, h, ch, sr, n, psum) in MF.EXPECTED:
        content = rows[mid]
        if content is None:
            assert fmt is None
            continue
        got = M.decode_media_bytes(content)
        assert got["fmt"] == fmt, mid
        assert (got["width"], got["height"], got["channels"]) == (w, h, ch), mid
        assert got["sample_rate"] == sr, mid
        assert got["n_values"] == n, mid
        assert round(got["mean_value"] * got["n_values"]) == psum, mid


def test_decode_jpeg_fill_bytes_before_restart_markers():
    """T.81 B.1.1.2 allows fill 0xFF bytes before ANY marker —
    including RSTn inside the entropy stream (r10 review finding: the
    bit reader used to treat the fill run as end-of-scan).  Inserting
    fills before every restart marker must not change a single pixel,
    sequential or progressive."""
    np = _np()

    from ._jpeg_ref import encode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (33, 34, 3), dtype=np.uint8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        b = enc(img, subsampling="420", restart_interval=2)
        want = M._jpeg_pixels(b)
        out = bytearray()
        i = 0
        sos_seen = False
        while i < len(b):
            if b[i] == 0xFF and i + 1 < len(b):
                if b[i + 1] == 0xDA:
                    sos_seen = True
                if sos_seen and 0xD0 <= b[i + 1] <= 0xD7:
                    out += b"\xff\xff"  # fill run before the RSTn
            out.append(b[i])
            i += 1
        got = M._jpeg_pixels(bytes(out))
        assert (got == want).all(), enc.__name__


def test_decode_jpeg_oversized_header_dims_rejected():
    """JPEG allocates coefficient planes from HEADER dims before any
    entropy data is read (the lossless decoders bind allocation to
    actual payload bytes) — so a tiny adversarial payload declaring
    65535x65535 must be refused by the pixel cap, not attempted (r10
    review finding: ~17 GB/component allocation DoS)."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg

    base = bytearray(encode_jpeg(np.full((8, 8), 50, dtype=np.uint8)))
    i = bytes(base).index(b"\xff\xc0")
    base[i + 5 : i + 7] = (65535).to_bytes(2, "big")  # height
    base[i + 7 : i + 9] = (65535).to_bytes(2, "big")  # width
    with pytest.raises(ValueError, match="pixel decode cap"):
        M.decode_jpeg(bytes(base))


def test_decode_jpeg_12bit_flat_is_exact():
    """r10: 12-bit samples decode natively (SOF1 extended sequential /
    SOF2 progressive).  Flat 12-bit frames have the same no-rounding
    DC-only property as 8-bit, so the wider level shift (2048) and
    uint16 output path are pinned EXACTLY."""
    np = _np()
    from ._jpeg_ref import encode_jpeg

    for v in (0, 17, 2048, 3000, 4095):
        img = np.full((16, 24), v, dtype=np.uint16)
        got = M.decode_media_bytes(encode_jpeg(img, precision=12))
        assert (got["fmt"], got["width"], got["height"], got["channels"]) \
            == ("jpeg", 24, 16, 1)
        assert got["mean_value"] == float(v), (v, got["mean_value"])
        pix = M._jpeg_pixels(encode_jpeg(img, precision=12))
        assert pix.dtype == np.uint16
        assert int(pix.min()) == int(pix.max()) == v


def test_decode_jpeg_12bit_all_stream_kinds_agree():
    """12-bit noise: q=1 decode within ±2 of the source at 12-bit
    scale, and the progressive and non-interleaved encodings of the
    same image decode EXACTLY equal to the sequential one (the
    successive-approximation chain now walks DC categories up to 15
    and AC sizes up to 14)."""
    np = _np()
    from ._jpeg_ref import (
        encode_jpeg,
        encode_jpeg_noninterleaved,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(29)
    g = rng.randint(0, 4096, (24, 40)).astype(np.uint16)
    pix = M._jpeg_pixels(encode_jpeg(g, precision=12))
    err = np.abs(pix[:, :, 0].astype(int) - g.astype(int))
    assert err.max() <= 2, err.max()

    img = rng.randint(0, 4096, (20, 18, 3)).astype(np.uint16)
    kw = dict(subsampling="420", restart_interval=2, precision=12)
    seq = M._jpeg_pixels(encode_jpeg(img, **kw))
    assert seq.dtype == np.uint16
    assert (M._jpeg_pixels(encode_jpeg_progressive(img, **kw)) == seq).all()
    ni = M._jpeg_pixels(
        encode_jpeg_noninterleaved(img, subsampling="420", precision=12)
    )
    assert (ni == M._jpeg_pixels(
        encode_jpeg(img, subsampling="420", precision=12))).all()


def test_decode_jpeg_12bit_in_sof0_refused():
    """T.81 B.2.2: baseline (SOF0) is 8-bit only — a 12-bit SOF0 frame
    must raise, not decode leniently (the honest-conformance line;
    12-bit is accepted under SOF1/SOF2)."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg

    b = bytearray(encode_jpeg(np.full((8, 8), 99, dtype=np.uint16),
                              precision=12))
    i = bytes(b).index(b"\xff\xc1")
    b[i + 1] = 0xC0
    with pytest.raises(ValueError, match="baseline"):
        M.decode_jpeg(bytes(b))


def test_decode_jpeg_sequential_missing_component_scan_refused():
    """r10 ADVICE: a sequential multi-scan stream that omits a
    component's scan entirely must refuse, not decode the missing
    channel as an all-zero coefficient plane (mid-gray) — a truncated
    multi-scan crawl file would otherwise yield plausible-but-wrong
    stats.  Progressive partial scripts stay lenient (pinned by
    test_decode_jpeg_progressive_truncated_script_decodes)."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg_noninterleaved

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    b = encode_jpeg_noninterleaved(img)
    # entropy bytes are FF-stuffed and restart markers are D0-D7, so
    # FF DA occurs exactly at the three real SOS headers
    second = b.index(b"\xff\xda", b.index(b"\xff\xda") + 2)
    third = b.index(b"\xff\xda", second + 2)
    with pytest.raises(ValueError, match="omits scan data"):
        M._jpeg_pixels(b[:third] + b"\xff\xd9")
    # dropping two scans names both missing components
    with pytest.raises(ValueError, match="omits scan data"):
        M._jpeg_pixels(b[:second] + b"\xff\xd9")
    # the full stream still decodes
    assert M._jpeg_pixels(b).shape == (16, 16, 3)


def test_decode_jpeg_12bit_dequant_no_int32_overflow():
    """r10 ADVICE: dequantization must not wrap int32.  A 12-bit
    progressive stream can legally carry a DC coefficient of
    8192 << 13 = 2^26 (size-14 diff at Al=13); against a 16-bit quant
    value of 65535 the product is (2^16-1)*2^26 = 2^42 - 2^26, whose
    low 32 bits are NEGATIVE as int32 — the block would clip to black
    instead of the correct full-scale white.  No real encoder emits
    this (quantized = coeff/q keeps the product ~coeff), so the stream
    is hand-assembled from the reference encoder's primitives."""
    np = _np()

    from ._jpeg_ref import _BitWriter, _dht, _dqt, _put_dc_diff, _seg, _tables

    dc_counts, dc_syms, dc_codes = _tables(12)[:3]
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, [65535] * 64)  # forces the 16-bit (Pq=1) table
    # SOF2: precision 12, 8x8, one component (id=1, 1x1 sampling, tq=0)
    out += _seg(0xC2, bytes([12, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    out += _dht(0, 0, dc_counts, dc_syms)
    # SOS: DC initial scan at Al=13 (Ss=Se=0, Ah=0)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 13]))
    w = _BitWriter()
    _put_dc_diff(w, 8192, dc_codes)  # coeff = 8192 << 13 = 2^26
    w.pad()
    out += w.out + b"\xff\xd9"

    px = M._jpeg_pixels(bytes(out))
    assert px.shape == (8, 8, 1)
    assert px.dtype == np.uint16
    # int64 dequant: hugely positive DC -> every sample clips to 4095
    assert (px == 4095).all()


def test_decode_jpeg_cmyk_and_ycck():
    """r11 (closes the documented CMYK refusal): 4-component JPEG —
    CMYK as stored (Adobe transform 0) and YCCK (transform 2, the
    Adobe-writer default) — round-trips near-losslessly at q=1 in
    sequential AND progressive streams, at 8- and 12-bit precision;
    a full progressive script decodes IDENTICALLY to sequential.
    Unknown transforms and >4 components refuse."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, (20, 14, 4), dtype=np.uint8)
    for t in (0, 2):
        seq = M._jpeg_pixels(encode_jpeg(img, cmyk_transform=t))
        assert seq.shape == (20, 14, 4)
        err = np.abs(seq.astype(int) - img.astype(int)).max()
        assert err <= 3, (t, err)
        prog = M._jpeg_pixels(
            encode_jpeg_progressive(img, cmyk_transform=t)
        )
        assert (prog == seq).all(), t

    img12 = rng.randint(0, 4096, (12, 10, 4)).astype(np.uint16)
    px12 = M._jpeg_pixels(
        encode_jpeg(img12, precision=12, cmyk_transform=2)
    )
    assert px12.dtype == np.uint16
    assert np.abs(px12.astype(int) - img12.astype(int)).max() <= 3

    # stats surface: channels=4
    got = M.decode_media_bytes(encode_jpeg(img, cmyk_transform=2))
    assert (got["channels"], got["n_values"]) == (4, 20 * 14 * 4)

    # unknown Adobe transform refuses; missing APP14 decodes as stored
    b = bytearray(encode_jpeg(img, cmyk_transform=2))
    i = bytes(b).index(b"Adobe") + 11
    b[i] = 7
    with pytest.raises(ValueError, match="Adobe transform 7"):
        M._jpeg_pixels(bytes(b))
    raw = encode_jpeg(img, cmyk_transform=0)
    j = raw.index(b"\xff\xee")
    seglen = int.from_bytes(raw[j + 2 : j + 4], "big")
    stripped = raw[:j] + raw[j + 2 + seglen :]  # drop APP14 entirely
    assert (
        M._jpeg_pixels(stripped) == M._jpeg_pixels(raw)
    ).all()  # 4-comp sans APP14 = CMYK as stored

    # >4 components refuse before any plane allocation
    five = bytearray(encode_jpeg(img, cmyk_transform=0))
    k = bytes(five).index(b"\xff\xc0")
    # SOF body: len(2) prec(1) h(2) w(2) ncomp(1) comps...
    five[k + 9] = 5
    with pytest.raises(ValueError, match="5-component"):
        M._jpeg_pixels(bytes(five))


def test_decode_jpeg_rgb_as_stored_transform0():
    """Adobe transform 0 with THREE components means RGB stored
    untouched — applying the YCbCr de-correlation there would garble
    colors (r11; pinned against the encoder's as-stored path)."""
    np = _np()

    from ._jpeg_ref import encode_jpeg

    rng = np.random.RandomState(43)
    rgb = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    px = M._jpeg_pixels(encode_jpeg(rgb, cmyk_transform=0))
    assert np.abs(px.astype(int) - rgb.astype(int)).max() <= 1
    # and the normal (no-APP14) path still YCbCr-converts
    px2 = M._jpeg_pixels(encode_jpeg(rgb))
    assert np.abs(px2.astype(int) - rgb.astype(int)).max() <= 3


def test_decode_jpeg_lossless_sof3_exact():
    """r11 (closes the lossless line of the documented-refusals list):
    SOF3 predictive DPCM decodes EXACTLY — all 7 predictors, 8/12/16
    bit, gray and 3-channel, interleaved and one-scan-per-component,
    mod-2^16 wraparound at extreme neighbors, and the point transform
    (decode == (input >> Pt) << Pt).  Restart intervals and subsampled
    lossless refuse honestly."""
    np = _np()
    import pytest

    from ._jpeg_ref import encode_jpeg_lossless

    rng = np.random.RandomState(55)
    for shape, dtype, prec in [
        ((13, 9), np.uint8, 8),
        ((10, 7, 3), np.uint8, 8),
        ((8, 6, 3), np.uint16, 16),
        ((6, 5), np.uint16, 12),
    ]:
        img = rng.randint(0, (1 << prec), shape).astype(dtype)
        want = img[:, :, None] if img.ndim == 2 else img
        for pred in range(1, 8):
            for inter in (True, False):
                px = M._jpeg_pixels(
                    encode_jpeg_lossless(
                        img, predictor=pred, precision=prec,
                        interleaved=inter,
                    )
                )
                assert (
                    px.astype(np.int64) == want.astype(np.int64)
                ).all(), (shape, prec, pred, inter)

    edge = np.array([[0, 65535], [65535, 0]], dtype=np.uint16)
    px = M._jpeg_pixels(encode_jpeg_lossless(edge, predictor=1))
    assert (px[:, :, 0] == edge).all()

    img = rng.randint(0, 256, (9, 9), dtype=np.uint8)
    px = M._jpeg_pixels(
        encode_jpeg_lossless(img, predictor=7, point_transform=3)
    )
    assert (px[:, :, 0] == (img >> 3) << 3).all()

    # refusals: predictor 0, truncated component coverage, restarts
    b = bytearray(encode_jpeg_lossless(img, predictor=3))
    i = bytes(b).index(b"\xff\xda")
    ln = int.from_bytes(b[i + 2 : i + 4], "big")
    b[i + 2 + ln - 3] = 0  # Ss (predictor) byte -> 0
    with pytest.raises(ValueError, match="lossless JPEG scan header"):
        M._jpeg_pixels(bytes(b))
    tri = encode_jpeg_lossless(
        rng.randint(0, 256, (6, 6, 3), dtype=np.uint8), interleaved=False
    )
    second = tri.index(b"\xff\xda", tri.index(b"\xff\xda") + 2)
    third = tri.index(b"\xff\xda", second + 2)
    with pytest.raises(ValueError, match="omits scan data"):
        M._jpeg_pixels(tri[:third] + b"\xff\xd9")
