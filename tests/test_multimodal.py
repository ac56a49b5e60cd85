"""Multimodal plumbing: real header sniffing, fake-decode determinism,
fan-out shapes, size-balanced repartitioning."""

from __future__ import annotations

import struct

from pyspark.sql import Row

from catalyst_spark.multimodal import (
    balance_by_size,
    extract_meta,
    image_features,
    sample_frames,
    sniff_meta,
    FEATURE_DIM,
)


def png_bytes(w=32, h=16) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00" * 8)


def jpeg_bytes(w=64, h=48) -> bytes:
    # SOI + APP0 stub + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + sof + b"\x00" * 4


def wav_bytes(rate=16000, channels=2, bits=16) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    return (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))


def test_sniff_meta_real_parsing():
    m = sniff_meta(png_bytes(640, 480))
    assert (m["format"], m["width"], m["height"]) == ("png", 640, 480)
    m = sniff_meta(jpeg_bytes(64, 48))
    assert (m["format"], m["width"], m["height"], m["channels"]) == ("jpeg", 64, 48, 3)
    m = sniff_meta(wav_bytes(44100, 1, 24))
    assert (m["format"], m["sample_rate"], m["channels"], m["bit_depth"]) == (
        "wav", 44100, 1, 24)
    assert sniff_meta(b"garbage")["format"] == "unknown"


def _media_df(spark):
    rows = [
        Row(media_id=1, kind="image", payload=bytearray(png_bytes())),
        Row(media_id=2, kind="image", payload=bytearray(jpeg_bytes())),
        Row(media_id=3, kind="audio", payload=bytearray(wav_bytes())),
        Row(media_id=4, kind="video", payload=bytearray(b"\x00" * 200)),
    ]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")


def test_extract_meta_dataframe(spark):
    out = {r["media_id"]: r for r in extract_meta(_media_df(spark)).collect()}
    assert out[1]["format"] == "png" and out[1]["width"] == 32
    assert out[2]["format"] == "jpeg" and out[2]["height"] == 48
    assert out[3]["sample_rate"] == 16000
    assert out[4]["format"] == "unknown" and out[4]["n_bytes"] == 200


def test_image_features_shape_and_determinism(spark):
    df = _media_df(spark).where("kind = 'image'")
    a = {r["media_id"]: r["features"] for r in image_features(df).collect()}
    b = {r["media_id"]: r["features"] for r in image_features(df).collect()}
    assert a == b  # deterministic fake
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(-1.0 <= x <= 1.0 for v in a.values() for x in v)
    assert a[1] != a[2]


def test_sample_frames_fanout(spark):
    df = _media_df(spark).where("kind = 'video'")
    rows = sample_frames(df, every_n=50, max_frames=4).collect()
    assert len(rows) == 4
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert all(len(r["frame"]) > 0 for r in rows)


def test_balance_by_size(spark):
    df = _media_df(spark)
    out = balance_by_size(df, 2)
    assert out.rdd.getNumPartitions() == 2
    assert sorted(r["media_id"] for r in out.collect()) == [1, 2, 3, 4]


def test_balance_by_size_separates_largest(spark):
    # size-striping must put the two largest payloads in different
    # partitions (range-partitioning on size clusters them — the
    # straggler anti-pattern this function exists to avoid)
    rows = [
        Row(media_id=i, kind="blob", payload=bytearray(b"x" * sz))
        for i, sz in enumerate([800, 700, 60, 50, 40, 30, 20, 10])
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    parts = balance_by_size(df, 2).rdd.glom().collect()
    sums = [sum(len(r["payload"]) for r in p) for p in parts]
    assert len(sums) == 2 and min(sums) > 0
    # 800 and 700 split apart -> no partition carries both
    assert max(sums) <= 800 + 60 + 40 + 20  # straggler bound, not 1500


def test_image_features_real_decode_with_pil(spark):
    import pytest

    PIL = pytest.importorskip("PIL")
    import io

    from PIL.Image import new as pil_new

    buf = io.BytesIO()
    pil_new("RGB", (8, 8), color=(255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=bytearray(buf.getvalue()))],
        "media_id long, kind string, payload binary",
    )
    feats = image_features(df).collect()[0]["features"]
    assert len(feats) == FEATURE_DIM
    assert all(-1.0 <= x <= 1.0 for x in feats)


# --- real PNG pixel decode (no PIL): encoder below writes spec-valid
# PNGs with a CHOSEN scanline filter so every unfilter branch is hit.

def _chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib as _z
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(pixels, w, h, color=2, filter_type=0) -> bytes:
    """Minimal spec-correct PNG writer. pixels = row-major tuples (or
    ints for gray); the requested filter is APPLIED (delta-encoded) so
    decoding must actually undo it."""
    import zlib as _z

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    stride = w * channels
    flat = []
    for px in pixels:
        flat.extend((px,) if isinstance(px, int) else tuple(px))
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        line = bytearray(flat[y * stride:(y + 1) * stride])
        enc = bytearray(line)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b, c = prev[i], (prev[i - channels] if i >= channels else 0)
            if filter_type == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif filter_type == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif filter_type == 3:
                enc[i] = (line[i] - ((a + b) >> 1)) & 0xFF
            elif filter_type == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw.append(filter_type)
        raw.extend(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", _z.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def test_png_decode_pixel_features_no_pil():
    """Features must be PIXEL-derived: solid white -> all 1.0; a
    half-black/half-white image -> -1.0 cells left, 1.0 cells right."""
    from catalyst_spark.multimodal import _png_features

    white = encode_png([(255, 255, 255)] * 64, 8, 8)
    assert _png_features(white) == [1.0] * 16

    split = [((0, 0, 0) if x < 4 else (255, 255, 255))
             for _y in range(8) for x in range(8)]
    f = _png_features(encode_png(split, 8, 8))
    assert f is not None
    for i, v in enumerate(f):
        assert v == (-1.0 if i % 4 < 2 else 1.0)


def test_png_unfilter_all_filter_types():
    """The same image encoded under Sub/Up/Average/Paeth must decode to
    identical features as the filter-0 encoding."""
    from catalyst_spark.multimodal import _png_features

    import random
    rng = random.Random(7)
    img = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(12 * 10)]
    base = _png_features(encode_png(img, 12, 10, filter_type=0))
    assert base is not None
    for ft in (1, 2, 3, 4):
        assert _png_features(encode_png(img, 12, 10, filter_type=ft)) == base


def test_png_gray_and_rgba_colortypes():
    from catalyst_spark.multimodal import _png_features

    gray = encode_png([128] * 16, 4, 4, color=0)
    f = _png_features(gray)
    assert f is not None and all(abs(v - (128 / 127.5 - 1)) < 1e-9 for v in f)
    rgba = encode_png([(10, 200, 30, 255)] * 16, 4, 4, color=6)
    f2 = _png_features(rgba)
    luma = (10 * 299 + 200 * 587 + 30 * 114) // 1000
    assert f2 is not None and all(abs(v - (luma / 127.5 - 1)) < 1e-9 for v in f2)


def test_image_features_operator_uses_real_png_path(spark):
    """End-to-end through mapInPandas: a decodable PNG yields the
    pixel-derived features, NOT the digest fake."""
    from catalyst_spark.multimodal import _fake_floats, image_features

    payload = encode_png([(255, 255, 255)] * 64, 8, 8)
    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=bytearray(payload))])
    (row,) = image_features(df).collect()
    assert row["features"] == [1.0] * 16
    assert row["features"] != _fake_floats(payload, 16, "imgfeat")
