"""Multimodal plumbing: real header sniffing, real PNG/JPEG/GIF pixel
decode, honest-null policy for undecodable payloads, fan-out shapes,
size-balanced repartitioning."""

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
    # header-only stubs carry no pixel data: honest nulls, twice over
    # (determinism of the null policy); real payloads keep their shape
    df = _media_df(spark).where("kind = 'image'")
    a = {r["media_id"]: r["features"] for r in image_features(df).collect()}
    b = {r["media_id"]: r["features"] for r in image_features(df).collect()}
    assert a == b
    assert a[1] is None and a[2] is None  # no IDAT / no entropy data


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
    pixel-derived features."""
    from catalyst_spark.multimodal import image_features

    payload = encode_png([(255, 255, 255)] * 64, 8, 8)
    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=bytearray(payload))])
    (row,) = image_features(df).collect()
    assert row["features"] == [1.0] * 16


# ---------------------------------------------------------------------------
# WAV PCM: sample-derived audio features (stdlib struct, no audio libs)
# ---------------------------------------------------------------------------

def wav_pcm_bytes(samples, rate=16000, channels=1, bits=16) -> bytes:
    """A complete RIFF/WAVE file with an integer-PCM data chunk.
    `samples` is channel-interleaved."""
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 24:
        data = b"".join(
            int(s).to_bytes(3, "little", signed=True) for s in samples)
    else:
        data = struct.pack(f"<{len(samples)}i", *samples)
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_decode_pcm_bit_depths():
    from catalyst_spark.multimodal import _wav_decode_pcm

    rate, ch, bits, mono = _wav_decode_pcm(
        wav_pcm_bytes([1000, -1000, 0, 32767, -32768], bits=16))
    assert (rate, ch, bits) == (16000, 1, 16)
    assert mono == [1000, -1000, 0, 32767, -32768]

    _, _, _, mono = _wav_decode_pcm(wav_pcm_bytes([127, -128, 0, 64], bits=8))
    assert mono == [127, -128, 0, 64]

    _, _, _, mono = _wav_decode_pcm(
        wav_pcm_bytes([1 << 20, -(1 << 20)], bits=24))
    assert mono == [1 << 20, -(1 << 20)]

    # stereo mixes to per-frame channel sums, exact integers
    _, ch, _, mono = _wav_decode_pcm(
        wav_pcm_bytes([100, -40, -100, 40], channels=2, bits=16))
    assert ch == 2 and mono == [60, -60]


def test_audio_features_square_wave_exact(spark):
    """16-bit mono square wave: every feature lands on an exact value
    derivable by hand from the PCM samples."""
    from catalyst_spark.multimodal import audio_features

    amp, period, n = 16384, 8, 1600
    samples = [amp if (i % period) < period // 2 else -amp for i in range(n)]
    df = spark.createDataFrame(
        [Row(media_id=1, kind="audio",
             payload=bytearray(wav_pcm_bytes(samples, rate=16000)))],
        "media_id long, kind string, payload binary")
    r = audio_features(df).collect()[0]
    assert (r["sample_rate"], r["channels"], r["bit_depth"]) == (16000, 1, 16)
    assert r["n_frames"] == n
    assert r["duration_s"] == n / 16000
    assert r["peak"] == 0.5          # 16384 / 32768
    assert r["rms"] == 0.5           # constant magnitude
    # sign flips at i % 4 == 3 boundaries: i in {3, 7, ..., 1595} -> 399
    assert r["zero_crossing_rate"] == 399 / 1599


def test_audio_features_stereo_and_fallbacks(spark):
    from catalyst_spark.multimodal import audio_features

    # stereo alternating-sign left, silent right: mono sums alternate,
    # zcr exactly 1, peak/rms normalized by channels * 2^15
    samples = []
    for i in range(10):
        samples += [1000 if i % 2 == 0 else -1000, 0]
    rows = [
        Row(media_id=1, kind="audio",
            payload=bytearray(wav_pcm_bytes(samples, channels=2, bits=16))),
        Row(media_id=2, kind="audio", payload=bytearray(wav_bytes())),
        Row(media_id=3, kind="image", payload=bytearray(png_bytes())),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    st = got[1]
    assert st["channels"] == 2 and st["n_frames"] == 10
    assert st["peak"] == 1000 / 65536
    assert st["rms"] == 1000 / 65536
    assert st["zero_crossing_rate"] == 1.0
    # zero-length data chunk is a VALID empty PCM stream: zero frames,
    # zero duration, no sample-derived features; PNG -> all nulls
    assert got[2]["n_frames"] == 0 and got[2]["duration_s"] == 0.0
    assert got[2]["rms"] is None and got[2]["peak"] is None
    assert got[3]["sample_rate"] is None and got[3]["rms"] is None


# ---------------------------------------------------------------------------
# Audio energy-contour fingerprint + banded near-dup (r12)
# ---------------------------------------------------------------------------

def _contour_samples(seed_mul: int, seed_add: int, n: int = 6400):
    """Deterministic pseudo-audio with a non-trivial energy contour;
    every sample is a multiple of 4 so exact quarter-gain copies exist
    in integer PCM."""
    return [(((i * seed_mul + seed_add) % 211) - 105) * 4
            for i in range(n)]


def test_audio_fp64_gain_invariance_and_discrimination():
    from catalyst_spark.multimodal import _AFP_WINDOWS, _audio_fp64

    base = _contour_samples(37, 0)
    fp = _audio_fp64(base)
    assert fp is not None and 0 <= fp < (1 << (_AFP_WINDOWS - 1))
    # exact quarter gain: every energy scales by exactly 1/16, so every
    # strict comparison — and therefore every bit — is preserved
    assert _audio_fp64([v // 4 for v in base]) == fp
    # different material lands far away (deterministic inputs)
    other = _audio_fp64(_contour_samples(53, 17))
    assert bin(fp ^ other).count("1") > 10
    # too short for a 64-window contour -> honest None
    assert _audio_fp64([1] * (_AFP_WINDOWS - 1)) is None


def test_audio_fingerprint_dataframe_and_null_policy(spark):
    """The DataFrame op decodes REAL WAV bytes through the stdlib PCM
    path and must agree with the direct python fingerprint; broken or
    non-audio payloads get an honest null."""
    from catalyst_spark.multimodal import _audio_fp64, audio_fingerprint

    samples = _contour_samples(37, 0)
    rows = [
        Row(media_id=1, kind="audio",
            payload=bytearray(wav_pcm_bytes(samples, bits=16))),
        Row(media_id=2, kind="audio", payload=bytearray(b"not a wav")),
        Row(media_id=3, kind="image", payload=bytearray(png_bytes())),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert got[1] == _audio_fp64(samples)
    assert got[2] is None and got[3] is None


def test_audio_dup_pairs_banded_equals_brute(spark):
    """The shared 8-band join on audio fingerprints must reproduce the
    brute-force Hamming <= 7 pair set exactly (pigeonhole
    completeness on the audio rung; the registry op value-proves the
    same claim against DuckDB at driver scale)."""
    from catalyst_spark.multimodal import audio_dup_pairs

    import itertools

    fps = [(i, (0x0F0F0F0F0F0F0F0 ^ (i * 0x9E3779B97F4A7C1)) & ((1 << 63) - 1))
           for i in range(40)]
    # plant near dups: ids 100.. flip k contiguous bits of id 0's hash
    # (k = 0..9 straddles the <= 7 cut from both sides)
    base = fps[0][1]
    for k in range(10):
        fps.append((100 + k, base ^ (((1 << k) - 1) << (3 * k % 50))))
    fps.append((200, base ^ 0b11))  # Hamming 2 of id 0
    df = spark.createDataFrame(
        [Row(media_id=i, afp=h) for i, h in fps], "media_id long, afp long")
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in audio_dup_pairs(df).collect()}
    want = {}
    for (ia, ha), (ib, hb) in itertools.combinations(fps, 2):
        a, b = (ia, ib) if ia < ib else (ib, ia)
        d = bin(ha ^ hb).count("1")
        if d <= 7:
            want[(a, b)] = d
    assert got == want and (0, 200) in got and got[(0, 200)] == 2


# ---------------------------------------------------------------------------
# Baseline JPEG: DC-plane decode (pure stdlib, full Huffman entropy pass)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v, nbits):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:      # byte stuffing
                    self.buf.append(0x00)
                self.acc, self.n = 0, 0

    def done(self) -> bytes:
        while self.n:                     # pad with 1s
            self.write(1, 1)
        return bytes(self.buf)


def jpeg_gray_bytes(block_means, grid_w, grid_h, with_ac=False) -> bytes:
    """Minimal single-component baseline JPEG whose 8x8 blocks have
    EXACTLY the given means (DC quant 8 -> dc = mean - 128; flat AC).
    Custom canonical Huffman tables are emitted in the stream: DC
    symbols 0..7 as the 3-bit codes 000..111, AC symbols
    (EOB, 0x01, ZRL) as 2-bit codes. Means must lie in [1, 255]."""
    def seg(marker, body):
        return b"\xff" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body

    def canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[k]] = (length, code)
                k += 1
                code += 1
            code <<= 1
        return codes

    # DC: categories 0..8 (7 codes of len 3, 2 of len 4); AC: EOB,
    # (run 0, size 1), ZRL as 2-bit codes
    dc_bits, dc_vals = [0, 0, 7, 2] + [0] * 12, list(range(9))
    ac_bits, ac_vals = [0, 3] + [0] * 14, [0x00, 0x01, 0xF0]
    dc_code = canonical(dc_bits, dc_vals)
    ac_code = canonical(ac_bits, ac_vals)

    w, h = grid_w * 8, grid_h * 8
    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + bytes([8] + [1] * 63))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + dc_bits + dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits + ac_vals))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred = 0
    for mean in block_means:
        dc = int(mean) - 128
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()
        length, code = dc_code[t]                 # DC symbol == category
        bw.write(code, length)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        if with_ac:
            length, code = ac_code[0x01]          # AC (run 0, size 1)
            bw.write(code, length)
            bw.write(1, 1)                        # coefficient +1
        length, code = ac_code[0x00]              # EOB
        bw.write(code, length)
    return out + bw.done() + b"\xff\xd9"


def test_jpeg_dc_decode_exact_block_means():
    from catalyst_spark.multimodal import _jpeg_decode_gray_dc

    means = [10, 50, 90, 130, 170, 210, 250, 128, 64, 32, 16, 200]
    for with_ac in (False, True):
        payload = jpeg_gray_bytes(means, 4, 3, with_ac=with_ac)
        w, h, gw, gh, got = _jpeg_decode_gray_dc(payload)
        assert (w, h, gw, gh) == (32, 24, 4, 3)
        assert got == [float(m) for m in means], f"with_ac={with_ac}"


def test_jpeg_features_box_average():
    from catalyst_spark.multimodal import FEATURE_DIM, _jpeg_features

    # 4x4 grid of blocks -> each feature is exactly one block's mean
    means = [(i * 16 + 8) for i in range(16)]
    feats = _jpeg_features(jpeg_gray_bytes(means, 4, 4))
    assert feats is not None and len(feats) == FEATURE_DIM
    assert feats == [m / 127.5 - 1.0 for m in means]


def test_jpeg_features_rejects_non_baseline():
    from catalyst_spark.multimodal import _jpeg_features

    # progressive SOF2 must fall through to None, not decode garbage
    payload = jpeg_gray_bytes([100], 1, 1).replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert _jpeg_features(payload) is None
    assert _jpeg_features(b"\xff\xd8garbage") is None


def test_image_features_operator_uses_real_jpeg_path(spark):
    from catalyst_spark.multimodal import image_features, _HAVE_PIL

    if _HAVE_PIL:
        import pytest
        pytest.skip("PIL present: ladder prefers PIL for JPEG")
    means = [40] * 16
    df = spark.createDataFrame(
        [Row(media_id=9, kind="image",
             payload=bytearray(jpeg_gray_bytes(means, 4, 4)))],
        "media_id long, kind string, payload binary")
    [r] = image_features(df).collect()
    want = 40 / 127.5 - 1.0
    assert all(abs(f - want) < 1e-6 for f in r["features"])


# ---------------------------------------------------------------------------
# MP4/ISO-BMFF: real container parsing and sample extraction
# ---------------------------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def mp4_bytes(sample_payloads, w=640, h=360, timescale=1000, duration=2500,
              chunks=None) -> bytes:
    """Minimal spec-valid MP4: ftyp + moov(mvhd, trak(tkhd, mdia/minf/
    stbl(stsz, stsc, stco))) + mdat holding the given samples. `chunks`
    groups sample counts per chunk (default: all in one chunk)."""
    chunks = chunks or [len(sample_payloads)]
    assert sum(chunks) == len(sample_payloads)
    mvhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 8
            + struct.pack(">II", timescale, duration) + b"\x00" * 80)
    tkhd = (b"\x00" + b"\x00" * 3 + b"\x00" * 72
            + struct.pack(">II", w << 16, h << 16))
    stsz = (b"\x00" * 4 + struct.pack(">II", 0, len(sample_payloads))
            + b"".join(struct.pack(">I", len(s)) for s in sample_payloads))
    # stsc runs: chunk i (1-based) -> chunks[i-1] samples
    stsc_entries = b""
    n_runs = 0
    prev = None
    for i, c in enumerate(chunks):
        if c != prev:
            stsc_entries += struct.pack(">III", i + 1, c, 1)
            n_runs += 1
            prev = c
    stsc = b"\x00" * 4 + struct.pack(">I", n_runs) + stsc_entries
    # layout: [ftyp][moov][mdat] — compute mdat payload offsets
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    sizes = [len(s) for s in sample_payloads]
    # assemble moov with placeholder stco, then fix offsets (stco count
    # depends only on chunk count, so sizes are stable)
    def build(stco_offsets):
        stco = (b"\x00" * 4 + struct.pack(">I", len(stco_offsets))
                + b"".join(struct.pack(">I", o) for o in stco_offsets))
        stbl = _box(b"stsz", stsz) + _box(b"stsc", stsc) + _box(b"stco", stco)
        mdia = _box(b"minf", _box(b"stbl", stbl))
        trak = _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
        moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", trak))
        return moov

    moov_len = len(build([0] * len(chunks)))
    mdat_body = b"".join(sample_payloads)
    base = len(ftyp) + moov_len + 8  # mdat body starts after its header
    offsets, pos, s = [], base, 0
    for c in chunks:
        offsets.append(pos)
        pos += sum(sizes[s: s + c])
        s += c
    return ftyp + build(offsets) + _box(b"mdat", mdat_body)


def test_mp4_meta_and_sample_table():
    from catalyst_spark.multimodal import _mp4_meta, sniff_meta

    frames = [b"AAAA", b"BBBBBB", b"CC", b"DDDDD", b"E"]
    payload = mp4_bytes(frames, w=320, h=240, timescale=600, duration=1200,
                        chunks=[2, 3])
    m = _mp4_meta(payload)
    assert (m["width"], m["height"]) == (320, 240)
    assert m["duration_ms"] == 2000      # 1200 / 600 s
    assert m["n_samples"] == 5
    got = [payload[o: o + s] for o, s in m["_samples"]]
    assert got == frames                 # exact byte ranges via stsc/stco
    sm = sniff_meta(payload)
    assert (sm["format"], sm["width"], sm["height"]) == ("mp4", 320, 240)


def test_sample_frames_real_mp4_samples(spark):
    from catalyst_spark.multimodal import sample_frames

    frames = [bytes([65 + i]) * (i + 2) for i in range(10)]  # 10 samples
    df = spark.createDataFrame(
        [Row(media_id=5, kind="video",
             payload=bytearray(mp4_bytes(frames)))],
        "media_id long, kind string, payload binary")
    rows = sample_frames(df, every_n=3, max_frames=3).collect()
    assert [(r["frame_idx"], bytes(r["frame"])) for r in rows] == [
        (0, frames[0]), (3, frames[3]), (6, frames[6])
    ]


def test_video_frame_hashes_and_dup_pairs_real_mp4(spark):
    """The video near-dup primitive over REAL constructed MP4s (r12):
    a re-mux — the same codec sample payloads in a differently-sized
    container — must share its sampled-frame hashes with the original
    and pass the exact Jaccard >= 0.5 verify; unrelated material must
    produce no pair. Every sampled frame hash comes from the BMFF
    sample table, not container offsets."""
    from catalyst_spark.multimodal import video_dup_pairs, video_frame_hashes

    frames_a = [bytes([65 + i]) * 8 for i in range(12)]
    # the "re-mux": identical samples, one replaced — with every_n=3 /
    # max_frames=4 the sampler reads samples 0/3/6/9, so sets overlap
    # 3 of 4 (union 5): jaccard 600 permille, a dup
    frames_b = list(frames_a)
    frames_b[9] = b"Z" * 16
    # unrelated material: disjoint sample bytes
    frames_c = [bytes([100 + i]) * 8 for i in range(12)]
    df = spark.createDataFrame(
        [Row(media_id=i, kind="video", payload=bytearray(mp4_bytes(f)))
         for i, f in ((1, frames_a), (2, frames_b), (3, frames_c))],
        "media_id long, kind string, payload binary")
    fh = video_frame_hashes(df, every_n=3, max_frames=4)
    got = {r["media_id"]: r["frame_hashes"] for r in fh.collect()}
    assert len(got[1]) == 4 and len(set(got[1]) & set(got[2])) == 3
    assert not set(got[1]) & set(got[3])
    pairs = video_dup_pairs(fh).collect()
    assert [(r["a_id"], r["b_id"], r["n_shared"], r["n_union"],
             r["jaccard_permille"]) for r in pairs] == [(1, 2, 3, 5, 600)]


def test_mp4_lying_stsz_count_rejected(spark):
    """ADVICE r4: a truncated/lying stsz sample count must raise (and
    the frame sampler must fall back to the honest stub path), not
    fabricate 0-byte samples from short int.from_bytes slices."""
    import pytest as _pytest

    from catalyst_spark.multimodal import _mp4_meta, sample_frames

    frames = [b"AAAA", b"BBBBBB", b"CC"]
    payload = bytearray(mp4_bytes(frames))
    i = bytes(payload).index(b"stsz")
    # stsz body: 4B version/flags + 4B fixed + 4B count — inflate count
    struct.pack_into(">I", payload, i + 4 + 8, 1_000_000)
    with _pytest.raises(ValueError):
        _mp4_meta(bytes(payload))

    df = spark.createDataFrame(
        [Row(media_id=1, kind="video", payload=payload)],
        "media_id long, kind string, payload binary")
    rows = sample_frames(df, every_n=1000, max_frames=2).collect()
    # stub path: deterministic byte slices, never empty frames
    assert rows and all(len(bytes(r["frame"])) > 0 for r in rows)


# ---------------------------------------------------------------------------
# GIF: stdlib LZW pixel decode (replaces the last digest fake)
# ---------------------------------------------------------------------------

def gif_bytes(indices, w, h, palette, interlaced=False) -> bytes:
    """Minimal spec-valid GIF89a: header + LSD + global color table +
    image descriptor + LZW data encoded with a CLEAR before every pixel
    code (valid per spec; table never grows, so code width is fixed)."""
    assert len(indices) == w * h and len(palette) >= 2
    depth = max(2, (len(palette) - 1).bit_length())
    n_ct = 1 << depth
    pal = bytes(
        c for i in range(n_ct)
        for c in (palette[i] if i < len(palette) else (0, 0, 0)))
    lsd_packed = 0x80 | (depth - 1)  # GCT present, 2^depth entries
    hdr = (b"GIF89a" + struct.pack("<HH", w, h)
           + bytes([lsd_packed, 0, 0]) + pal)
    ipacked = 0x40 if interlaced else 0
    desc = b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
    clear, end = 1 << depth, (1 << depth) + 1
    code_size = depth + 1
    bits = []
    for p in indices:
        for code in (clear, p):
            for k in range(code_size):
                bits.append((code >> k) & 1)
    for k in range(code_size):
        bits.append((end >> k) & 1)
    data = bytearray()
    for i in range(0, len(bits), 8):
        data.append(sum(b << j for j, b in enumerate(bits[i: i + 8])))
    blocks = bytearray([depth])
    for i in range(0, len(data), 255):
        chunk = data[i: i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return hdr + desc + bytes(blocks) + b"\x3B"


def test_gif_decode_solid_and_quadrants():
    from catalyst_spark.multimodal import _gif_decode_gray, _gif_features

    # solid white 8x8
    g = gif_bytes([0] * 64, 8, 8, [(255, 255, 255), (0, 0, 0)])
    w, h, gray = _gif_decode_gray(g)
    assert (w, h) == (8, 8) and set(gray) == {255}
    assert _gif_features(g) == [1.0] * 16
    # left half red, right half green: luma via the integer formula
    idx = [0 if x < 4 else 1 for y in range(8) for x in range(8)]
    g2 = gif_bytes(idx, 8, 8, [(255, 0, 0), (0, 255, 0)])
    red, green = 255 * 299 // 1000, 255 * 587 // 1000
    f = _gif_features(g2)
    want = [red / 127.5 - 1.0] * 2 + [green / 127.5 - 1.0] * 2
    assert f == want * 4


def test_gif_interlaced_rows_reordered():
    from catalyst_spark.multimodal import _gif_decode_gray

    # 8 rows, each a solid index = its row number; interlaced storage
    # must come back in natural row order
    idx = [y for y in range(8) for _ in range(8)]
    pal = [(v * 30, v * 30, v * 30) for v in range(8)]
    # interlaced pass order for h=8: 0,4,2,6,1,3,5,7 — rows stored in
    # that order must decode back to natural order
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = [v for y in order for v in [idx[y * 8]] * 8]
    g = gif_bytes(stored, 8, 8, pal, interlaced=True)
    w, h, gray = _gif_decode_gray(g)
    lum = [(p * 30 * 299 + p * 30 * 587 + p * 30 * 114) // 1000
           for p in range(8)]
    assert [gray[y * 8] for y in range(8)] == lum


def test_image_features_honest_null_for_undecodable(spark):
    """VERDICT r4 item 6: no fake ever enters the feature column — a
    payload none of PNG/JPEG/GIF can decode yields NULL features (the
    audio path's policy)."""
    from catalyst_spark.multimodal import image_features

    df = spark.createDataFrame(
        [Row(media_id=9, kind="image", payload=bytearray(b"\x01\x02" * 100)),
         Row(media_id=10, kind="image",
             payload=bytearray(gif_bytes([0] * 16, 4, 4,
                                         [(0, 0, 0), (255, 255, 255)])))],
        "media_id long, kind string, payload binary")
    out = {r["media_id"]: r["features"] for r in image_features(df).collect()}
    assert out[9] is None
    assert out[10] == [-1.0] * 16


def test_no_fake_floats_left():
    """The clearly-marked fake is deleted — nothing in the module can
    fabricate feature values."""
    import inspect

    import catalyst_spark.multimodal as mm

    src = inspect.getsource(mm)
    assert "_fake_floats" not in src


# --- perceptual hash (pHash) image near-dup family ---

def _phash_pixels(w=32, h=32, seed=1):
    """Deterministic structured grayscale image: diagonal gradient plus
    a seed-placed bright rectangle (structure, not noise — pHash is a
    low-frequency hash, so the fixtures need low-frequency content)."""
    px = []
    rx, ry = 4 + (seed * 7) % 16, 4 + (seed * 11) % 16
    for y in range(h):
        for x in range(w):
            v = (x * 160 // w + y * 80 // h) % 256
            if rx <= x < rx + 8 and ry <= y < ry + 8:
                v = min(255, v + 90)
            px.append(v)
    return px


def test_phash_format_invariance_png_vs_gif():
    """The same pixel grid encoded as grayscale PNG and as GIF with an
    identity gray palette must hash IDENTICALLY — the hash is a pixel
    function, not a container function."""
    from catalyst_spark.multimodal import _decode_gray_grid, _phash64

    px = _phash_pixels()
    png = encode_png(px, 32, 32, color=0, filter_type=1)
    gif = gif_bytes(px, 32, 32, [(v, v, v) for v in range(256)])
    wp, hp, gp = _decode_gray_grid(png)
    wg, hg, gg = _decode_gray_grid(gif)
    assert (wp, hp) == (wg, hg) == (32, 32)
    assert list(gp) == list(gg)
    assert _phash64(wp, hp, gp) == _phash64(wg, hg, gg)


def test_phash_near_dup_close_distinct_far():
    from catalyst_spark.multimodal import _phash64

    base = _phash_pixels(seed=1)
    near = [min(255, v + 3) for v in base]      # mild brightness shift
    other = _phash_pixels(seed=5)               # different structure
    h_base = _phash64(32, 32, base)
    h_near = _phash64(32, 32, near)
    h_other = _phash64(32, 32, other)
    d_near = bin(h_base ^ h_near).count("1")
    d_other = bin(h_base ^ h_other).count("1")
    assert d_near <= 7, d_near       # survives the banded join budget
    assert d_other > 12, d_other     # distinct images stay far


def test_image_phash_and_dup_pairs_operator(spark):
    """End-to-end: planted near-dup pair found by the banded join,
    distinct image excluded, undecodable payload -> honest null hash
    (and silently absent from the pair join)."""
    from pyspark.sql import Row

    from catalyst_spark.multimodal import image_dup_pairs, image_phash

    base = _phash_pixels(seed=1)
    near = [min(255, v + 3) for v in base]
    other = _phash_pixels(seed=5)
    rows = [
        Row(media_id=1, payload=bytearray(encode_png(base, 32, 32, color=0))),
        Row(media_id=2, payload=bytearray(
            gif_bytes(near, 32, 32, [(v, v, v) for v in range(256)]))),
        Row(media_id=3, payload=bytearray(encode_png(other, 32, 32, color=0))),
        Row(media_id=4, payload=bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = {r["media_id"]: r["phash"] for r in image_phash(df).collect()}
    assert hashes[4] is None                       # honest null
    assert None not in (hashes[1], hashes[2], hashes[3])
    pairs = image_dup_pairs(image_phash(df)).collect()
    assert [(r["a_id"], r["b_id"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 7
    # plan shape: bucket equi-join, never an all-pairs cartesian
    plan = image_dup_pairs(image_phash(df))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
