"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline treats media as `binary` payload columns
with a typed metadata struct, processed by Arrow-batched pandas
transforms over mapInPandas (the decode libraries run inside the worker
batch loop; Spark handles partitioning/shuffle/recovery).

What is REAL here (tested, no external libs):
- container metadata sniffing straight off the payload bytes: PNG IHDR
  width/height, JPEG SOFn dimensions, MP4 mvhd/tkhd, WAV fmt chunk
  (channels, sample rate, bit depth), magic-number kind detection;
- pixel decode for PNG (stdlib zlib inflate + scanline unfilter),
  baseline JPEG (full Huffman entropy decode, dequantized DC plane),
  and GIF (LZW decompression + color-table luma) — image_features on
  all three is real pixel math;
- WAV PCM sample-derived audio features; MP4 sample-table frame
  slicing (stsz/stsc/stco byte ranges);
- the Spark plumbing: schemas, mapInPandas signatures, Arrow batch
  shapes, balanced repartitioning by payload size.

What is honestly ABSENT (this container ships no PIL/ffmpeg — the
optional real decoders sit behind an import-try):
- payloads no stdlib path can decode (e.g. progressive JPEG, video
  codecs) yield NULL features / stub frame slices, never fabricated
  values; with PIL installed the same entry points decode those
  formats for real.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # the real decoder, if the environment provides it
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video | unknown
    T.StructField("payload", T.BinaryType()),
])

META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),     # png | jpeg | wav | unknown
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])

FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])

AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zero_crossing_rate", T.DoubleType()),
])


# ---------------------------------------------------------------------------
# real byte-level metadata sniffing
# ---------------------------------------------------------------------------

def sniff_meta(payload: bytes) -> dict:
    """Parse container headers directly (public file-format specs)."""
    meta = {"format": "unknown", "width": None, "height": None,
            "channels": None, "sample_rate": None, "bit_depth": None}
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        meta["format"] = "png"
        # IHDR is always first: length(4) 'IHDR'(4) width(4) height(4)
        meta["width"], meta["height"] = struct.unpack(">II", payload[16:24])
    elif payload[:2] == b"\xff\xd8":
        meta["format"] = "jpeg"
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn
                meta["height"], meta["width"] = struct.unpack(
                    ">HH", payload[i + 5: i + 9])
                meta["channels"] = payload[i + 9]
                break
            seg_len = struct.unpack(">H", payload[i + 2: i + 4])[0]
            i += 2 + seg_len
    elif len(payload) >= 12 and payload[4:8] == b"ftyp":
        try:
            m = _mp4_meta(payload)
        except Exception:
            return meta
        meta.update(format="mp4", width=m["width"], height=m["height"])
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        meta["format"] = "wav"
        i = 12
        while i + 8 <= len(payload):
            chunk_id = payload[i: i + 4]
            chunk_len = struct.unpack("<I", payload[i + 4: i + 8])[0]
            if chunk_id == b"fmt " and i + 24 <= len(payload):
                (_afmt, channels, rate) = struct.unpack(
                    "<HHI", payload[i + 8: i + 16])
                bits = struct.unpack("<H", payload[i + 22: i + 24])[0]
                meta.update(channels=channels, sample_rate=rate, bit_depth=bits)
                break
            i += 8 + chunk_len + (chunk_len & 1)
    return meta


def extract_meta(df: DataFrame) -> DataFrame:
    """media rows -> typed metadata (real header parsing, Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over columns, not iterrows: per-row Series construction
            # costs ~10x the byte sniffing itself on large Arrow batches
            for mid, kind, raw in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
                payload = bytes(raw)
                m = sniff_meta(payload)
                out.append({
                    "media_id": mid,
                    "kind": kind,
                    **m,
                    "n_bytes": len(payload),
                })
            yield pd.DataFrame(out, columns=[f.name for f in META_SCHEMA.fields])

    return df.mapInPandas(run, META_SCHEMA)


# ---------------------------------------------------------------------------
# stdlib GIF decode (LZW) — the third real pixel path after PNG/JPEG
# ---------------------------------------------------------------------------

def _gif_lzw(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decompression (GIF89a spec appendix F): LSB-first
    variable-width codes, CLEAR resets the table, code width grows when
    the table fills, capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([k]) for k in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos, nbits = 0, len(data) * 8
    while True:
        if bitpos + code_size > nbits:
            raise ValueError("truncated LZW stream")
        v = 0
        for k in range(code_size):
            v |= ((data[(bitpos + k) >> 3] >> ((bitpos + k) & 7)) & 1) << k
        bitpos += code_size
        if v == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if v == end:
            return bytes(out)
        if prev is None:
            if v >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[v]
        elif v < len(table):
            entry = table[v]
            table.append(prev + entry[:1])
        elif v == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1


def _gif_decode_gray(payload: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib GIF decode of the FIRST image to 8-bit grayscale
    (row-major), color-table lookup + integer luma, interlace-aware.
    Raises on non-GIF or malformed payloads."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = payload[10]
    i, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[13: 13 + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        i = 13 + 3 * n
    while i < len(payload) and payload[i] == 0x21:  # extensions
        i += 2
        while payload[i] != 0:
            i += 1 + payload[i]
        i += 1
    if i >= len(payload) or payload[i] != 0x2C:
        raise ValueError("no image descriptor")
    iw = int.from_bytes(payload[i + 5: i + 7], "little")
    ih = int.from_bytes(payload[i + 7: i + 9], "little")
    ipacked = payload[i + 9]
    i += 10
    ct = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 7)
        ct = payload[i: i + 3 * n]
        if len(ct) < 3 * n:
            raise ValueError("truncated local color table")
        i += 3 * n
    if not iw or not ih or ct is None:
        raise ValueError("empty image or missing color table")
    min_code_size = payload[i]
    i += 1
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad LZW minimum code size")
    data = bytearray()
    while i < len(payload) and payload[i] != 0:
        ln = payload[i]
        data += payload[i + 1: i + 1 + ln]
        i += 1 + ln
    idx = _gif_lzw(bytes(data), min_code_size)
    if len(idx) < iw * ih:
        raise ValueError("short pixel data")
    lut = [
        (ct[3 * k] * 299 + ct[3 * k + 1] * 587 + ct[3 * k + 2] * 114) // 1000
        for k in range(len(ct) // 3)
    ]
    if ipacked & 0x40:  # interlaced: 4-pass row order
        order = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                 + list(range(2, ih, 4)) + list(range(1, ih, 2)))
    else:
        order = list(range(ih))
    gray = [0] * (iw * ih)
    for k, y in enumerate(order):
        row = idx[k * iw: (k + 1) * iw]
        for x, p in enumerate(row):
            if p >= len(lut):
                raise ValueError("pixel index beyond color table")
            gray[y * iw + x] = lut[p]
    return iw, ih, gray


def _gif_features(payload: bytes) -> list[float] | None:
    """GIF -> 4x4 box-averaged grayscale thumbnail in [-1, 1], same
    convention as the PNG path."""
    try:
        w, h, gray = _gif_decode_gray(payload)
    except Exception:
        return None
    return _box4_gray(w, h, gray)


def _png_decode_gray(payload: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib PNG decode to 8-bit grayscale pixels (row-major).

    Implements the PNG spec directly (public format: RFC 2083): chunk
    walk, IHDR geometry, IDAT concat + zlib inflate, per-scanline
    unfilter (None/Sub/Up/Average/Paeth), then ITU-R 601-2 luma for
    color images — so PNG features are REAL pixel math in this
    container, no PIL needed. Supports the mainline encodings
    (8-bit depth, gray / gray+alpha / RGB / RGBA, non-interlaced);
    anything else raises and the caller falls back.
    """
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos: pos + 4])
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise ValueError("unsupported PNG encoding")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG data")
    gray: list[int] = []
    prev = bytearray(stride)
    off = 0
    for _y in range(h):
        ftype = raw[off]
        line = bytearray(raw[off + 1: off + 1 + stride])
        off += 1 + stride
        if ftype == 1:    # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b, c = prev[i], (prev[i - channels] if i >= channels else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        if channels in (1, 2):      # gray / gray+alpha
            gray.extend(line[0::channels])
        else:                       # RGB / RGBA -> 601-2 luma
            gray.extend(
                (line[i] * 299 + line[i + 1] * 587 + line[i + 2] * 114) // 1000
                for i in range(0, stride, channels)
            )
        prev = line
    return w, h, gray


def _png_features(payload: bytes) -> list[float] | None:
    """PNG -> 4x4 box-averaged grayscale thumbnail, scaled to [-1, 1]
    (FEATURE_DIM floats) — the pixel-real no-dependency path."""
    try:
        w, h, gray = _png_decode_gray(payload)
    except Exception:
        return None
    return _box4_gray(w, h, gray)


def _box4_gray(w: int, h: int, gray: list[int]) -> list[float]:
    """4x4 box average of a row-major 8-bit grayscale image, each cell
    scaled to [-1, 1] — the shared thumbnail convention of the PNG and
    GIF pixel paths."""
    feats = []
    for by in range(4):
        y0, y1 = by * h // 4, max((by + 1) * h // 4, by * h // 4 + 1)
        y0, y1 = min(y0, h - 1), min(y1, h)
        for bx in range(4):
            x0, x1 = bx * w // 4, max((bx + 1) * w // 4, bx * w // 4 + 1)
            x0, x1 = min(x0, w - 1), min(x1, w)
            tot = n = 0
            for y in range(y0, max(y1, y0 + 1)):
                row = y * w
                for x in range(x0, max(x1, x0 + 1)):
                    tot += gray[row + x]
                    n += 1
            feats.append(tot / n / 127.5 - 1.0)
    return feats


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate ISO-BMFF boxes in data[start:end] as (type, body_start,
    box_end) — public container spec (ISO/IEC 14496-12): 4-byte size +
    4-byte type, size 1 = 64-bit largesize, size 0 = to-end."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(data[i: i + 4], "big")
        btype = data[i + 4: i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                break
            size = int.from_bytes(data[i + 8: i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            break
        yield btype, i + hdr, i + size
        i += size


def _mp4_find(data: bytes, start: int, end: int, *path: bytes):
    """Descend a box path (e.g. moov/trak/mdia/minf/stbl); yields the
    (body_start, box_end) of every box matching the full path."""
    if not path:
        yield start, end
        return
    for btype, bs, be in _mp4_boxes(data, start, end):
        if btype == path[0]:
            yield from _mp4_find(data, bs, be, *path[1:])


def _mp4_meta(payload: bytes) -> dict:
    """Real MP4/ISO-BMFF metadata + sample table from the container
    boxes: mvhd timescale/duration, tkhd 16.16 track dimensions, and
    per-sample (offset, size) resolved through stsz + stsc + stco/co64
    — everything a frame sampler needs WITHOUT decoding any codec.
    Raises on non-BMFF payloads."""
    n = len(payload)
    tops = {t: (bs, be) for t, bs, be in _mp4_boxes(payload, 0, n)}
    if b"ftyp" not in tops or b"moov" not in tops:
        raise ValueError("not an ISO-BMFF file")
    moov = tops[b"moov"]
    meta: dict = {"format": "mp4", "duration_ms": None,
                  "width": None, "height": None}
    for bs, be in _mp4_find(payload, *moov, b"mvhd"):
        ver = payload[bs]
        if ver == 1:
            tscale = int.from_bytes(payload[bs + 20: bs + 24], "big")
            dur = int.from_bytes(payload[bs + 24: bs + 32], "big")
        else:
            tscale = int.from_bytes(payload[bs + 12: bs + 16], "big")
            dur = int.from_bytes(payload[bs + 16: bs + 20], "big")
        if tscale:
            meta["duration_ms"] = dur * 1000 // tscale
        break
    samples: list[tuple[int, int]] = []
    for trak_bs, trak_be in _mp4_find(payload, *moov, b"trak"):
        for bs, be in _mp4_find(payload, trak_bs, trak_be, b"tkhd"):
            # width/height are the last 8 bytes of tkhd in v0 and v1
            w16 = int.from_bytes(payload[be - 8: be - 4], "big")
            h16 = int.from_bytes(payload[be - 4: be], "big")
            if w16 and meta["width"] is None:
                meta["width"], meta["height"] = w16 >> 16, h16 >> 16
        if samples:
            continue  # sample table: first trak that has one
        for st_bs, st_be in _mp4_find(
            payload, trak_bs, trak_be, b"mdia", b"minf", b"stbl"
        ):
            boxes = {t: (bs, be) for t, bs, be in
                     _mp4_boxes(payload, st_bs, st_be)}
            if b"stsz" not in boxes:
                continue
            bs, be = boxes[b"stsz"]
            if bs + 12 > be:
                raise ValueError("truncated stsz header")
            fixed = int.from_bytes(payload[bs + 4: bs + 8], "big")
            count = int.from_bytes(payload[bs + 8: bs + 12], "big")
            # a lying/truncated count would make int.from_bytes consume
            # short slices and fabricate 0-byte samples — validate the
            # entry array fits the box and let the honest-fallback path
            # handle the payload instead (ADVICE r4)
            if not fixed and bs + 12 + 4 * count > be:
                raise ValueError("stsz entry array exceeds box end")
            if fixed:
                sizes = [fixed] * count
            else:
                sizes = [
                    int.from_bytes(payload[bs + 12 + 4 * k: bs + 16 + 4 * k],
                                   "big")
                    for k in range(count)
                ]
            offs: list[int] = []
            if b"stco" in boxes or b"co64" in boxes:
                key, width = (b"stco", 4) if b"stco" in boxes else (b"co64", 8)
                cs, ce = boxes[key]
                cn = int.from_bytes(payload[cs + 4: cs + 8], "big")
                if cs + 8 + width * cn > ce:
                    raise ValueError(f"{key.decode()} entries exceed box end")
                offs = [
                    int.from_bytes(
                        payload[cs + 8 + width * k: cs + 8 + width * (k + 1)],
                        "big")
                    for k in range(cn)
                ]
            # sample-to-chunk: run-length entries (first_chunk, per_chunk)
            runs: list[tuple[int, int]] = []
            if b"stsc" in boxes:
                cs, ce = boxes[b"stsc"]
                en = int.from_bytes(payload[cs + 4: cs + 8], "big")
                if cs + 8 + 12 * en > ce:
                    raise ValueError("stsc entries exceed box end")
                for k in range(en):
                    o = cs + 8 + 12 * k
                    runs.append((
                        int.from_bytes(payload[o: o + 4], "big"),
                        int.from_bytes(payload[o + 4: o + 8], "big"),
                    ))
            if not runs:
                runs = [(1, max(1, count))]
            s = 0
            for ci, chunk_off in enumerate(offs):
                per = next(
                    (pc for fc, pc in reversed(runs) if fc <= ci + 1),
                    runs[0][1],
                )
                pos = chunk_off
                for _ in range(per):
                    if s >= count:
                        break
                    samples.append((pos, sizes[s]))
                    pos += sizes[s]
                    s += 1
    meta["n_samples"] = len(samples)
    meta["_samples"] = samples
    return meta


def _jpeg_decode_gray_dc(payload: bytes) -> tuple[int, int, int, int, list[float]]:
    """Pure-stdlib baseline-JPEG decode of the luma DC plane (public
    format: ITU-T T.81). Full segment walk (DQT/DHT/SOF0/DRI/SOS),
    canonical Huffman decode of the entropy-coded scan — every DC and
    AC coefficient is entropy-decoded — but only the DC terms are kept:
    the dequantized DC of an 8x8 block IS 8x its pixel mean (the IDCT's
    constant basis), so block means come out EXACTLY without any IDCT.
    A w/8 x h/8 mean-map is all a thumbnail featurizer needs.

    Returns (width, height, grid_w, grid_h, block_means) with means on
    the 0..255 luma scale. Baseline sequential (SOF0/SOF1) only;
    progressive/arithmetic raise and the caller falls back.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    i = 2
    scan_comps = None
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("marker desync")
        m = payload[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            raise ValueError("EOI before SOS")
        seg_len = struct.unpack(">H", payload[i + 2: i + 4])[0]
        body = payload[i + 4: i + 2 + seg_len]
        if m == 0xDB:                      # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq:
                    qt[tq] = list(struct.unpack(f">64H", body[j: j + 128]))
                    j += 128
                else:
                    qt[tq] = list(body[j: j + 64])
                    j += 64
        elif m == 0xC4:                    # DHT (possibly several tables)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1: j + 17])
                j += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = body[j]
                        j += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif m in (0xC0, 0xC1):            # SOF0/SOF1: baseline
            _prec, h, w = struct.unpack(">BHH", body[:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c: 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (w, h, comps)
        elif m in (0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG")
        elif m == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif m == 0xDA:                    # SOS — entropy data follows
            ns = body[0]
            scan_comps = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                           body[2 + 2 * c] & 0x0F) for c in range(ns)]
            i += 2 + seg_len
            break
        i += 2 + seg_len
    if sof is None or scan_comps is None:
        raise ValueError("missing SOF/SOS")
    w, h, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # bit reader over the entropy segment: FF00 unstuffing, RSTn resets
    data = payload
    pos = i
    bitbuf = 0
    bitcnt = 0

    def read_bit() -> int:
        nonlocal pos, bitbuf, bitcnt
        if bitcnt == 0:
            if pos >= len(data):
                raise ValueError("truncated scan")
            b = data[pos]
            pos += 1
            if b == 0xFF:
                nxt = data[pos] if pos < len(data) else 0xD9
                if nxt == 0x00:
                    pos += 1
                else:
                    raise ValueError("marker inside scan")
            bitbuf, bitcnt = b, 8
        bitcnt -= 1
        return (bitbuf >> bitcnt) & 1

    def read_bits(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | read_bit()
        return v

    def decode_sym(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | read_bit()
            s = table.get((length, code))
            if s is not None:
                return s
        raise ValueError("bad huffman code")

    def extend(v: int, t: int) -> int:
        return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

    def sync_restart() -> None:
        nonlocal pos, bitcnt
        bitcnt = 0
        while pos + 1 < len(data) and not (
            data[pos] == 0xFF and 0xD0 <= data[pos + 1] <= 0xD7
        ):
            pos += 1
        pos += 2

    # component id -> (dc table, ac table) from the scan header
    tables = {cs: (huff[(0, td)], huff[(1, ta)]) for cs, td, ta in scan_comps}
    y_cid, y_h, y_v, y_tq = comps[0]
    grid_w, grid_h = mcus_x * y_h, mcus_y * y_v
    dc_q = qt[y_tq][0]
    means = [0.0] * (grid_w * grid_h)
    pred = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                sync_restart()
                pred = {cid: 0 for cid, _, _, _ in comps}
            for cid, ch, cv, _tq in comps:
                dc_t, ac_t = tables[cid]
                for by in range(cv):
                    for bx in range(ch):
                        t = decode_sym(dc_t)
                        diff = extend(read_bits(t), t) if t else 0
                        pred[cid] += diff
                        if cid == y_cid:
                            gx, gy = mx * ch + bx, my * cv + by
                            mean = pred[cid] * dc_q / 8.0 + 128.0
                            means[gy * grid_w + gx] = min(255.0, max(0.0, mean))
                        k = 1
                        while k < 64:      # AC: decode to advance, discard
                            rs = decode_sym(ac_t)
                            if rs == 0x00:             # EOB
                                break
                            if rs == 0xF0:             # ZRL
                                k += 16
                                continue
                            k += (rs >> 4) + 1
                            read_bits(rs & 0x0F)
            mcu_count += 1
    return w, h, grid_w, grid_h, means


def _jpeg_features(payload: bytes) -> list[float] | None:
    """JPEG -> 4x4 box-averaged luma means from the DC plane, scaled to
    [-1, 1] — pixel-REAL features (the DC term is exact block-mean
    math), no dependencies. None on non-baseline/corrupt input."""
    try:
        w, h, gw, gh, means = _jpeg_decode_gray_dc(payload)
    except Exception:
        return None
    # the DC grid can overhang the true image by partial blocks; crop
    # the grid to blocks whose origin is inside the image
    use_w, use_h = max(1, (w + 7) // 8), max(1, (h + 7) // 8)
    use_w, use_h = min(use_w, gw), min(use_h, gh)
    feats = []
    for by in range(4):
        y0, y1 = by * use_h // 4, max((by + 1) * use_h // 4, by * use_h // 4 + 1)
        y0, y1 = min(y0, use_h - 1), min(y1, use_h)
        for bx in range(4):
            x0, x1 = bx * use_w // 4, max((bx + 1) * use_w // 4, bx * use_w // 4 + 1)
            x0, x1 = min(x0, use_w - 1), min(x1, use_w)
            tot = n = 0.0
            for y in range(y0, max(y1, y0 + 1)):
                for x in range(x0, max(x1, x0 + 1)):
                    tot += means[y * gw + x]
                    n += 1
            feats.append(tot / n / 127.5 - 1.0)
    return feats


def _wav_decode_pcm(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Pure-stdlib WAV PCM decode (public RIFF/WAVE spec): chunk walk,
    fmt geometry, integer PCM frames mixed to mono by per-frame channel
    SUM (kept as exact integers; normalization happens once in the
    feature math). Returns (sample_rate, channels, bit_depth,
    mono_sums). Supports integer PCM at 8/16/24/32 bits; anything else
    (float PCM, ADPCM, truncated) raises and the caller emits nulls —
    the same honest-fallback policy as the PNG path.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i: i + 4]
        clen = struct.unpack("<I", payload[i + 4: i + 8])[0]
        body = payload[i + 8: i + 8 + clen]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    afmt, channels, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if afmt != 1 or channels < 1 or bits not in (8, 16, 24, 32):
        raise ValueError("not integer PCM")
    step = bits // 8
    n_frames = len(data) // (step * channels)
    usable = n_frames * step * channels
    if bits == 8:        # unsigned, center at 128
        vals = [b - 128 for b in data[:usable]]
    elif bits == 16:
        vals = list(struct.unpack(f"<{usable // 2}h", data[:usable]))
    elif bits == 32:
        vals = list(struct.unpack(f"<{usable // 4}i", data[:usable]))
    else:                # 24-bit signed little-endian, no struct code
        vals = [
            int.from_bytes(data[j: j + 3], "little", signed=True)
            for j in range(0, usable, 3)
        ]
    if channels == 1:
        mono = vals
    else:
        mono = [
            sum(vals[k * channels: (k + 1) * channels])
            for k in range(n_frames)
        ]
    return rate, channels, bits, mono


def audio_features(df: DataFrame) -> DataFrame:
    """audio payloads -> sample-derived features: duration, RMS, peak,
    zero-crossing rate — all computed from REAL decoded PCM samples
    (stdlib struct; no audio libraries), the audio twin of the
    pure-stdlib PNG pixel path. Integer sample math throughout
    (per-frame channel sums, sum of squares); floats appear only in
    the final normalizations by channels * 2^(bits-1). Non-PCM or
    non-WAV payloads yield null feature columns rather than fakes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                row = {f.name: None for f in AUDIO_SCHEMA.fields}
                row["media_id"] = mid
                try:
                    rate, channels, bits, mono = _wav_decode_pcm(bytes(raw))
                except Exception:
                    out.append(row)
                    continue
                n = len(mono)
                full = float(channels * (1 << (bits - 1)))
                row.update(
                    sample_rate=rate, channels=channels, bit_depth=bits,
                    n_frames=n,
                    duration_s=(n / rate) if rate else None,
                )
                if n:
                    row["rms"] = (sum(v * v for v in mono) / n) ** 0.5 / full
                    row["peak"] = max(abs(v) for v in mono) / full
                    row["zero_crossing_rate"] = (
                        sum(
                            1 for a, b in zip(mono, mono[1:]) if (a < 0) != (b < 0)
                        ) / (n - 1) if n > 1 else 0.0
                    )
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return df.mapInPandas(run, AUDIO_SCHEMA)


AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("afp", T.LongType()),
])

# energy-contour fingerprint geometry: 64 windows -> 63 comparison bits
_AFP_WINDOWS = 64


def _audio_fp64(mono: list[int]) -> int | None:
    """63-bit energy-contour fingerprint from decoded integer PCM (the
    Haitsma-Kalker robust-hash shape reduced to one band): split the
    mono stream into 64 equal windows, compute each window's EXACT
    integer energy (sum of squared per-frame channel sums — python
    ints, no overflow, no float), and emit bit i = 1 iff
    E[i+1] > E[i]. Monotone comparisons of energies make the bits
    invariant to uniform gain (every energy scales by the same c^2),
    the audio analogue of pHash's median-thresholding brightness
    invariance; re-encodes and volume normalization keep a small
    Hamming distance while different material lands ~32 bits apart.
    Returns None for streams shorter than the window count (no
    non-degenerate contour exists). Always fits a signed long."""
    n = len(mono)
    if n < _AFP_WINDOWS:
        return None
    bounds = [(k * n) // _AFP_WINDOWS for k in range(_AFP_WINDOWS + 1)]
    e = [
        sum(v * v for v in mono[bounds[k]: bounds[k + 1]])
        for k in range(_AFP_WINDOWS)
    ]
    bits = 0
    for i in range(_AFP_WINDOWS - 1):
        if e[i + 1] > e[i]:
            bits |= 1 << i
    return bits


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """audio payloads -> 63-bit energy-contour fingerprint
    (media_id, afp) — the audio near-dup primitive completing the
    text/image/audio triad (r12): decode rides the same pure-stdlib
    WAV PCM path as audio_features; undecodable or too-short payloads
    get an honest null, never a fabricated hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                afp = None
                try:
                    _, _, _, mono = _wav_decode_pcm(bytes(raw))
                    afp = _audio_fp64(mono)
                except Exception:
                    afp = None
                out.append({"media_id": mid, "afp": afp})
            yield pd.DataFrame(out, columns=["media_id", "afp"])

    return df.mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_dup_pairs(fp_df: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Banded near-dup join over audio fingerprints — the audio
    instance of _hamming_band_pairs (pigeonhole-complete for
    Hamming <= 7), the third member of the near-dup triad next to
    dedup_simhash_pairs (text) and image_dup_pairs (images)."""
    return _hamming_band_pairs(fp_df, "afp", max_hamming)


def _pil_features(payload: bytes) -> list[float]:
    """Real decode path: 4x4 grayscale thumbnail, pixels scaled to
    [-1, 1] — FEATURE_DIM (16) floats. Runs only when PIL is present."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        gray = img.convert("L").resize((4, 4))
        return [p / 127.5 - 1.0 for p in gray.getdata()]


def image_features(df: DataFrame) -> DataFrame:
    """image payloads -> FEATURE_DIM float features.

    Decode ladder: PIL if installed (any format) -> pure-stdlib PNG
    decode (REAL pixel math: zlib inflate + scanline unfilter + luma +
    4x4 box average) -> pure-stdlib baseline-JPEG DC decode (REAL pixel
    math: full Huffman entropy decode, exact 8x8 block means from the
    dequantized DC plane) -> pure-stdlib GIF decode (REAL pixel math:
    LZW decompression + color-table luma) -> HONEST NULL features for
    anything still undecodable (the audio path's policy; no fake values
    ever enter the feature column). Installing PIL upgrades the null
    rows without changing the operator's shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(raw)
                feats = None
                if _HAVE_PIL:
                    try:
                        feats = _pil_features(payload)
                    except Exception:
                        feats = None
                if feats is None:
                    feats = _png_features(payload)
                if feats is None:
                    feats = _jpeg_features(payload)
                if feats is None:
                    feats = _gif_features(payload)
                out.append({"media_id": mid, "features": feats})
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.mapInPandas(run, FEATURES_SCHEMA)


PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("phash", T.LongType()),
])


def _decode_gray_grid(payload: bytes):
    """Best-available grayscale grid from the stdlib decode ladder:
    full pixels for PNG/GIF, exact 8x8 block means for baseline JPEG
    (the DC plane is already the box-filtered image pHash wants).
    Returns (w, h, row-major values) or None."""
    try:
        return _png_decode_gray(payload)
    except Exception:
        pass
    try:
        return _gif_decode_gray(payload)
    except Exception:
        pass
    try:
        w, h, gw, gh, means = _jpeg_decode_gray_dc(payload)
        use_w = min(max(1, (w + 7) // 8), gw)
        use_h = min(max(1, (h + 7) // 8), gh)
        grid = [means[y * gw + x] for y in range(use_h) for x in range(use_w)]
        return use_w, use_h, grid
    except Exception:
        return None


def _phash64(w: int, h: int, gray) -> int:
    """64-bit perceptual hash (pHash, DCT method): box-resample the
    grayscale to 32x32, 2D DCT-II, keep the 8x8 lowest-frequency block
    minus the DC term, threshold each of the 63 coefficients at their
    median (median-thresholding makes the bits invariant to global
    brightness/contrast scaling). Returns a 63-bit int — always fits a
    signed Spark long."""
    import numpy as np

    g = np.asarray(gray, dtype=np.float64).reshape(h, w)
    n = 32
    ys = (np.arange(n + 1) * h) // n
    xs = (np.arange(n + 1) * w) // n
    ys2 = np.maximum(ys[1:], ys[:-1] + 1)
    xs2 = np.maximum(xs[1:], xs[:-1] + 1)
    # area-average resample via prefix sums (vectorized, no pixel loop)
    P = np.zeros((h + 1, w + 1))
    P[1:, 1:] = g.cumsum(0).cumsum(1)
    area = (ys2 - ys[:-1])[:, None] * (xs2 - xs[:-1])[None, :]
    R = (
        P[ys2][:, xs2] - P[ys2][:, xs[:-1]]
        - P[ys[:-1]][:, xs2] + P[ys[:-1]][:, xs[:-1]]
    ) / area
    k = np.arange(n)
    M = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    D = M @ R @ M.T
    low = D[:8, :8].ravel()[1:]  # 63 coefficients, DC dropped
    med = float(np.median(low))
    bits = 0
    for i, c in enumerate(low):
        if c > med:
            bits |= 1 << i
    return bits


def image_phash(df: DataFrame) -> DataFrame:
    """image payloads -> 64-bit perceptual hash (media_id, phash).

    The image-side near-dup primitive for a training-data pipeline:
    re-encodes, format conversions, and mild brightness shifts keep a
    small Hamming distance while distinct images land ~32 bits apart.
    Decode rides the same stdlib ladder as image_features (PNG pixels,
    GIF pixels, JPEG DC block means — the DC plane is exactly the
    box-filtered input pHash starts from); undecodable payloads get an
    honest null, never a fabricated hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                got = _decode_gray_grid(bytes(raw))
                out.append({
                    "media_id": mid,
                    "phash": _phash64(got[0], got[1], got[2])
                    if got is not None else None,
                })
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return df.mapInPandas(run, PHASH_SCHEMA)


def _hamming_band_pairs(hash_df: DataFrame, hash_col: str,
                        max_hamming: int = 7) -> DataFrame:
    """Shared banded Hamming join over any (media_id, <hash_col>)
    64-bit hash table (r12 — factored out of image_dup_pairs so the
    audio fingerprint rung rides the identical, plan-asserted
    machinery): split the hash into 8 disjoint 8-bit bands,
    bucket-join on (band index, band value), verify candidates with an
    exact popcount — COMPLETE for Hamming <= 7 by pigeonhole (8 bands,
    at most 7 differing bits leave one band untouched). Never an
    all-pairs scan: candidates are equi-join buckets, the verify is
    bit arithmetic on two longs."""
    from pyspark.sql import functions as F

    if max_hamming > 7:
        raise ValueError(
            f"max_hamming={max_hamming} > 7: the 8-band join is only "
            "pigeonhole-complete for Hamming <= 7"
        )
    h = hash_df.where(F.col(hash_col).isNotNull())
    bands = h.select(
        "media_id", F.col(hash_col).alias("_h"),
        F.explode(F.expr(
            f"transform(sequence(0, 7), b ->"
            f" named_struct('b', b,"
            f"  'v', ({hash_col} div shiftleft(1L, b * 8)) % 256))"
        )).alias("band"),
    ).select("media_id", "_h", "band.b", "band.v")
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.b") == F.col("r.b")) & (F.col("l.v") == F.col("r.v"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("a_id"),
            F.col("r.media_id").alias("b_id"),
            F.col("l._h").alias("h_a"),
            F.col("r._h").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.expr("bit_count(h_a ^ h_b)").cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def image_dup_pairs(phash_df: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Banded near-dup join over pHashes — the image instance of
    _hamming_band_pairs (see there for the pigeonhole completeness
    argument), the same guarantee structure as dedup_simhash_pairs on
    text."""
    return _hamming_band_pairs(phash_df, "phash", max_hamming)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """video payloads -> sampled frame rows (1 input row -> k rows).

    MP4/ISO-BMFF payloads get REAL container parsing: the sample table
    (stsz + stsc + stco/co64) resolves every sample's byte range, and
    the emitted frames are the ACTUAL every_n-th sample payloads —
    exactly what a pipeline hands to a downstream decoder. frame_idx is
    the true sample index. Codec DECODE is honestly absent (no ffmpeg
    in the container); for non-BMFF payloads the deterministic slicing
    stub keeps the fan-out shape real and tested.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(raw)
                try:
                    samples = _mp4_meta(payload)["_samples"]
                except Exception:
                    samples = None
                if samples:
                    taken = 0
                    for k in range(0, len(samples), max(every_n, 1)):
                        if taken >= max_frames:
                            break
                        off, sz = samples[k]
                        out.append({
                            "media_id": mid,
                            "frame_idx": k,
                            "frame": payload[off: off + sz],
                        })
                        taken += 1
                    continue
                n = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                step = max(1, len(payload) // max(n, 1))
                for k in range(n):
                    out.append({
                        "media_id": mid,
                        "frame_idx": k,
                        "frame": payload[k * step: k * step + step],
                    })
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(run, FRAMES_SCHEMA)


VIDEO_FH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_hashes", T.ArrayType(T.StringType())),
])


def video_frame_hashes(df: DataFrame, every_n: int = 10,
                       max_frames: int = 4) -> DataFrame:
    """video payloads -> sampled-frame CONTENT-hash set (media_id,
    sorted distinct md5 hex of each sampled frame's bytes) — the video
    near-dup primitive (r12): a re-muxed or re-containerized video
    carries the identical codec sample payloads at different offsets,
    so its sampled-frame hash set overlaps the original's even though
    the container bytes (and any whole-file hash) differ completely.
    Pure composition: the existing sample_frames fan-out (real BMFF
    sample table for MP4s, deterministic slicing otherwise) + one
    JVM-side md5 + one collect_set — no new decode path, no new
    Python."""
    frames = sample_frames(df, every_n=every_n, max_frames=max_frames)
    from pyspark.sql import functions as F

    return frames.groupBy("media_id").agg(
        F.sort_array(F.collect_set(F.md5("frame"))).alias("frame_hashes")
    )


def video_dup_pairs(fh_df: DataFrame) -> DataFrame:
    """Near-dup join over sampled-frame hash sets: candidates share at
    least one frame hash (an equi self-join on the exploded hash —
    COMPLETE for any pair with non-empty intersection, trivially, and
    never an all-pairs scan), verified with the exact integer Jaccard
    >= 0.5 test 2·|I| >= |U| (the incremental_shard_dedup convention).
    Emits (a_id, b_id, n_shared, n_union, jaccard_permille) — all
    non-negative integers, the permille one truncating divide of exact
    integers (sign-safe by domain)."""
    from pyspark.sql import functions as F

    ex = fh_df.select("media_id", F.explode("frame_hashes").alias("h"))
    sizes = fh_df.select("media_id", F.size("frame_hashes").alias("n"))
    cand = (
        ex.alias("l")
        .join(
            ex.alias("r"),
            (F.col("l.h") == F.col("r.h"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .groupBy(
            F.col("l.media_id").alias("a_id"),
            F.col("r.media_id").alias("b_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        cand.join(sizes.withColumnRenamed("media_id", "a_id")
                  .withColumnRenamed("n", "na"), "a_id")
        .join(sizes.withColumnRenamed("media_id", "b_id")
              .withColumnRenamed("n", "nb"), "b_id")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_shared"))
        .where(2 * F.col("n_shared") >= F.col("n_union"))
        .select(
            "a_id", "b_id",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n_union").cast("bigint").alias("n_union"),
            F.expr("(n_shared * 1000) div n_union").cast("bigint")
            .alias("jaccard_permille"),
        )
    )


def balance_by_size(df: DataFrame, partitions: int, payload_col: str = "payload") -> DataFrame:
    """Repartition media rows so decode work (∝ payload bytes) spreads
    evenly: round-robin stripe in descending size order — partition i
    receives every `partitions`-th row of the size ranking, so per-
    partition byte sums are near-equal (classic LPT-style balancing).
    Range-partitioning on the size key does the opposite (it clusters
    the largest payloads together).

    The rank is computed WITHIN coarse log2-size buckets (one window
    per bucket, partition-parallel), not as one global sort: rows in
    the same power-of-two bucket differ by <2x in cost, so striping
    them round-robin per bucket balances byte sums just as well while
    removing the single-task global Window.orderBy funnel — the 100 TB
    scale fix the r2 version only sketched in a comment. Each bucket's
    stripe phase is offset by the cumulative count of smaller buckets
    (a <=64-row aggregate, broadcast back), which keeps the global
    assignment an exact round robin: stripe weights balanced to ±1 row
    — no stripe systematically collects every bucket's largest payload,
    and the range exchange never sees skewed key weights (whose bound
    placement can otherwise degenerate).
    """
    from pyspark.sql import Window, functions as F

    size = F.length(F.col(payload_col))
    with_bk = df.withColumn("_bk", F.floor(F.log2(size + F.lit(1))))
    offsets = (
        with_bk.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bk")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_n")
    )
    rank0 = (
        F.row_number().over(Window.partitionBy("_bk").orderBy(size.desc())) - 1
    )
    return (
        with_bk.join(F.broadcast(offsets), "_bk")
        .withColumn("_rr", (rank0 + F.col("_off")) % partitions)
        .repartitionByRange(partitions, "_rr")
        .drop("_bk", "_off", "_rr")
    )
