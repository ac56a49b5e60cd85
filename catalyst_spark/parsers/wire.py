"""Pure-Python codecs for the remote_write wire path.

The container has neither python-snappy nor protobuf, so the two PUBLIC
formats involved are implemented from their published specs:

- Snappy block format (github.com/google/snappy/blob/main/format_description.txt):
  uvarint uncompressed length, then literal (tag&3==0) and copy
  (1/2/4-byte offset) elements. The compressor emits literal-only
  streams (always valid Snappy); the decompressor handles all tags.
- Protobuf wire format (protobuf.dev/programming-guides/encoding/) for
  the prometheus remote-write WriteRequest message
  (github.com/prometheus/prometheus prompb/remote.proto, types.proto):
    WriteRequest{1: repeated TimeSeries}
    TimeSeries{1: repeated Label{1: name, 2: value},
               2: repeated Sample{1: double value (fixed64),
                                  2: int64 timestamp (varint)}}

Only the fields the reference reads are decoded; unknown fields are
skipped per wire rules.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# varints
# ---------------------------------------------------------------------------

def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("uvarint too long")


def write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_to_int64(n: int) -> int:
    """Interpret a 64-bit varint as two's-complement int64 (protobuf
    int64 fields are NOT zigzag — negative values use 10-byte varints)."""
    if n >= 1 << 63:
        n -= 1 << 64
    return n


# ---------------------------------------------------------------------------
# snappy block format
# ---------------------------------------------------------------------------

def snappy_decompress(data: bytes) -> bytes:
    expected, pos = read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln < 60:
                ln += 1
                pos += 1
            else:
                nbytes = ln - 59
                ln = int.from_bytes(data[pos + 1: pos + 1 + nbytes], "little") + 1
                pos += 1 + nbytes
            out += data[pos: pos + ln]
            pos += ln
        else:
            if t == 1:  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | data[pos + 1]
                pos += 2
            elif t == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos + 1: pos + 3], "little")
                pos += 3
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos + 1: pos + 5], "little")
                pos += 5
            if off == 0 or off > len(out):
                raise ValueError("bad snappy copy offset")
            for _ in range(ln):  # byte-wise: offsets may overlap the output
                out.append(out[-off])
    if len(out) != expected:
        raise ValueError(f"snappy length mismatch: {len(out)} != {expected}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy stream (valid per the format; no matching)."""
    out = bytearray(write_uvarint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos: pos + 65536]
        ln = len(chunk)
        if ln <= 60:
            out.append((ln - 1) << 2)
        else:
            out.append(61 << 2)  # 2-byte length literal
            out += (ln - 1).to_bytes(2, "little")
        out += chunk
        pos += ln
    return bytes(out)


# ---------------------------------------------------------------------------
# protobuf: prompb.WriteRequest
# ---------------------------------------------------------------------------

def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_uvarint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = read_uvarint(buf, pos)
        elif wire == 1:  # fixed64
            val = buf[pos: pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = read_uvarint(buf, pos)
            val = buf[pos: pos + ln]
            pos += ln
        elif wire == 5:  # fixed32
            val = buf[pos: pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def decode_write_request(buf: bytes) -> list[dict]:
    """-> [{labels: {k: v}, samples: [(value: float, timestamp_ms: int)]}]"""
    series = []
    for field, wire, val in _iter_fields(buf):
        if field == 1 and wire == 2:
            labels: dict[str, str] = {}
            samples: list[tuple[float, int]] = []
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 2:  # Label
                    name = value = ""
                    for f3, w3, v3 in _iter_fields(v2):
                        if f3 == 1:
                            name = v3.decode("utf-8")
                        elif f3 == 2:
                            value = v3.decode("utf-8")
                    labels[name] = value
                elif f2 == 2 and w2 == 2:  # Sample
                    sval, sts = 0.0, 0
                    for f3, w3, v3 in _iter_fields(v2):
                        if f3 == 1 and w3 == 1:
                            sval = struct.unpack("<d", v3)[0]
                        elif f3 == 2 and w3 == 0:
                            sts = _zigzag_to_int64(v3)
                    samples.append((sval, sts))
            series.append({"labels": labels, "samples": samples})
    return series


# --- fixture-side encoder (tests only) -------------------------------------

def _field(field: int, wire: int, payload: bytes) -> bytes:
    return write_uvarint((field << 3) | wire) + payload


def _len_delim(field: int, payload: bytes) -> bytes:
    return _field(field, 2, write_uvarint(len(payload)) + payload)


def encode_write_request(series: list[dict]) -> bytes:
    out = bytearray()
    for ts in series:
        body = bytearray()
        for k, v in ts["labels"].items():
            label = _len_delim(1, k.encode()) + _len_delim(2, v.encode())
            body += _len_delim(1, label)
        for value, ts_ms in ts["samples"]:
            sample = _field(1, 1, struct.pack("<d", value))
            sample += _field(2, 0, write_uvarint(ts_ms & ((1 << 64) - 1)))
            body += _len_delim(2, sample)
        out += _len_delim(1, bytes(body))
    return bytes(out)
