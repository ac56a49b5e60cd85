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
- Protobuf exposition format: a stream of uvarint-delimited
  io.prometheus.client.MetricFamily messages
  (github.com/prometheus/client_model metrics.proto):
    MetricFamily{1: name, 3: type enum, 4: repeated Metric}
    Metric{1: repeated LabelPair, 2: Gauge{1: double},
           3: Counter{1: double}, 4: Summary, 5: Untyped{1: double},
           6: timestamp_ms, 7: Histogram}
    Summary{1: sample_count, 2: sample_sum,
            3: repeated Quantile{1: quantile, 2: value}}
    Histogram{1: sample_count, 2: sample_sum,
              3: repeated Bucket{1: cumulative_count, 2: upper_bound}}

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


# ---------------------------------------------------------------------------
# protobuf: io.prometheus.client.MetricFamily (exposition format)
# ---------------------------------------------------------------------------

_MF_TYPES = {0: "counter", 1: "gauge", 2: "summary", 3: "untyped", 4: "histogram"}


def _double(buf: bytes) -> float:
    return struct.unpack("<d", buf)[0]


def _decode_scalar(buf: bytes) -> float:
    """Gauge/Counter/Untyped — all are {1: double value}."""
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == 1:
            return _double(v)
    return 0.0


def _decode_summary(buf: bytes) -> dict:
    s = {"count": 0, "sum": 0.0, "quantiles": []}
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == 0:
            s["count"] = v
        elif f == 2 and w == 1:
            s["sum"] = _double(v)
        elif f == 3 and w == 2:
            q = val = 0.0
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 1 and w2 == 1:
                    q = _double(v2)
                elif f2 == 2 and w2 == 1:
                    val = _double(v2)
            s["quantiles"].append((q, val))
    return s


def _decode_histogram(buf: bytes) -> dict:
    h = {"count": 0, "sum": 0.0, "buckets": []}
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == 0:
            h["count"] = v
        elif f == 2 and w == 1:
            h["sum"] = _double(v)
        elif f == 3 and w == 2:
            cc, ub = 0, 0.0
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 1 and w2 == 0:
                    cc = v2
                elif f2 == 2 and w2 == 1:
                    ub = _double(v2)
            h["buckets"].append((cc, ub))
    return h


def _decode_mf_metric(buf: bytes) -> dict:
    m = {"labels": {}, "timestamp_ms": None, "gauge": None, "counter": None,
         "untyped": None, "summary": None, "histogram": None}
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == 2:  # LabelPair
            name = value = ""
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 1:
                    name = v2.decode("utf-8")
                elif f2 == 2:
                    value = v2.decode("utf-8")
            m["labels"][name] = value
        elif f == 2 and w == 2:
            m["gauge"] = _decode_scalar(v)
        elif f == 3 and w == 2:
            m["counter"] = _decode_scalar(v)
        elif f == 5 and w == 2:
            m["untyped"] = _decode_scalar(v)
        elif f == 4 and w == 2:
            m["summary"] = _decode_summary(v)
        elif f == 7 and w == 2:
            m["histogram"] = _decode_histogram(v)
        elif f == 6 and w == 0:
            m["timestamp_ms"] = _zigzag_to_int64(v)
    return m


def decode_metric_families(buf: bytes) -> list[dict]:
    """uvarint-delimited MetricFamily stream ->
    [{name, type, metrics: [{labels, timestamp_ms, <type payload>}]}]"""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        ln, pos = read_uvarint(buf, pos)
        if pos + ln > n:
            raise ValueError("truncated MetricFamily")
        fam = {"name": "", "type": "untyped", "metrics": []}
        for f, w, v in _iter_fields(buf[pos: pos + ln]):
            if f == 1 and w == 2:
                fam["name"] = v.decode("utf-8")
            elif f == 3 and w == 0:
                fam["type"] = _MF_TYPES.get(v, "untyped")
            elif f == 4 and w == 2:
                fam["metrics"].append(_decode_mf_metric(v))
        out.append(fam)
        pos += ln
    return out


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


_MF_TYPE_IDS = {v: k for k, v in _MF_TYPES.items()}
# Metric field number per scalar kind (metrics.proto)
_SCALAR_FIELD = {"counter": 3, "gauge": 2, "untyped": 5}


def encode_metric_family(fam: dict) -> bytes:
    """One uvarint-delimited MetricFamily (test fixtures).

    fam = {name, type, metrics: [{labels, timestamp_ms?, value? |
    summary: {count, sum, quantiles} | histogram: {count, sum, buckets}}]}
    """
    body = bytearray(_len_delim(1, fam["name"].encode()))
    body += _field(3, 0, write_uvarint(_MF_TYPE_IDS[fam["type"]]))
    for m in fam["metrics"]:
        mb = bytearray()
        for k, v in m.get("labels", {}).items():
            mb += _len_delim(1, _len_delim(1, k.encode()) + _len_delim(2, v.encode()))
        if fam["type"] in _SCALAR_FIELD:
            mb += _len_delim(_SCALAR_FIELD[fam["type"]],
                             _field(1, 1, struct.pack("<d", m["value"])))
        elif fam["type"] == "summary":
            s = m["summary"]
            sb = bytearray(_field(1, 0, write_uvarint(s["count"])))
            sb += _field(2, 1, struct.pack("<d", s["sum"]))
            for q, qv in s["quantiles"]:
                sb += _len_delim(3, _field(1, 1, struct.pack("<d", q))
                                 + _field(2, 1, struct.pack("<d", qv)))
            mb += _len_delim(4, bytes(sb))
        elif fam["type"] == "histogram":
            h = m["histogram"]
            hb = bytearray(_field(1, 0, write_uvarint(h["count"])))
            hb += _field(2, 1, struct.pack("<d", h["sum"]))
            for cc, ub in h["buckets"]:
                hb += _len_delim(3, _field(1, 0, write_uvarint(cc))
                                 + _field(2, 1, struct.pack("<d", ub)))
            mb += _len_delim(7, bytes(hb))
        if m.get("timestamp_ms") is not None:
            mb += _field(6, 0, write_uvarint(m["timestamp_ms"] & ((1 << 64) - 1)))
        body += _len_delim(4, bytes(mb))
    return write_uvarint(len(body)) + bytes(body)
