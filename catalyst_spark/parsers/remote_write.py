"""Prometheus remote_write parser (P4) — snappy + protobuf decode.

Reference semantics (ref catalyser/prometheus_remote_write.go:20-86):
- body = snappy-compressed prompb.WriteRequest (S6, :23-38)
- per TimeSeries: '__name__' label -> GTS name, remaining labels shared
  by every sample (:58-65)
- one GTS per sample; ±Inf AND NaN values map to 0.0 (policy T9,
  :71-73 — contrast with the exposition path's drop policy T8)
- ts µs = sample timestamp_ms * 1000 (:78)
- per-point send errors are ignored by the reference (:42) — in the
  DataFrame model every decoded point is simply a row.

Decode runs in an Arrow-batched mapInPandas over the binary bodies
(the codecs are pure Python — see wire.py; the container has no snappy
or protobuf packages). Each body fans out JVM-side after decode.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from catalyst_spark.schema import GTS_WITH_ERROR_SCHEMA
from catalyst_spark.parsers.wire import decode_write_request, snappy_decompress

_COLS = [f.name for f in GTS_WITH_ERROR_SCHEMA.fields]


def parse_remote_write(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Parse snappy+protobuf remote_write bodies (one per row) into GTS."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for body in pdf[body_col]:
                try:
                    series = decode_write_request(snappy_decompress(bytes(body)))
                except Exception as exc:  # snappy corruption / bad proto
                    out.append({c: None for c in _COLS} | {
                        "parse_error": f"Decode error: {exc}"})
                    continue
                for ts in series:
                    name = ts["labels"].get("__name__", "")
                    labels = {k: v for k, v in ts["labels"].items()
                              if k != "__name__"}
                    for value, ts_ms in ts["samples"]:
                        if math.isinf(value) or math.isnan(value):
                            value = 0.0  # policy T9 (:71-73)
                        out.append({
                            "ts": ts_ms * 1000,
                            "name": name,
                            "labels": labels,
                            "value_d": value,
                            "value_l": None,
                            "value_b": None,
                            "value_s": None,
                            "value_type": "double",
                            "parse_error": None,
                        })
            yield pd.DataFrame(out, columns=_COLS)

    return df.mapInPandas(run, GTS_WITH_ERROR_SCHEMA)
