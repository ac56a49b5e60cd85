"""Prometheus text-exposition parser (P3) — regex column expressions.

Reference semantics (ref catalyser/prometheus.go:22-117):
- content negotiation falls back to the text format (:40-44); we
  implement the text format (the protobuf exposition variant is only
  reachable with an explicit proto Content-Type; gated out — SURVEY P3).
- URL path segments after /prometheus|/metrics become extra labels that
  OVERRIDE inner labels (:26-38, :96-99); odd segment count is a parse
  error (:32-34) — see path_to_labels().
- '__name__' is lifted to the GTS name (:88-94); our text parser takes
  the name from the line head, which is the same thing post-extraction.
- ±Inf samples are DROPPED (:83-85); NaN is kept (policy T8 — contrast
  with remote_write's map-to-0 policy T9).
- sample timestamp is ms; a missing timestamp gets ingest-now at
  SECONDS resolution (model.TimeFromUnix(time.Now().Unix()), :67-71);
  µs = ms * 1000 (:101).
- values are Go ParseFloat: scientific notation, +Inf/-Inf/Nan, etc.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from catalyst_spark.schema import gts_columns

_LINE_RE = r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(.*)\})?\s+(\S+)(?:\s+(-?\d+))?\s*$"
_LABEL_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"((?:\\.|[^"\\])*)"'


def path_to_labels(path: str) -> dict[str, str]:
    """URL path -> extra-label dict (ref catalyser/prometheus.go:26-38).

    Raises ValueError on an odd number of segments, mirroring the
    reference's parse error — note this includes the bare '/prometheus'
    path, whose empty remainder splits into one empty segment in Go.
    """
    for prefix in ("/prometheus", "/metrics"):
        if path.startswith(prefix):
            path = path[len(prefix):]
    path = path.strip("/")
    segs = path.split("/")
    if len(segs) % 2 != 0:
        raise ValueError(
            f"Bad number of labels in URL (must be even but got : {len(segs)} entries)"
        )
    return dict(zip(segs[::2], segs[1::2]))


def _unescape(col: Column) -> Column:
    """Text-format label-value escapes: \\\\ , \\" , \\n."""
    col = F.replace(col, F.lit(r"\n"), F.lit("\n"))
    col = F.replace(col, F.lit(r"\""), F.lit('"'))
    return F.replace(col, F.lit("\\\\"), F.lit("\\"))


def parse_prom_text(
    df: DataFrame,
    line_col: str = "line",
    extra_labels: dict[str, str] | None = None,
    now_us: int | None = None,
) -> DataFrame:
    """Parse exposition-format lines (one per row) into GTS.

    Comment (#) and blank lines are dropped — in the text format the
    TYPE/HELP metadata only affects family grouping, and ExtractSamples
    flattens histogram/summary families back to exactly the per-line
    samples (name_bucket/_sum/_count appear as plain lines).
    """
    if now_us is None:
        now_us = int(time.time() * 1_000_000)
    extra_labels = extra_labels or {}

    line = F.trim(F.col(line_col))
    data = df.where((line != "") & ~line.startswith("#")).select(line.alias("_l"))

    name = F.regexp_extract("_l", _LINE_RE, 1)
    label_blob = F.regexp_extract("_l", _LINE_RE, 2)
    value_str = F.regexp_extract("_l", _LINE_RE, 3)
    ts_str = F.regexp_extract("_l", _LINE_RE, 4)

    keys = F.regexp_extract_all("_lb", F.lit(_LABEL_RE), 1)
    vals = F.transform(
        F.regexp_extract_all("_lb", F.lit(_LABEL_RE), 2), _unescape
    )
    inner = F.map_from_arrays(keys, vals)

    if extra_labels:
        extra = F.create_map(
            *[F.lit(x) for kv in extra_labels.items() for x in kv]
        ).cast("map<string,string>")
        labels = F.map_concat(inner, extra)  # extra wins (LAST_WIN policy)
    else:
        labels = inner

    lowered = F.lower(value_str)
    value = (
        F.when(lowered.isin("+inf", "inf"), F.lit(float("inf")))
        .when(lowered == "-inf", F.lit(float("-inf")))
        .when(lowered == "nan", F.lit(float("nan")))
        .otherwise(value_str.try_cast("double"))
    )

    ts_ms = F.when(ts_str != "", ts_str.try_cast("long")).otherwise(
        F.lit((now_us // 1_000_000) * 1000)  # now at seconds resolution, in ms
    )

    parsed = data.select(
        name.alias("_name"),
        label_blob.alias("_lb"),
        value_str.alias("_vs"),
        value.alias("_v"),
        ts_ms.alias("_ts_ms"),
    ).select(
        "_name",
        labels.alias("_labels"),
        "_vs",
        "_v",
        "_ts_ms",
    )

    # drop ±Inf rows (policy T8); keep NaN
    parsed = parsed.where(
        F.col("_v").isNull() | ~F.abs(F.col("_v")).eqNullSafe(F.lit(float("inf")))
    )

    error = F.when(
        (F.col("_name") == "") | (F.col("_vs") == "") | F.col("_v").isNull(),
        "Invalid format",
    ).otherwise(F.lit(None))

    return parsed.select(
        *gts_columns(
            ts=F.col("_ts_ms") * 1000,
            name=F.col("_name"),
            labels=F.col("_labels"),
            value_d=F.col("_v"),
            value_type=F.lit("double"),
            parse_error=error,
        )
    )
