"""Warp 10 GTS passthrough (P8) — lines forwarded verbatim.

Reference semantics (ref catalyser/warp.go:15-49): input lines are
re-joined with CRLF and flushed to the backend every 27 lines plus a
final partial batch. No parsing, no typing.

In the DataFrame model the passthrough is the identity transform; the
27-line chunking is a sink concern (see sinks.warp_sink.chunk_payloads,
which both this path and the Sensision-encoded paths share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PASSTHROUGH_FLUSH_LINES = 27  # hard-coded flush threshold (warp.go:28)


def warp_passthrough(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Identity over the opaque lines; normalizes the column name so the
    sink can chunk any line-shaped DataFrame."""
    return df.select(F.col(line_col).cast("string").alias("sensision"))
