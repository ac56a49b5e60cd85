"""Sinks: Warp HTTP forwarder (K1), dry-run (K3), chunking (T12)."""

from catalyst_spark.sinks.warp_sink import (
    WarpHTTPSink,
    chunk_payloads,
    console_dry_run,
)

__all__ = ["WarpHTTPSink", "chunk_payloads", "console_dry_run"]
