"""Sinks: Warp HTTP forwarder (K1), dry-run (K3), chunking (T12)."""

from catalyst_spark.sinks.warp_sink import (
    PerTokenWarpSink,
    WarpHTTPSink,
    chunk_payloads,
    console_dry_run,
)

__all__ = ["PerTokenWarpSink", "WarpHTTPSink", "chunk_payloads", "console_dry_run"]
