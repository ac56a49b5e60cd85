"""Warp 10 egress sink (K1) — foreachBatch HTTP forwarder.

Reference behavior reproduced (ref core/warp.go:116-277, cmd/root.go:46-52):
- POST <endpoint>/api/v0/update, headers X-Warp10-Token,
  Content-Type: text/plain, optional X-Warp10-Now passthrough (quirk
  A.10), Txn id
- body = Sensision lines; the passthrough path flushes every 27 lines
  (ref catalyser/warp.go:28); the streaming-pipe behavior maps to
  chunked POSTs per partition
- retry-once on connection failure with a full-body replay buffer
  (ref core/warp.go:180,202-217,260)
- response bodies classified through the C4 taxonomy; token-typed
  errors auto-ban (C3)
- connection pooling ≙ one executor-local HTTP session per worker
  (the reference pools 2000 idle conns driver-side)

The transport is injectable so tests (and dry runs) observe exact
payloads without a network. The default transport uses urllib (no
external HTTP deps in the container).
"""

from __future__ import annotations

import urllib.error
import urllib.request
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

from catalyst_spark.control.auth import BanRegistry
from catalyst_spark.control.errors import classify_error

PASSTHROUGH_FLUSH_LINES = 27

# transport: (url, headers, body_bytes) -> (status_code, response_body)
Transport = Callable[[str, dict[str, str], bytes], tuple[int, str]]


def _urllib_transport(url: str, headers: dict[str, str], body: bytes) -> tuple[int, str]:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.read().decode(errors="replace")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(errors="replace")


def chunk_payloads(lines: Iterable[str], flush: int = PASSTHROUGH_FLUSH_LINES) -> Iterator[bytes]:
    """27-line flush batching (T12). Lines may or may not carry their
    CRLF terminator; the payload always ends each line with CRLF, byte-
    identical to catalyser/warp.go:27-35."""
    buf: list[str] = []
    for line in lines:
        buf.append(line if line.endswith("\r\n") else line + "\r\n")
        if len(buf) >= flush:
            yield "".join(buf).encode()
            buf = []
    if buf:
        yield "".join(buf).encode()


class WarpSendError(RuntimeError):
    def __init__(self, classified, body: str) -> None:
        super().__init__(f"{classified.error_type} ({classified.http_status}): {body[:200]}")
        self.classified = classified


class WarpHTTPSink:
    """foreachBatch writer: GTS/Sensision batches -> Warp 10 update POSTs."""

    def __init__(
        self,
        endpoint: str,
        token: str,
        txn: str = "",
        now_header: str = "",
        transport: Transport | None = None,
        ban_registry: BanRegistry | None = None,
        flush_lines: int = PASSTHROUGH_FLUSH_LINES,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.token = token
        self.txn = txn
        self.now_header = now_header
        self.transport = transport or _urllib_transport
        self.ban_registry = ban_registry
        self.flush_lines = flush_lines

    def _headers(self) -> dict[str, str]:
        h = {
            "Content-Type": "text/plain",
            "X-Warp10-Token": self.token,
        }
        if self.txn:
            h["Txn"] = self.txn
        if self.now_header:  # client-pinned "now" forwarded (quirk A.10)
            h["X-Warp10-Now"] = self.now_header
        return h

    def _post(self, payload: bytes) -> None:
        url = f"{self.endpoint}/api/v0/update"
        headers = self._headers()
        try:
            status, body = self.transport(url, headers, payload)
        except (ConnectionError, OSError):
            # retry-once on dial failure, replaying the full buffered body
            # (ref core/warp.go:202-217)
            status, body = self.transport(url, headers, payload)
        if status >= 400:
            classified = classify_error(body)
            if classified.bans_token and self.ban_registry is not None:
                self.ban_registry.bannish(self.token)  # auto-ban (C3)
            raise WarpSendError(classified, body)

    def send_lines(self, lines: Iterable[str]) -> int:
        n = 0
        for payload in chunk_payloads(lines, self.flush_lines):
            self._post(payload)
            n += payload.count(b"\r\n")
        return n

    def foreach_batch(self, df: DataFrame, epoch_id: int) -> None:
        """writeStream.foreachBatch hook. Collect per-partition line
        iterators driver-side is wrong at scale; instead each partition
        posts its own chunks (executor-local session ≙ reference's
        pooled transport)."""
        sink = self

        def send_partition(rows) -> None:
            sink.send_lines(r["sensision"] for r in rows)

        df.select("sensision").foreachPartition(send_partition)


class PerTokenWarpSink:
    """Graphite TCP egress (S3): the reference opens one Warp update
    stream per TCP connection, keyed by the connection's token
    (catalyser/graphite.go:255-264). In the stream model the
    per-connection session becomes a per-token group: the batch is
    hash-repartitioned on token and sorted within partitions, so each
    executor streams contiguous token runs and posts one chunked update
    sequence per token — O(flush) memory, no per-token buffering of the
    whole batch.
    """

    def __init__(
        self,
        endpoint: str,
        transport: Transport | None = None,
        ban_registry: BanRegistry | None = None,
        flush_lines: int = PASSTHROUGH_FLUSH_LINES,
    ) -> None:
        self.endpoint = endpoint
        self.transport = transport
        self.ban_registry = ban_registry
        self.flush_lines = flush_lines

    def foreach_batch(self, df: DataFrame, epoch_id: int) -> None:
        endpoint = self.endpoint
        transport = self.transport
        ban_registry = self.ban_registry
        flush = self.flush_lines

        def send_partition(rows) -> None:
            from itertools import groupby

            for token, grp in groupby(rows, key=lambda r: r["token"]):
                WarpHTTPSink(
                    endpoint, token, transport=transport,
                    ban_registry=ban_registry, flush_lines=flush,
                ).send_lines(r["sensision"] for r in grp)

        (
            df.select("token", "sensision")
            .repartition("token")
            .sortWithinPartitions("token")
            .foreachPartition(send_partition)
        )


def console_dry_run(df: DataFrame, epoch_id: int = 0) -> None:
    """K3 --dryrun: print decoded payload instead of forwarding
    (ref core/handler.go:161-167)."""
    for r in df.select("sensision").collect():
        print(r["sensision"], end="")
