"""Ingress routing surface (S1/S4/C2/C10) as data + pure functions.

The reference mounts six protocol handlers with per-handler HTTP-method
allow-lists (ref cmd/root.go:116-146, core/handler.go:130-133), an
InfluxDB /ping endpoint (ref catalyser/influxdb.go:52-57), and a
ban-tarpit middleware that sleeps before answering 401
(ref middlewares/auth.go:30-53). These are serving-shim concerns, but
their DECISIONS are engine contracts — which protocol a path selects,
which methods are legal, what a banned client gets — so they live here
as dependency-free functions any HTTP front (or test) can call.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable

from catalyst_spark.control.auth import BanRegistry

# ---------------------------------------------------------------------------
# S1/C10: route table + method allow-lists (cmd/root.go:116-146)
# ---------------------------------------------------------------------------

# (prefix, protocol, allowed methods) — order mirrors echo registration;
# first match wins, specific prefixes before the catch-alls.
ROUTES: tuple[tuple[str, str, tuple[str, ...]], ...] = (
    ("/influxdb/ping", "influxdb_ping", ("GET", "HEAD", "POST")),
    ("/influxdb/write", "influxdb", ("POST",)),
    ("/influxdb", "influxdb", ("POST",)),
    ("/prometheus/remote_write", "remote_write", ("POST", "PUT")),
    ("/prometheus", "prometheus", ("POST", "PUT")),
    ("/opentsdb", "opentsdb", ("POST",)),
    ("/graphite/api/v1/sink", "graphite", ("POST",)),
    ("/warp/api/v0/update", "warp", ("POST",)),
    ("/warp/api/v0/delete", "reverse_delete", ()),   # K2 passthrough, any verb
    ("/warp/api/v0/", "reverse", ()),                # K2 passthrough, any verb
    ("/warp", "warp", ("POST",)),
)

METHOD_NOT_ALLOWED = 405
UNAUTHORIZED = 401


def route(path: str) -> str | None:
    """Path -> protocol tag (None when unrouted). Longest-prefix first
    registration order, like the echo router's wildcard mounts."""
    for prefix, protocol, _ in ROUTES:
        if path == prefix or path.startswith(prefix.rstrip("/") + "/") \
                or path.startswith(prefix) and prefix.endswith("/"):
            return protocol
    return None


def check_method(path: str, method: str) -> int | None:
    """C10 gate: 405 when the verb isn't in the handler's allow-list
    (core/handler.go:130-133); None when the request may proceed.
    Passthrough routes (empty allow-list) accept any verb — the
    reference forwards them verbatim (middlewares/reverse.go:18-59)."""
    for prefix, _, methods in ROUTES:
        if path == prefix or path.startswith(prefix.rstrip("/") + "/") \
                or path.startswith(prefix) and prefix.endswith("/"):
            if methods and method.upper() not in methods:
                return METHOD_NOT_ALLOWED
            return None
    return None


# ---------------------------------------------------------------------------
# S4: InfluxDB /ping (catalyser/influxdb.go:52-57)
# ---------------------------------------------------------------------------

INFLUXDB_VERSION = "1.4.x"


def ping_response(txn: str) -> tuple[int, dict[str, str]]:
    """204 + the fixed X-Influxdb-Version + the request txn id."""
    return 204, {"X-Influxdb-Version": INFLUXDB_VERSION, "Request-Id": txn}


# ---------------------------------------------------------------------------
# C2: ban tarpit (middlewares/auth.go:30-53, cmd/root.go:54)
# ---------------------------------------------------------------------------

DEFAULT_TARPIT_MS = 3000  # bannishment.duration default


def tarpit_check(
    registry: BanRegistry,
    token: str | None,
    duration_ms: int = DEFAULT_TARPIT_MS,
    sleeper: Callable[[float], None] = _time.sleep,
) -> int | None:
    """Bannishment middleware decision: no token -> immediate 401;
    banned token -> sleep duration_ms (the tarpit that slows abusive
    clients) then 401; else None (request proceeds)."""
    if not token:
        return UNAUTHORIZED
    if registry.is_banned(token):
        sleeper(duration_ms / 1000.0)
        return UNAUTHORIZED
    return None
