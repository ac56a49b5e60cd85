"""K2: Warp 10 read/delete passthrough (ref middlewares/reverse.go:18-66,
cmd/root.go:139-146) — the one serving-shim capability SURVEY §2.4 had
deferred, now closed as a dependency-free function with an injectable
transport (same testing pattern as sinks.warp_sink).

Reference semantics, reproduced exactly:
- target = URL + "/" + wildcard remainder; a configured fixed Path
  replaces the wildcard (the delete route pins ".../api/v0/delete");
- the original request's query string ('?...' from the RequestURI) is
  appended verbatim;
- method, body, and ALL request headers forward unchanged;
- backend response: only headers starting with "X-Warp" are copied back
  (first value), plus Content-Type via the body stream;
- request-construction failure -> 500 with the error text; transport
  failure -> 502 with empty body (reverse.go:41-49).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

# transport(method, url, headers, body) -> (status, resp_headers, resp_body)
Transport = Callable[
    [str, str, dict[str, str], bytes | None],
    tuple[int, dict[str, str], bytes],
]

BAD_GATEWAY = 502
INTERNAL_ERROR = 500


@dataclass
class ReverseResult:
    status: int
    headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""
    content_type: str = ""


def _urllib_transport(method, url, headers, body):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, dict(resp.headers.items()), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers.items()), e.read()


def reverse(
    base_url: str,
    wildcard: str,
    *,
    method: str = "GET",
    query: str = "",
    headers: dict[str, str] | None = None,
    body: bytes | None = None,
    fixed_path: str = "",
    transport: Transport | None = None,
) -> ReverseResult:
    """Forward one request to the Warp 10 backend.

    wildcard is the echo ``*`` remainder (e.g. "fetch" for
    /warp/api/v0/fetch); query is the raw string after '?' (empty for
    none); fixed_path, when set, overrides the wildcard — mirroring
    ReverseConfig.Path.
    """
    uri = base_url + fixed_path if fixed_path else base_url + "/" + wildcard
    if query:
        uri += "?" + query
    transport = transport or _urllib_transport
    try:
        status, resp_headers, resp_body = transport(
            method, uri, dict(headers or {}), body
        )
    except ValueError as exc:  # bad URL/method -> the Go NewRequest error
        return ReverseResult(status=INTERNAL_ERROR, body=str(exc).encode())
    except Exception:
        return ReverseResult(status=BAD_GATEWAY)
    out = {
        k: v for k, v in resp_headers.items() if k.startswith("X-Warp")
    }
    return ReverseResult(
        status=status,
        headers=out,
        body=resp_body,
        content_type=resp_headers.get("Content-Type", ""),
    )


def reverse_for_route(
    protocol: str,
    path: str,
    cfg,
    *,
    method: str = "GET",
    query: str = "",
    headers: dict[str, str] | None = None,
    body: bytes | None = None,
    transport: Transport | None = None,
) -> ReverseResult:
    """Route-level entry: the two K2 mounts of cmd/root.go:139-146.

    protocol is routes.route(path)'s tag ("reverse" or
    "reverse_delete"); path the full request path (the wildcard is the
    remainder after the mount prefix)."""
    if protocol == "reverse_delete":
        return reverse(
            cfg.warp_endpoint_delete + "/api/v0", "",
            fixed_path="/delete", method=method, query=query,
            headers=headers, body=body, transport=transport,
        )
    wildcard = path.removeprefix("/warp/api/v0/")
    return reverse(
        cfg.warp_endpoint + "/api/v0", wildcard,
        method=method, query=query, headers=headers, body=body,
        transport=transport,
    )
