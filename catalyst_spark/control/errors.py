"""Backend-error taxonomy (C4) and HTTP status mapping (C5).

The reference classifies Warp 10 error bodies by substring/regex match
(ref core/warp.go:280-421) and maps the typed errors to HTTP statuses
(ref core/handler.go:210-459). Reproduced here twice:

- ``classify_error(body)`` — driver/sink-side Python (the foreachBatch
  writer classifies each failed POST exactly once per batch);
- ``classify_error_col(col)`` — the same decision table as a column
  expression, for classifying an error-body column at scale (audit
  tables of ingest outcomes).

Error type -> (HTTP status, bans token?):

  invalid_token / expired_token / revoked_token -> 401, ban (C3,
      ref core/handler.go:213-250)
  mads_exceeded / ddp_exceeded -> 429
  gone (application suspended/closed) -> 410
  input_error (EOF / Parse error / For input string) -> 422
  timeout -> 408; connection failure -> 503
  anything else -> 500
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# substring triggers, in the reference's evaluation order (core/warp.go:287-421)
_INVALID = "io.warp10.script.WarpScriptException: Invalid token"
_MISSING = "io.warp10.script.WarpScriptException: Write token missing"
_EXPIRED = "io.warp10.script.WarpScriptException: Token Expired"
_REVOKED = "io.warp10.script.WarpScriptException: Token revoked"
_MADS_A = "exceed your Monthly Active Data Streams limit"
_MADS_B = "exceed the Monthly Active Data Streams limit"
_DDP = "Daily Data Points limit being already exceeded"
_GONE = "Application suspended or closed"

_MADS_RE = re.compile(
    r"Monthly Active Data Streams limit(?: for application (?:&apos;|.)([^\(]*?)"
    r"(?:&apos;|.)) \((\d+)(.\d+)?(E-\d)?\)\. \(Geo Time Series"
)
_DDP_APP_RE = re.compile(r"(,|\{)\.app=(.*?)(,|\})")
_DDP_LIMIT_RE = re.compile(r"Current maximum rate is \((\d+)(.\d+)?(E-\d)?\) datapoints/s")
_PARSE_RE = re.compile(r"<pre>\s*Parse error at &apos;(.*)&apos;</pre>")
_INPUT_RE = re.compile(r"<pre>\s*For input string: &quot;(.*)&quot;</pre>")

HTTP_STATUS = {
    "invalid_token": 401,
    "expired_token": 401,
    "revoked_token": 401,
    "mads_exceeded": 429,
    "ddp_exceeded": 429,
    "gone": 410,
    "input_error": 422,
    "timeout": 408,
    "connection": 503,
    "unknown": 500,
}

BANNING_TYPES = frozenset({"invalid_token", "expired_token", "revoked_token"})


@dataclass(frozen=True)
class Classified:
    error_type: str
    http_status: int
    bans_token: bool
    app: str = ""
    limit: str = "-1"
    detail: str = ""


def classify_error(body: str) -> Classified:
    """Python mirror of Warp.HandleError + Handler.handleErr."""

    def _mk(t: str, **kw) -> Classified:
        return Classified(t, HTTP_STATUS[t], t in BANNING_TYPES, **kw)

    if _INVALID in body or _MISSING in body:
        return _mk("invalid_token")
    if _EXPIRED in body:
        return _mk("expired_token")
    if _REVOKED in body:
        return _mk("revoked_token")
    if _MADS_A in body or _MADS_B in body:
        flat = body.replace("\n", " ")
        m = _MADS_RE.search(flat)
        return _mk("mads_exceeded",
                   app=m.group(1) if m else "",
                   limit=m.group(2) if m else "-1")
    if _DDP in body:
        app_m = _DDP_APP_RE.search(body)
        lim_m = _DDP_LIMIT_RE.search(body)
        return _mk("ddp_exceeded",
                   app=app_m.group(2) if app_m else "",
                   limit=lim_m.group(1) if lim_m else "-1")
    # order matters: the reference checks EOF before Parse error (:368)
    if "EOF" in body:
        return _mk("input_error", detail="error")
    if "Parse error at" in body:
        m = _PARSE_RE.search(body)
        return _mk("input_error", detail=m.group(1) if m else "")
    if _GONE in body:
        return _mk("gone", detail=_GONE)
    if "For input string" in body:
        m = _INPUT_RE.search(body)
        return _mk("input_error", detail=m.group(1) if m else "")
    if "Client.Timeout" in body or "context deadline exceeded" in body:
        return _mk("timeout")
    if "connection refused" in body or "connection reset" in body:
        return _mk("connection")
    return _mk("unknown")


def classify_error_col(body: Column) -> Column:
    """The same decision table as one column expression -> error_type
    (use with HTTP_STATUS as a literal map for the status column)."""
    return (
        F.when(body.contains(_INVALID) | body.contains(_MISSING), "invalid_token")
        .when(body.contains(_EXPIRED), "expired_token")
        .when(body.contains(_REVOKED), "revoked_token")
        .when(body.contains(_MADS_A) | body.contains(_MADS_B), "mads_exceeded")
        .when(body.contains(_DDP), "ddp_exceeded")
        .when(body.contains("EOF"), "input_error")
        .when(body.contains("Parse error at"), "input_error")
        .when(body.contains(_GONE), "gone")
        .when(body.contains("For input string"), "input_error")
        .when(body.contains("Client.Timeout")
              | body.contains("context deadline exceeded"), "timeout")
        .when(body.contains("connection refused")
              | body.contains("connection reset"), "connection")
        .otherwise("unknown")
    )


def http_status_col(error_type: Column) -> Column:
    mapping = F.create_map(
        *[F.lit(x) for kv in HTTP_STATUS.items() for x in kv]
    )
    return mapping[error_type]
