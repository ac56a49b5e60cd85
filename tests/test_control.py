"""Control plane: error taxonomy (C4/C5), token extraction (C1), ban
registry (C2/C3), txn ids (C6)."""

from __future__ import annotations

import base64
import hashlib

import pytest

from catalyst_spark.control import (
    BanRegistry,
    classify_error,
    extract_token,
    filter_banned,
    txn_id,
)
from catalyst_spark.control.errors import classify_error_col, http_status_col
from pyspark.sql import functions as F


class TestClassify:
    def test_token_errors_ban(self):
        for body, etype in [
            ("io.warp10.script.WarpScriptException: Invalid token xyz", "invalid_token"),
            ("io.warp10.script.WarpScriptException: Write token missing", "invalid_token"),
            ("io.warp10.script.WarpScriptException: Token Expired", "expired_token"),
            ("io.warp10.script.WarpScriptException: Token revoked", "revoked_token"),
        ]:
            c = classify_error(body)
            assert c.error_type == etype and c.http_status == 401 and c.bans_token

    def test_mads(self):
        body = ("would exceed your Monthly Active Data Streams limit for application "
                "&apos;myapp&apos; (100). (Geo Time Series ...)")
        c = classify_error(body)
        assert c.error_type == "mads_exceeded" and c.http_status == 429
        assert c.app == "myapp" and c.limit == "100"

    def test_ddp(self):
        body = ("... Daily Data Points limit being already exceeded {.app=appx,rest} "
                "Current maximum rate is (500) datapoints/s")
        c = classify_error(body)
        assert c.error_type == "ddp_exceeded" and c.http_status == 429
        assert c.app == "appx" and c.limit == "500"

    def test_input_parse_gone(self):
        c = classify_error("<pre> Parse error at &apos;foo bar&apos;</pre>")
        assert c.error_type == "input_error" and c.http_status == 422
        assert c.detail == "foo bar"
        c = classify_error("unexpected EOF while reading")
        assert c.error_type == "input_error" and c.detail == "error"
        c = classify_error("Application suspended or closed")
        assert c.error_type == "gone" and c.http_status == 410
        c = classify_error('<pre> For input string: &quot;12x&quot;</pre>')
        assert c.error_type == "input_error" and c.detail == "12x"

    def test_timeout_connection_unknown(self):
        assert classify_error("Client.Timeout exceeded").http_status == 408
        assert classify_error("dial tcp: connection refused").http_status == 503
        assert classify_error("whatever else").http_status == 500

    def test_column_variant_matches_python(self, spark):
        bodies = [
            "io.warp10.script.WarpScriptException: Invalid token a",
            "io.warp10.script.WarpScriptException: Token Expired",
            "would exceed the Monthly Active Data Streams limit (5). (Geo Time Series",
            "Daily Data Points limit being already exceeded",
            "<pre> Parse error at &apos;x&apos;</pre>",
            "Application suspended or closed",
            "unexpected EOF",
            "Client.Timeout exceeded",
            "connection refused",
            "mystery",
        ]
        df = spark.createDataFrame([(b,) for b in bodies], "body string")
        rows = df.select(
            classify_error_col(F.col("body")).alias("t"),
        ).withColumn("s", http_status_col(F.col("t"))).collect()
        for body, row in zip(bodies, rows):
            c = classify_error(body)
            assert row["t"] == c.error_type, body
            assert row["s"] == c.http_status, body


class TestToken:
    def test_priority_chain(self):
        assert extract_token({"X-Warp10-Token": "a", "X-Metrics-Token": "b"}) == "a"
        assert extract_token({"X-Metrics-Token": "b"}) == "b"
        assert extract_token({"X-CityzenData-Token": "c"}) == "c"

    def test_basic_uses_password_half(self):
        cred = base64.b64encode(b"user:secret").decode()
        assert extract_token({"Authorization": f"Basic {cred}"}) == "secret"

    def test_bearer_and_query_fallback(self):
        assert extract_token({"Authorization": "Bearer tok"}) == "tok"
        assert extract_token({"Authorization": "Digest zz"}, {"p": "qq"}) == "qq"

    def test_errors(self):
        with pytest.raises(ValueError):
            extract_token({})
        with pytest.raises(ValueError):
            extract_token({"Authorization": "Basic !!!notb64"})


class TestBan:
    def test_registry_and_filter(self, spark):
        reg = BanRegistry()
        assert not reg.is_banned("t1")
        reg.bannish("t1")
        assert reg.is_banned("t1")
        df = spark.createDataFrame([("t1", 1), ("t2", 2)], "token string, v int")
        out = filter_banned(df, reg).collect()
        assert [r["token"] for r in out] == ["t2"]

    def test_save_load(self, spark, tmp_path):
        reg = BanRegistry({"a", "b"})
        reg.save(spark, str(tmp_path / "bans"))
        reg2 = BanRegistry.load(spark, str(tmp_path / "bans"))
        assert reg2.tokens == frozenset({"a", "b"})


def test_txn_id():
    assert txn_id("1.2.3.4", 123) == hashlib.sha256(b"1.2.3.4123").hexdigest()


class TestRoutes:
    """S1/S4/C2/C10 shim decisions (cmd/root.go:116-146,
    core/handler.go:130-133, catalyser/influxdb.go:52-57,
    middlewares/auth.go:30-53)."""

    def test_route_table(self):
        from catalyst_spark.control.routes import route

        assert route("/influxdb/write?precision=s".split("?")[0]) == "influxdb"
        assert route("/influxdb/ping") == "influxdb_ping"
        assert route("/influxdb") == "influxdb"
        assert route("/prometheus/remote_write") == "remote_write"
        assert route("/prometheus/job/node") == "prometheus"
        assert route("/opentsdb/api/put") == "opentsdb"
        assert route("/graphite/api/v1/sink") == "graphite"
        assert route("/warp/api/v0/update") == "warp"
        assert route("/warp/api/v0/delete") == "reverse_delete"
        assert route("/warp/api/v0/exec") == "reverse"
        assert route("/warp") == "warp"
        assert route("/nope") is None

    def test_method_allow_list(self):
        from catalyst_spark.control.routes import check_method

        assert check_method("/influxdb/write", "POST") is None
        assert check_method("/influxdb/write", "GET") == 405
        assert check_method("/prometheus/x/y", "PUT") is None
        assert check_method("/prometheus/x/y", "DELETE") == 405
        assert check_method("/opentsdb", "post") is None  # case-insensitive
        # K2 passthrough accepts any verb (reverse.go forwards verbatim)
        assert check_method("/warp/api/v0/exec", "GET") is None
        assert check_method("/warp/api/v0/delete", "DELETE") is None

    def test_ping(self):
        from catalyst_spark.control.routes import ping_response

        status, headers = ping_response("abc123")
        assert status == 204
        assert headers["X-Influxdb-Version"] == "1.4.x"
        assert headers["Request-Id"] == "abc123"

    def test_tarpit(self):
        from catalyst_spark.control.routes import tarpit_check

        reg = BanRegistry({"bad"})
        slept = []
        assert tarpit_check(reg, None, sleeper=slept.append) == 401
        assert slept == []  # no token -> immediate 401, no tarpit
        assert tarpit_check(reg, "bad", 3000, sleeper=slept.append) == 401
        assert slept == [3.0]  # banned -> 3 s tarpit then 401
        assert tarpit_check(reg, "good", sleeper=slept.append) is None
        assert len(slept) == 1


class TestReverseProxy:
    """K2 passthrough parity (middlewares/reverse.go:18-66)."""

    @staticmethod
    def _transport_recording(calls, status=200,
                             resp_headers=None, body=b"ok"):
        def t(method, url, headers, req_body):
            calls.append((method, url, headers, req_body))
            return status, dict(resp_headers or {}), body
        return t

    def test_wildcard_join_and_query(self):
        from catalyst_spark.control.reverse import reverse

        calls = []
        r = reverse("http://w10/api/v0", "fetch", method="GET",
                    query="selector=~cpu{}&now=123",
                    headers={"X-Warp10-Token": "tok"},
                    transport=self._transport_recording(calls))
        (method, url, headers, body), = calls
        assert url == "http://w10/api/v0/fetch?selector=~cpu{}&now=123"
        assert method == "GET" and body is None
        assert headers == {"X-Warp10-Token": "tok"}  # forwarded verbatim
        assert r.status == 200 and r.body == b"ok"

    def test_fixed_path_overrides_wildcard(self):
        from catalyst_spark.control.reverse import reverse

        calls = []
        reverse("http://w10d/api/v0", "ignored", fixed_path="/delete",
                method="POST", query="deleteall=true",
                transport=self._transport_recording(calls))
        assert calls[0][1] == "http://w10d/api/v0/delete?deleteall=true"

    def test_only_xwarp_headers_copied_back(self):
        from catalyst_spark.control.reverse import reverse

        r = reverse("http://w10/api/v0", "fetch",
                    transport=self._transport_recording(
                        [], resp_headers={
                            "X-Warp10-Elapsed": "12",
                            "X-Warp10-Fetched": "40",
                            "Server": "warp",
                            "Content-Type": "text/plain",
                        }))
        assert r.headers == {"X-Warp10-Elapsed": "12",
                             "X-Warp10-Fetched": "40"}
        assert r.content_type == "text/plain"

    def test_transport_error_is_502_no_content(self):
        from catalyst_spark.control.reverse import reverse

        def boom(method, url, headers, body):
            raise OSError("connection refused")

        r = reverse("http://w10/api/v0", "fetch", transport=boom)
        assert r.status == 502 and r.body == b""

    def test_backend_error_status_streams_through(self):
        from catalyst_spark.control.reverse import reverse

        r = reverse("http://w10/api/v0", "exec",
                    transport=self._transport_recording(
                        [], status=403, body=b"forbidden"))
        assert r.status == 403 and r.body == b"forbidden"

    def test_route_level_dispatch(self):
        from catalyst_spark.config import Config
        from catalyst_spark.control.reverse import reverse_for_route
        from catalyst_spark.control.routes import route

        cfg = Config(warp_endpoint="http://a", warp_endpoint_delete="http://b")
        calls = []
        t = self._transport_recording(calls)

        p = "/warp/api/v0/fetch"
        assert route(p) == "reverse"
        reverse_for_route("reverse", p, cfg, query="q=1", transport=t)
        assert calls[-1][1] == "http://a/api/v0/fetch?q=1"

        p = "/warp/api/v0/delete"
        assert route(p) == "reverse_delete"
        reverse_for_route("reverse_delete", p, cfg, method="POST",
                          query="deleteall=true", transport=t)
        assert calls[-1][1] == "http://b/api/v0/delete?deleteall=true"
        assert calls[-1][0] == "POST"
