"""Sensision encoder golden vectors (FIXTURES.md §3.6, ref core/warp.go:423-478)."""

from __future__ import annotations

import pytest

from catalyst_spark.encode import encode_sensision
from catalyst_spark.schema import GTS_SCHEMA


def _encode_one(spark, row):
    df = spark.createDataFrame([row], GTS_SCHEMA)
    return encode_sensision(df).collect()[0]["sensision"]


CASES = [
    # (ts, name, labels, d, l, b, s, type) -> expected bytes
    ((1434055562000000, "cpu load", {"host": "a b"}, 0.64, None, None, None, "double"),
     "1434055562000000// cpu%20load{host=a%20b} 0.640000\r\n"),
    ((1, "m", {}, None, None, True, None, "boolean"), "1// m{} T\r\n"),
    ((1, "m", {}, None, None, False, None, "boolean"), "1// m{} F\r\n"),
    ((1, "m", {}, None, 42, None, None, "long"), "1// m{} 42\r\n"),
    # string values use plain QueryEscape: space stays '+', no %20 fix-up
    # (ref warp.go:468 vs the name/label fix-up at :435,441)
    ((1, "m", {}, None, None, None, "a'b c", "string"), "1// m{} 'a%27b+c'\r\n"),
    ((1, "n o", {"k": "p q"}, None, None, None, "r s", "string"),
     "1// n%20o{k=p%20q} 'r+s'\r\n"),
    ((None, "m", {"k": "v"}, 1.5, None, None, None, "double"), "// m{k=v} 1.500000\r\n"),
    # Go nil interface -> "%v" of nil, URL-escaped (opentsdb JSON null value)
    ((1, "m", {}, None, None, None, None, "null"), "1// m{} %3Cnil%3E\r\n"),
    # 'opaque' (opentsdb JSON object/array value): Go's default branch
    # renders url.QueryEscape(fmt "%v") — UNQUOTED, space stays '+'
    # (warp.go:470-473). Our value_s carries the structure's JSON text
    # (documented dialect deviation from Go's `map[a:1]` fmt).
    ((1, "m", {}, None, None, None, '{"a":1,"b":"x y"}', "opaque"),
     "1// m{} %7B%22a%22%3A1%2C%22b%22%3A%22x+y%22%7D\r\n"),
]


@pytest.mark.parametrize("row,expected", CASES)
def test_golden(spark, row, expected):
    assert _encode_one(spark, row) == expected


def test_multi_label_sorted(spark):
    # deviation from the reference's random Go map order: we emit labels
    # sorted by key (deterministic; same set semantics)
    row = (7, "m", {"b": "2", "a": "1"}, None, 9, None, None, "long")
    assert _encode_one(spark, row) == "7// m{a=1,b=2} 9\r\n"


def test_url_escape_parity(spark):
    # Go url.QueryEscape: '~' kept, '*' -> %2A, '+' -> %2B, space -> %20
    row = (1, "a~b*c+d e", {}, None, 1, None, None, "long")
    assert _encode_one(spark, row) == "1// a~b%2Ac%2Bd%20e{} 1\r\n"
