"""Streaming ingestion end-to-end: file source -> parser -> sinks.

Follows the guide pattern: a batch of files drives a streaming query
to completion synchronously via processAllAvailable().
"""

from __future__ import annotations

import pytest

from catalyst_spark.streaming import ingest_stream, start_store_writer, stream_lines
from catalyst_spark.streaming.ingest import start_warp_forwarder
from catalyst_spark.sinks import WarpHTTPSink

NOW_US = 1_700_000_000_000_000


@pytest.fixture
def graphite_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "req1.txt").write_text(
        "servers.db01.cpu;dc=gra 42 1546420308\n"
        "https_metric 14.2 1546420308000\n"
        "badline\n"
    )
    return str(d)


def test_stream_to_store(spark, graphite_dir, tmp_path):
    gts = ingest_stream(stream_lines(spark, graphite_dir), "graphite", now_us=NOW_US)
    q = start_store_writer(gts, str(tmp_path / "store"), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    stored = spark.read.parquet(str(tmp_path / "store"))
    rows = {r["name"]: r for r in stored.collect()}
    assert set(rows) == {"servers.db01.cpu", "https_metric"}  # bad line dropped
    assert rows["servers.db01.cpu"]["value_l"] == 42
    assert rows["servers.db01.cpu"]["dt"].isoformat() == "2019-01-02"
    # date-partitioned layout on disk (partition pruning at scale)
    assert any(p.name.startswith("dt=") for p in (tmp_path / "store").iterdir())


class CollectTransport:
    def __init__(self):
        self.payloads = []

    def __call__(self, url, headers, body):
        self.payloads.append(bytes(body))
        return 200, ""


def test_stream_to_warp_forwarder(spark, graphite_dir, tmp_path):
    # transport must be picklable for foreachPartition; collect via a
    # local accumulator-style list won't survive pickling, so run the
    # sink against a tmp file the fake transport appends to.
    out_file = tmp_path / "posts.txt"

    class FileTransport:
        def __init__(self, path):
            self.path = str(path)

        def __call__(self, url, headers, body):
            with open(self.path, "ab") as f:
                f.write(body)
            return 200, ""

    sink = WarpHTTPSink("http://w10", "TOK", transport=FileTransport(out_file))
    gts = ingest_stream(stream_lines(spark, graphite_dir), "graphite", now_us=NOW_US)
    q = start_warp_forwarder(gts, sink, str(tmp_path / "ckpt2"))
    q.processAllAvailable()
    q.stop()
    sent = out_file.read_bytes().decode()
    assert "servers.db01.cpu{0=servers,1=db01,2=cpu,dc=gra} 42\r\n" in sent
    assert "14.200000\r\n" in sent
    assert "badline" not in sent


def test_dry_run_console(spark, graphite_dir, tmp_path, capsys):
    gts = ingest_stream(stream_lines(spark, graphite_dir), "graphite", now_us=NOW_US)
    q = start_warp_forwarder(gts, None, str(tmp_path / "ckpt3"), dry_run=True)
    q.processAllAvailable()
    q.stop()
    out = capsys.readouterr().out
    assert "https_metric" in out


def test_unknown_protocol(spark, graphite_dir):
    with pytest.raises(ValueError):
        ingest_stream(stream_lines(spark, graphite_dir), "nope")
