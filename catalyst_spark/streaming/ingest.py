"""Streaming ingestion wiring: sources -> parsers -> sinks.

The reference's HTTP/TCP listeners map to Structured Streaming sources
(file source here; socket/Kafka in production — same DataFrame code).
The parsers are stateless column transforms, so batch and streaming
share them verbatim (SURVEY §2.2); this module only wires:

  readStream(text) -> parse_<protocol> -> permissive/failfast
     -> encode_sensision -> foreachBatch WarpHTTPSink   (egress, K1)
     -> partitioned parquet store                        (query surface)

Exactly-once: the foreachBatch + checkpoint combination replays a
failed epoch, which supersedes the reference's retry-once replay
buffer (SURVEY §4: "stronger").
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catalyst_spark.encode import encode_sensision
from catalyst_spark.parsers import (
    parse_graphite,
    parse_influx,
    parse_opentsdb,
    parse_prom_text,
    parse_remote_write,
    strip_token_prefix,
    warp_passthrough,
)
from catalyst_spark.schema import PARSE_ERROR_COL
from catalyst_spark.sinks.warp_sink import (
    PerTokenWarpSink,
    WarpHTTPSink,
    console_dry_run,
)

PARSERS: dict[str, Callable[..., DataFrame]] = {
    "graphite": parse_graphite,
    "influxdb": parse_influx,
    "opentsdb": parse_opentsdb,
    "prometheus": parse_prom_text,
    "remote_write": parse_remote_write,
    "warp": warp_passthrough,
}


def stream_lines(spark: SparkSession, path: str) -> DataFrame:
    """File-source stand-in for the protocol listeners: each text file
    dropped into `path` is a 'request body' worth of lines."""
    return spark.readStream.text(path).withColumnRenamed("value", "line")


def stream_socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Live TCP line stream (S3): Spark's socket source reads newline-
    framed text from host:port — the streaming stand-in for the
    reference's persistent Graphite listener (catalyser/graphite.go:
    149-177; in production a Kafka topic fed by the TCP front takes
    this seat, same downstream code)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .withColumnRenamed("value", "line")
    )


def graphite_tcp_ingest(
    spark: SparkSession,
    host: str,
    port: int,
    parse_hierarchy: bool = True,
    now_us: int | None = None,
) -> DataFrame:
    """S3 end-to-end head: socket lines -> token framing (P7, every
    line carries 'TOKEN@.'; unframed lines dropped per graphite.go:
    242-251) -> Graphite parse, with the token kept as a column so the
    sink can group egress per token (the per-connection Warp session
    of the reference)."""
    framed = strip_token_prefix(stream_socket_lines(spark, host, port))
    return parse_graphite(
        framed, parse_hierarchy=parse_hierarchy, now_us=now_us,
        keep_cols=("token",),
    )


def graphite_tcp_ingest_framed(
    conn_lines: DataFrame,
    parse_hierarchy: bool = True,
    now_us: int | None = None,
) -> DataFrame:
    """S3 head with exact per-connection framing parity (quirk A.6):
    a (conn_id, line_seq, line) stream — a TCP front that tags each
    line with its connection and sequence, e.g. a Kafka topic keyed by
    connection — is length-framed with cross-batch state exactly like
    catalyser/graphite.go:240-273, then Graphite-parsed. The plain
    socket source (no connection identity) keeps the per-line
    strip_token_prefix head in graphite_tcp_ingest."""
    from catalyst_spark.streaming.stateful import stream_frame_connections

    framed = stream_frame_connections(conn_lines)
    return parse_graphite(
        framed, parse_hierarchy=parse_hierarchy, now_us=now_us,
        keep_cols=("token",),
    )


def ingest_stream(lines: DataFrame, protocol: str, **parser_kwargs: Any) -> DataFrame:
    """lines/bodies stream -> canonical GTS stream (+ parse_error)."""
    try:
        parser = PARSERS[protocol]
    except KeyError:
        raise ValueError(f"unknown protocol {protocol!r}") from None
    return parser(lines, **parser_kwargs)


def start_warp_forwarder(
    gts_stream: DataFrame,
    sink: WarpHTTPSink | PerTokenWarpSink | None,
    checkpoint_dir: str,
    dry_run: bool = False,
    access_log=None,
    protocol: str = "",
):
    """GTS stream -> Sensision -> Warp POSTs (or console when dry_run,
    K3). Bad rows are skipped permissively, mirroring the TCP path —
    per-request failfast belongs to the HTTP shim, not the stream.

    A PerTokenWarpSink (S3 TCP egress) receives (token, sensision) rows
    and posts one update sequence per token group.

    With an AccessLog (C7), each batch appends one audit row — txn,
    datapoints, parse errors, status, latency — mirroring the
    reference's per-request access line (middlewares/logger.go:79-92).
    Counts piggyback on the batch's own action via observe(); no second
    pass over the data."""
    import time as _time

    from catalyst_spark.control.metrics import observed
    from catalyst_spark.sinks.warp_sink import WarpSendError

    per_token = isinstance(sink, PerTokenWarpSink)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        obs = None
        if access_log is not None:
            batch_df, obs = observed(batch_df, f"access_{epoch_id}")
        clean = batch_df
        if PARSE_ERROR_COL in batch_df.columns:
            clean = batch_df.where(F.col(PARSE_ERROR_COL).isNull()).drop(PARSE_ERROR_COL)
        if per_token:
            encoded = encode_sensision(clean, keep_cols=("token",))
        else:
            clean = clean.drop("token") if "token" in clean.columns else clean
            encoded = clean if clean.columns == ["sensision"] else encode_sensision(clean)
        t0 = _time.perf_counter()
        status = 200
        try:
            if dry_run or sink is None:
                console_dry_run(encoded.drop("token") if per_token else encoded, epoch_id)
            else:
                sink.foreach_batch(encoded, epoch_id)
        except WarpSendError as exc:
            status = exc.classified.http_status
            raise
        except Exception:
            status = 500
            raise
        finally:
            if access_log is not None:
                m = obs.get
                access_log.record(
                    protocol=protocol,
                    batch_id=epoch_id,
                    datapoints=m.get("rows", 0),
                    parse_errors=m.get("parse_errors", 0),
                    status=status,
                    latency_ms=(_time.perf_counter() - t0) * 1000.0,
                )

    return (
        gts_stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_store_writer(
    gts_stream: DataFrame, path: str, checkpoint_dir: str
):
    """GTS stream -> date-partitioned parquet store — the in-engine
    analytical surface over ingested datapoints (replaces the
    reference's delegation of reads to Warp 10, SURVEY §2.6).

    Partitioning: dt (day) for pruning on time-range queries; within a
    partition, files cluster by name via a repartition on (dt, name) so
    per-series scans touch few files at 100 TB.
    """
    enriched = (
        gts_stream.where(F.col(PARSE_ERROR_COL).isNull()).drop(PARSE_ERROR_COL)
        if PARSE_ERROR_COL in gts_stream.columns
        else gts_stream
    ).withColumn("dt", F.to_date(F.timestamp_micros(F.col("ts"))))
    return (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("dt")
        .start()
    )
