"""Streaming windowed aggregation with late-data handling.

The reference has no windowing at all (SURVEY §2 "operators NOT
implemented") — timestamps pass through unordered. In-engine, the
streaming read side needs the standard TSDB rollup: event-time windows
with a watermark bounding state for late datapoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_downsample(
    gts_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """GTS stream -> per-(window, name) rollup.

    Watermark on the event-time column bounds the aggregation state:
    datapoints later than `watermark` are dropped, everything else
    re-aggregates into its window. At 100 TB of stream state the
    watermark is what keeps the store bounded — without it every open
    window lives forever.
    """
    with_ts = gts_stream.withColumn("event_time", F.timestamp_micros(F.col("ts")))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("name"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_d").alias("sum_d"),
            F.max("value_l").alias("max_l"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "name",
            "n",
            "sum_d",
            "max_l",
        )
    )
