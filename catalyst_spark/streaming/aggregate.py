"""Streaming windowed aggregation with late-data handling.

The reference has no windowing at all (SURVEY §2 "operators NOT
implemented") — timestamps pass through unordered. In-engine, the
streaming read side needs the standard TSDB rollup: event-time windows
with a watermark bounding state for late datapoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(
    gts_stream: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop re-delivered datapoints keyed by
    (name, labels-hash, ts) within the watermark horizon.

    dropDuplicatesWithinWatermark keeps one state entry per key and
    expires it once the watermark passes — the bounded-state streaming
    twin of dedup_exact (without the watermark, dedup state grows
    forever; this is the difference between a demo and a 100 TB
    stream)."""
    keyed = gts_stream.withColumn(
        "event_time", F.timestamp_micros(F.col("ts"))
    ).withColumn(
        # map columns aren't comparable state keys; hash the sorted
        # entry list to a stable one
        "series_key",
        F.sha2(F.concat_ws(
            "|",
            F.col("name"),
            F.to_json(F.expr("array_sort(map_entries(labels))")),
        ), 256),
    )
    return (
        keyed.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["series_key", "event_time"])
        .drop("series_key")
    )


def stream_sessionize(
    gts_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming gap-based sessionization via Spark's native
    session_window: per-series windows that extend while datapoints
    arrive within `gap` of each other and close when the watermark
    passes the gap — the streaming twin of the batch `sessionize`
    operator, with merge-and-expire state managed by the engine rather
    than hand-rolled in applyInPandasWithState."""
    with_ts = gts_stream.withColumn("event_time", F.timestamp_micros(F.col("ts")))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("s"), F.col("name"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_d").alias("sum_d"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "name",
            "n_events",
            "sum_d",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    bound: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: for every datapoint on
    the left stream, the right-stream datapoints of the SAME series
    name arriving within `bound` after it (the attribution/enrichment
    join — e.g. error events joined to the deploy marker that preceded
    them).

    Both sides carry a watermark and the join condition bounds r_time
    to [l_time, l_time + bound], so the engine can expire buffered
    rows once the watermark passes — bounded state, the only
    stream-stream join shape that survives an unbounded stream. The
    join itself hash-shuffles both sides on `name` exactly like a
    batch equi-join."""
    l = (
        left.select(
            F.col("name").alias("l_name"),
            F.timestamp_micros(F.col("ts")).alias("l_time"),
            F.col("value_d").alias("l_value"),
        ).withWatermark("l_time", watermark)
    )
    r = (
        right.select(
            F.col("name").alias("r_name"),
            F.timestamp_micros(F.col("ts")).alias("r_time"),
            F.col("value_d").alias("r_value"),
        ).withWatermark("r_time", watermark)
    )
    return l.join(
        r,
        (F.col("l_name") == F.col("r_name"))
        & (F.col("r_time") >= F.col("l_time"))
        & (F.col("r_time") <= F.col("l_time") + F.expr(f"INTERVAL {bound}")),
    ).select(
        F.col("l_name").alias("name"),
        "l_time",
        "r_time",
        "l_value",
        "r_value",
    )


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


def stream_histogram_buckets(
    event_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Ingest-time histogram bucket counters (r11): the write path of
    histogram_quantile — every arriving observation increments its
    (event_type, le-bucket) counter, which is ALL a metrics backend
    stores (one row per series/bucket/window; the raw observations are
    never kept, never re-sorted). The quantile read is then
    queries.tsdb._hq_read over the counter table — the SAME exact-
    integer promql interpolation the batch operator runs, so the
    online counters serve the identical estimator (replay test).

    At-least-once delivery is handled the production way: an upstream
    dropDuplicatesWithinWatermark on the observation id feeds the
    windowed count — the officially supported dedup -> windowed-agg
    stateful chain, append mode, both states watermark-bounded (dedup
    state one entry per observation inside the horizon, counter state
    one row per open (window, type, bucket)). A re-delivered
    observation inside the horizon increments nothing twice."""
    from catalyst_spark.queries.tsdb import _hq_lo_le_expr

    deduped = (
        event_stream.withColumn("event_time", F.col("ts"))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    return (
        deduped.select(
            "event_time", "event_type", _hq_lo_le_expr().alias("b")
        )
        .groupBy(
            F.window("event_time", window).alias("w"),
            "event_type", "b.lo", "b.le",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "lo", "le", "n",
        )
    )
