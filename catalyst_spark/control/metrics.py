"""Self-metering (C8) — the reference's ~20 Prometheus counters
re-expressed as an ingest-audit aggregation.

The reference counts requests/datapoints/errors per protocol in-process
(ref core/handler.go:71-96, catalyser/graphite.go:91-144,
middlewares/logger.go:15-49). In the DataFrame model the same
observables fall out of the data: every parsed batch carries its
protocol tag and parse_error column, so one partial aggregation yields
the counter values — and `observe()` attaches them to a streaming query
without a second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from catalyst_spark.schema import PARSE_ERROR_COL


def ingest_audit(gts_df: DataFrame, protocol: str) -> DataFrame:
    """Counter table for a parsed batch: datapoints, errors, distinct
    series — ≙ catalyst_protocol_datapoints / _request{status} and the
    graphite TCP counters."""
    has_err = PARSE_ERROR_COL in gts_df.columns
    err = (
        F.sum(F.when(F.col(PARSE_ERROR_COL).isNotNull(), 1).otherwise(0))
        if has_err
        else F.lit(0)
    )
    return gts_df.agg(
        F.lit(protocol).alias("protocol"),
        F.count(F.lit(1)).alias("rows"),
        err.alias("parse_errors"),
        F.approx_count_distinct("name").alias("approx_series"),
    )


def observed(gts_df: DataFrame, name: str = "ingest") -> tuple[DataFrame, Observation]:
    """Attach the counters to the query itself (no extra pass): read
    them from the Observation after an action — the streaming-friendly
    version of the counter registry."""
    obs = Observation(name)
    has_err = PARSE_ERROR_COL in gts_df.columns
    metrics = [
        F.count(F.lit(1)).alias("rows"),
    ]
    if has_err:
        metrics.append(
            F.sum(F.when(F.col(PARSE_ERROR_COL).isNotNull(), 1).otherwise(0)).alias(
                "parse_errors"
            )
        )
    return gts_df.observe(obs, *metrics), obs
