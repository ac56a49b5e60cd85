"""Custom stateful streaming operator: per-series delta/rate with
cross-batch state (applyInPandasWithState).

The reference keeps no per-series state at all (each datapoint is
forwarded independently); the classic TSDB ingest enrichment it can't
do — counter-delta against the previous point, across request
boundaries — needs keyed state that survives micro-batches. GroupState
holds (last_ts, last_value) per series; each batch emits the deltas and
updates the state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("value_d", T.DoubleType()),
    T.StructField("delta", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_value", T.DoubleType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (name,) = key
    last_ts, last_value = state.get if state.exists else (None, None)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts"])
        for _, row in pdf.iterrows():
            if row["value_d"] is None or pd.isna(row["value_d"]):
                continue
            delta = (
                float(row["value_d"]) - last_value if last_value is not None else None
            )
            out.append((name, int(row["ts"]), float(row["value_d"]), delta))
            last_ts, last_value = int(row["ts"]), float(row["value_d"])
    if last_ts is not None:
        state.update((last_ts, last_value))
    yield pd.DataFrame(out, columns=["name", "ts", "value_d", "delta"])


def stream_series_delta(gts_stream: DataFrame) -> DataFrame:
    """GTS stream -> per-(name) point deltas with state across batches."""
    return (
        gts_stream.select("name", "ts", "value_d")
        .groupBy("name")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
