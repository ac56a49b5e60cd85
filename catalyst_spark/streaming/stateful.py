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
    # vectorized: concat the batch, sort once, Series.diff for deltas;
    # the carried state seeds the first diff via a sentinel row
    parts = [p[["ts", "value_d"]] for p in pdfs]
    pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        columns=["ts", "value_d"])
    pdf = pdf.dropna(subset=["value_d"]).sort_values("ts", ignore_index=True)
    if len(pdf):
        vals = pdf["value_d"].astype(float)
        delta = vals.diff()
        if last_value is not None:
            delta.iloc[0] = vals.iloc[0] - last_value
        out = pd.DataFrame({
            "name": name,
            "ts": pdf["ts"].astype("int64"),
            "value_d": vals,
            "delta": delta,
        })
        state.update((int(pdf["ts"].iloc[-1]), float(vals.iloc[-1])))
    else:
        out = pd.DataFrame(columns=["name", "ts", "value_d", "delta"])
    yield out


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
