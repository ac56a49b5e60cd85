"""Bucketed tables: shuffle-free co-located joins.

For the 100 TB fact-fact joins (orders ⋈ customer class), bucketing
both sides on the join key at write time removes the per-query shuffle
entirely — the sort-merge join reads co-bucketed files directly
(no Exchange in the plan; asserted in tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
