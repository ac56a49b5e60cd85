"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (on in session.py) covers joins; a skewed
aggregation key still funnels one partition. Salting splits the hot key
into `salt_factor` subkeys for the partial aggregation and re-combines —
two shuffles of small partials instead of one shuffle with a straggler.
Worth it only for algebraic aggregates (sum/count/min/max) on keys with
>> partition-size cardinality, which is exactly the 100 TB hot-series
case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: {column: fn} with fn in {'sum', 'count', 'min', 'max'} —
    the algebraic aggregates whose partials re-combine exactly.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in recombine:
            raise ValueError(f"non-algebraic aggregate {fn!r}")

    salt = (F.spark_partition_id() % salt_factor).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(c)).alias(
                f"_p_{c}_{fn}"
            )
            for c, fn in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            recombine[fn](f"_p_{c}_{fn}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salt_join_key(df: DataFrame, key: str, salt_factor: int = 16) -> DataFrame:
    """Salt the build side of a join against a replicated probe side:
    key -> (key, salt) so one hot key spreads over salt_factor tasks.
    Pair with `replicate_for_salt` on the other side."""
    return df.withColumn("_salt", (F.spark_partition_id() % salt_factor))


def replicate_for_salt(df: DataFrame, salt_factor: int = 16) -> DataFrame:
    """Replicate each row once per salt value (the small side of a
    skewed join); join on (key, _salt)."""
    return df.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
