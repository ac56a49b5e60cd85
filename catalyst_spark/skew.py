"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (on in session.py) covers joins. For
aggregations the picture splits:

- ALGEBRAIC aggregates (sum/count/min/max): Spark's partial
  HashAggregate already combines map-side, so each task ships one
  partial per key and the hot key costs little — salting adds a shuffle
  for marginal gain. `salted_agg` stays for the residual case (partial
  agg disabled, or extreme per-task key cardinality), but reach for it
  last.
- HOLISTIC aggregates (collect_set/collect_list, exact percentiles):
  there is no map-side shrinkage — every raw value of the hot key lands
  in one reducer. This is where salting earns its shuffle:
  `salted_collect_set` spreads the hot key over `salt_factor` tasks and
  merges the per-salt sets.
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


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase collect_set for skewed keys — the aggregation shape
    that genuinely needs salting (no map-side combine exists for
    holistic aggregates, so an unsalted hot key funnels every raw value
    into one task). Phase 1 collects per (key, salt); phase 2 merges
    the <= salt_factor small sets per key. Output column: `{value}_set`
    (sorted for determinism)."""
    salt = (F.spark_partition_id() % salt_factor).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_set(value_col).alias("_part_set"))
    )
    return phase1.groupBy(*keys).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_part_set")))
        ).alias(f"{value_col}_set")
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
