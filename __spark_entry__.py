"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine code lives in ``catalyst_spark/`` (see SURVEY.md for the
operator inventory this implements).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launches from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from catalyst_spark.queries import ALL_QUERIES, ORACLE_SQL  # noqa: E402
from catalyst_spark.session import configure_existing  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analog) on sf0.001; driver checks rows>0."""
    configure_existing(spark)
    return ALL_QUERIES["q6_tpch_q1"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.6."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twin for every query — including the
    minhash/simhash/LSH family, whose hashing is the portable
    md5-derived ``_h60`` (see queries/pipeline.py) precisely so the
    driver can value-check them instead of falling back to rows-only.
    """
    return dict(ORACLE_SQL)
