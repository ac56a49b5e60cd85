"""Oracle-compared correctness for every SQL-expressible query, plus
smoke (rows + stable schema) for the hash-based ones the oracle can't
express."""

from __future__ import annotations

import pytest

from catalyst_spark.queries import ALL_QUERIES, ORACLE_SQL
from tests.conftest import SF_DIR
from tests.oracle_harness import compare

ORACLE_KEYS = sorted(ORACLE_SQL)
ROWS_ONLY_KEYS = sorted(set(ALL_QUERIES) - set(ORACLE_SQL))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    compare(df, ORACLE_SQL[name], SF_DIR)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_every_oracle_key_has_query():
    assert set(ORACLE_SQL) <= set(ALL_QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
