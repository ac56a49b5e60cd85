"""SQL-API parity: the dialect-neutral §2.6 oracle strings run
unchanged in Spark SQL over registered views and match the DataFrame
builders — one logical surface, two equivalent APIs."""

from __future__ import annotations

import pytest

from catalyst_spark.queries import ALL_QUERIES, ORACLE_SQL
from catalyst_spark.tables import register_views
from tests.conftest import SF_DIR
from tests.oracle_harness import canonical, spark_run

# DuckDB-specific constructs (list_*, epoch_us, json_extract_string)
# keep these out of the Spark-SQL-portable set
PORTABLE = [f"q{i}_" for i in range(1, 18)]


@pytest.mark.parametrize(
    "name",
    [n for n in ORACLE_SQL if any(n.startswith(p) for p in PORTABLE)],
)
def test_sql_matches_dataframe(spark, name):
    register_views(spark, SF_DIR)
    via_sql = canonical(*spark_run(spark.sql(ORACLE_SQL[name])))
    via_df = canonical(*spark_run(ALL_QUERIES[name](spark, SF_DIR)))
    assert via_sql == via_df


def test_integer_division_truncates_on_both_engines(spark):
    """ADVICE r4: seasonal_hourly_profile's idx_permille identity relies
    on Spark `div` and DuckDB `//` agreeing on NEGATIVE operands. Both
    truncate toward zero — pin it so a DuckDB semantics change (to floor
    division) can't silently break engine parity."""
    import duckdb

    cases = [(-7, 2), (7, -2), (-7, -2), (7, 2), (-1, 3), (1, -3)]
    got_spark = spark.sql(
        "SELECT " + ", ".join(f"{a} div {b}" for a, b in cases)
    ).first()
    got_duck = duckdb.sql(
        "SELECT " + ", ".join(f"({a})//({b})" for a, b in cases)
    ).fetchone()
    assert list(got_spark) == list(got_duck)
    # and the truncation (not floor) semantics explicitly:
    assert list(got_duck) == [-3, -3, 3, 3, 0, 0]


def test_decimal_and_hugeint_division_parity(spark):
    """r11 rounding doctrine pins: (1) Spark `div` on decimal(38,0)
    truncates toward zero exactly like DuckDB HUGEINT `//` — the
    mean_ppm / rank-arithmetic oracles rely on it for negative sums;
    (2) DuckDB `//` on DECIMAL is NOT integer division (it returns a
    fractional quotient), so every oracle must CAST to HUGEINT first —
    pin the trap itself so a fix upstream gets noticed."""
    import duckdb

    cases = [(-7, 2), (7, -2), (-7, -2), (-1000001, 1000000)]
    got_spark = spark.sql(
        "SELECT " + ", ".join(
            f"cast({a} as decimal(38,0)) div cast({b} as decimal(38,0))"
            for a, b in cases)
    ).first()
    got_duck = duckdb.sql(
        "SELECT " + ", ".join(
            f"CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
            for a, b in cases)
    ).fetchone()
    assert [int(x) for x in got_spark] == [int(x) for x in got_duck] \
        == [-3, -3, 3, -1]
    # the DECIMAL // trap: fractional, not integral
    frac = duckdb.sql(
        "SELECT CAST(-7 AS DECIMAL(38,0)) // CAST(2 AS DECIMAL(38,0))"
    ).fetchone()[0]
    assert float(frac) == -3.5
