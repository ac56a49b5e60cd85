"""Local twin of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, sorts
columns by name and rows by value, and compares cell-for-cell (floats
exactly — both sides ROUND to 2 decimals by contract, so any difference
is a real semantics divergence, not noise).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from catalyst_spark.tables import TABLES


def _norm(v):
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def duck_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def spark_run(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_cols = [cols[i] for i in order]
    out_rows = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return out_cols, out_rows


def compare(spark_df, oracle_sql: str, sf_dir: str):
    s_cols, s_rows = canonical(*spark_run(spark_df))
    d_cols, d_rows = canonical(*duck_run(oracle_sql, sf_dir))
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"row {i} mismatch:\n  spark={a}\n  duck ={b}"
