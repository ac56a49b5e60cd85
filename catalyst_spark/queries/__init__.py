"""Analytical query surface (SURVEY §2.6) + LLM-pipeline operators.

Every query is a function ``(spark, sf_dir) -> DataFrame`` whose output
column names match the DuckDB oracle SQL in ``oracles.py`` exactly (the
driver sorts columns by name before value-hashing).
"""

from catalyst_spark.queries.relational import RELATIONAL_QUERIES
from catalyst_spark.queries.pipeline import PIPELINE_QUERIES
from catalyst_spark.queries.tsdb import TSDB_QUERIES
from catalyst_spark.queries.oracles import ORACLE_SQL

ALL_QUERIES = {**RELATIONAL_QUERIES, **PIPELINE_QUERIES, **TSDB_QUERIES}

__all__ = [
    "RELATIONAL_QUERIES",
    "PIPELINE_QUERIES",
    "TSDB_QUERIES",
    "ALL_QUERIES",
    "ORACLE_SQL",
]
