"""Bit-exactness of the bounded-row chunked fold variants against their
whole-series twins on long synthetic series (VERDICT r3 item 3).

Two ladders of evidence, same exact integer recursion end to end:

- 20k points: chunked output == the unchunked operator's output,
  cell-for-cell, across chunk sizes (the direct comparison the verdict
  asked for, at the largest size where the unchunked operator's
  O(len^2) array-append fold is still cheap to run in a test).
- 100k points: chunked output == an exact integer reference recursion
  computed in Python (both CUSUM's max(0, s + d) scan and Holt's
  arithmetic-shift fixed-point recursion are pure int math, and
  Python's >> floors exactly like Spark's shiftright on bigint). The
  unchunked operators are quadratic in series length — ~150 s at 100k
  for CUSUM alone — which is precisely the scale flaw the chunked
  variants remove, so the reference recursion stands in for them here.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from catalyst_spark.queries.tsdb import (
    _CUSUM_ALARM_CENTS,
    _CUSUM_DRIFT_CENTS,
    cusum_changepoints,
    cusum_chunked,
    holt_chunked,
    holt_linear_smooth,
)


def _series_dir(spark, base, n):
    d = base / f"series_{n}"
    (
        spark.range(n)
        .select(
            F.lit(7).alias("user_id"),
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
            ).alias("ts"),
            # deterministic drifty/spiky values: ~U[0,100) via murmur3,
            # plus an 80.00 spike every 997 points so CUSUM exercises
            # both resets and alarm-crossing accumulation
            (
                ((F.hash(F.col("id")) % 10000 + 10000) % 10000) / 100.0
                + F.when(F.col("id") % 997 == 0, 80.0).otherwise(0.0)
            ).alias("value"),
            F.lit("click").alias("event_type"),
        )
        .coalesce(4)
        .write.parquet(str(d / "events.parquet"))
    )
    return str(d)


@pytest.fixture(scope="module")
def dir_20k(spark, tmp_path_factory):
    return _series_dir(spark, tmp_path_factory.mktemp("chunked"), 20_000)


@pytest.fixture(scope="module")
def dir_100k(spark, tmp_path_factory):
    return _series_dir(spark, tmp_path_factory.mktemp("chunked"), 100_000)


def _rows(df):
    # Order-insensitive, like both correctness harnesses (each sorts
    # rows as python tuples): the r14 optimization round removed the
    # terminal display sorts, so collect() order is partition order.
    return sorted(tuple(r) for r in df.collect())


def _collect_cents(spark, sf_dir):
    """(event_id, cents) in series order, exactly as the operators see."""
    from catalyst_spark.tables import load

    return [
        (r["event_id"], r["c"])
        for r in load(spark, sf_dir, "events")
        .select(
            "event_id", F.expr("cast(round(value * 100) as bigint)").alias("c")
        )
        .orderBy("ts", "event_id")
        .collect()
    ]


def test_cusum_chunked_matches_unchunked_20k(spark, dir_20k):
    want = _rows(cusum_changepoints(spark, dir_20k))
    assert len(want) > 500
    for chunk in (977, 4096):
        assert _rows(cusum_chunked(spark, dir_20k, chunk=chunk)) == want


def test_holt_chunked_matches_unchunked_20k(spark, dir_20k):
    want = _rows(holt_linear_smooth(spark, dir_20k))
    assert len(want) == 20_000
    assert _rows(holt_chunked(spark, dir_20k, chunk=2048)) == want


def test_cusum_chunked_matches_exact_recursion_100k(spark, dir_100k):
    got = _rows(cusum_chunked(spark, dir_100k, chunk=8192))
    s, want = 0, []
    for eid, cents in _collect_cents(spark, dir_100k):
        s = max(0, s + cents - _CUSUM_DRIFT_CENTS)
        if s > 0:
            want.append((eid, 7, s, 1 if s >= _CUSUM_ALARM_CENTS else 0))
    assert len(want) > 5000
    assert got == sorted(want)


def test_holt_chunked_matches_exact_recursion_100k(spark, dir_100k):
    got = _rows(holt_chunked(spark, dir_100k, chunk=8192))
    lvl = tr = 0
    want = []
    for i, (eid, cents) in enumerate(_collect_cents(spark, dir_100k)):
        v = cents << 8
        if i == 0:
            lvl, tr = v, 0
        else:
            nlvl = (v + lvl + tr) >> 1  # arithmetic shift == Spark's
            tr = (nlvl - lvl + tr) >> 1
            lvl = nlvl
        want.append((eid, 7, lvl / 25600.0, tr / 25600.0))
    assert got == sorted(want)


def test_chunked_plans_have_no_python_and_no_cartesian(spark):
    """Same scale guards the other operators carry: the chunked
    variants stay entirely JVM-side and never cross-join."""
    from tests.conftest import SF_DIR

    for fn in (cusum_chunked, holt_chunked):
        plan = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Cartesian" not in plan
        assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_chunk_size_invariance_multi_series(spark, tmp_path):
    """Chunk size must be invisible: many series, awkward chunk sizes
    (1, prime, larger-than-series) all reproduce the whole-series fold
    on the standard sf0.001 corpus."""
    from tests.conftest import SF_DIR

    want_c = _rows(cusum_changepoints(spark, SF_DIR))
    want_h = _rows(holt_linear_smooth(spark, SF_DIR))
    for chunk in (1, 7, 1000):
        assert _rows(cusum_chunked(spark, SF_DIR, chunk=chunk)) == want_c, chunk
    # holt's carry is a per-chunk-index job loop; chunk=1 would mean
    # one job per point — skip it, sweep a prime and an over-size
    for chunk in (7, 1000):
        assert _rows(holt_chunked(spark, SF_DIR, chunk=chunk)) == want_h, chunk


def test_holt_adaptive_chunk_bounds_job_count(spark, dir_20k):
    """VERDICT r4 item 8: with no explicit chunk, holt_chunked sizes
    chunks as ceil(max_series_len / _HOLT_TARGET_JOBS) (floored at
    _SERIES_CHUNK), bounding the sequential carry chain to the job
    budget for arbitrarily long series — and stays bit-exact."""
    from catalyst_spark.queries.tsdb import _HOLT_TARGET_JOBS, _SERIES_CHUNK

    # sizing law, directly
    for max_len, want in ((66, _SERIES_CHUNK), (100_000, 3125),
                          (1_000_000, 31_250)):
        got = max(_SERIES_CHUNK, -(-max_len // _HOLT_TARGET_JOBS))
        assert got == want and -(-max_len // got) <= max(
            _HOLT_TARGET_JOBS, -(-max_len // _SERIES_CHUNK))

    # adaptive default == explicit-chunk output on a real long series
    # (20k points -> chunk 625, 32 sequential jobs instead of 1250)
    want_rows = _rows(holt_chunked(spark, dir_20k, chunk=2048))
    assert _rows(holt_chunked(spark, dir_20k)) == want_rows
