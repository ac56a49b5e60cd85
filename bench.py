#!/usr/bin/env python
"""Per-round benchmark: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (computes every column
— a bare count() would let Catalyst prune the expensive expressions and
under-report).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from catalyst_spark.session import get_spark
    from catalyst_spark.queries import ALL_QUERIES

    spark = get_spark("catalyst_spark_bench", cpus=cpus)

    # JVM/codegen warm-up + parquet footer/FS cache priming outside the
    # timed region (the first scan otherwise pays one-time costs that
    # are not query work)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from catalyst_spark.tables import TABLES, load as load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()

    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # run the owners of session-shared builds FIRST so their one-time
    # cost (verified prefix pairs, minhash signature index) is timed
    # against the operator that owns it, not whichever downstream
    # consumer happens to run first in registry order; consumers then
    # show their true marginal cost.
    _build_owners = ("dedup_prefix_filter", "dedup_minhash_pairs")
    ordered = [
        *((n, ALL_QUERIES[n]) for n in _build_owners if n in ALL_QUERIES),
        *((n, f) for n, f in ALL_QUERIES.items() if n not in _build_owners),
    ]

    def _reset_session_caches() -> None:
        """Return the session to a cold state so every timing pass pays
        the same costs: drop the module-level shared-build caches (the
        verified prefix pairs and connected-component labels) and every
        cache-manager entry (minhash/simhash signature tables persist by
        logical plan)."""
        from catalyst_spark.queries import pipeline as _p

        for cache in (_p._PREFIX_PAIRS_CACHE, _p._CC_LABEL_CACHE):
            for df in cache.values():
                try:
                    df.unpersist()
                except Exception:
                    pass
            cache.clear()
        spark.catalog.clearCache()

    # median-of-n per query: one timing per pass, each pass fully cold, so
    # sub-second ambient noise can't masquerade as a regression while
    # build-owner attribution stays identical in every pass
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {n: [] for n, _ in ordered}
    for _ in range(runs):
        _reset_session_caches()
        for name, fn in ordered:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    timings = {
        n: round(sorted(ts)[len(ts) // 2], 3) for n, ts in samples.items()
    }
    spread = {n: round(max(ts) - min(ts), 3) for n, ts in samples.items()}

    # ingest-path throughput: synthesize wire lines from the events table
    # and measure parse -> encode end-to-end (rows/sec, JVM-side paths)
    from pyspark.sql import functions as F
    from catalyst_spark.encode import encode_sensision
    from catalyst_spark.parsers import parse_graphite
    from catalyst_spark.schema import permissive
    from catalyst_spark.tables import load as load_table2

    events = load_table2(spark, sf_dir, "events")
    lines = events.select(
        F.concat_ws(
            " ",
            F.concat(F.lit("evt."), F.col("event_type"), F.lit(";user="),
                     F.col("user_id").cast("string")),
            F.col("value").cast("string"),
            F.unix_millis(F.col("ts")).cast("string"),
        ).alias("line")
    )
    # x16 so per-job fixed cost doesn't dominate the throughput figure
    for _ in range(4):
        lines = lines.unionAll(lines)
    lines = lines.repartition(cpus).persist()
    n_lines = lines.count()

    def _timed(df):
        df.write.format("noop").mode("overwrite").save()  # codegen warm-up
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    parse_s = _timed(encode_sensision(permissive(parse_graphite(lines))))

    # influx ingest: same events as line protocol (2 fields per line ->
    # 2 GTS rows after fan-out); the JVM fast path handles all of these
    from catalyst_spark.parsers import parse_influx

    influx_lines = events.select(
        F.concat(
            F.lit("evt,type="), F.col("event_type"),
            F.lit(",user="), F.col("user_id").cast("string"),
            F.lit(" value="), F.col("value").cast("string"), F.lit(",n=1i"),
            F.lit(" "), (F.unix_micros("ts") * 1000).cast("string"),
        ).alias("line")
    )
    for _ in range(4):
        influx_lines = influx_lines.unionAll(influx_lines)
    influx_lines = influx_lines.repartition(cpus).persist()
    n_influx = influx_lines.count()
    influx_s = _timed(
        encode_sensision(permissive(parse_influx(influx_lines, now_ns=0)))
    )
    lines.unpersist()
    influx_lines.unpersist()

    # SRP-LSH pruning evidence: candidate pairs vs all-pairs (the
    # sub-quadratic claim, measured not asserted)
    from catalyst_spark.queries.pipeline import _srp_planes

    emb = load_table2(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    planes_df = spark.createDataFrame(
        _srp_planes(), "t INT, k INT, signs ARRAY<DOUBLE>"
    )
    buckets = (
        v.crossJoin(F.broadcast(planes_df))
        .select("vec_id", "t", "k", F.expr(
            "aggregate(zip_with(e, signs, (x, s) -> x * s),"
            " cast(0 as double), (a, x) -> a + x)").alias("dot"))
        .groupBy("vec_id", "t")
        .agg(F.sum(F.expr(
            "CASE WHEN dot > 0 THEN shiftleft(cast(1 as bigint), k)"
            " ELSE cast(0 as bigint) END")).alias("bucket"))
    )
    n_vec = emb.count()
    lsh_cand = (
        buckets.alias("l")
        .join(buckets.alias("r"),
              (F.col("l.t") == F.col("r.t"))
              & (F.col("l.bucket") == F.col("r.bucket"))
              & (F.col("l.vec_id") < F.col("r.vec_id")))
        .select("l.vec_id", "r.vec_id").distinct().count()
    )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "catalyst_spark_all_queries_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "bench_runs": runs,
        "sf": sf,
        "ingest_rows_per_sec": round(n_lines / parse_s),
        "ingest_rows": n_lines,
        "influx_lines_per_sec": round(n_influx / influx_s),
        "influx_lines": n_influx,
        "lsh_candidate_pairs": lsh_cand,
        "lsh_all_pairs": n_vec * (n_vec - 1) // 2,
    }

    # machine-checked regression tracking: ratio vs the previous run's
    # committed summary (only at the same sf — cross-sf ratios are noise)
    summary_path = REPO / "bench_summary.json"
    try:
        prev = json.loads(summary_path.read_text())
    except (OSError, ValueError):
        prev = None
    if prev and prev.get("sf") == sf and prev.get("queries"):
        pq = prev["queries"]
        payload["prev_value"] = prev.get("value")
        payload["vs_prev"] = {
            n: round(t / pq[n], 2) for n, t in timings.items()
            if pq.get(n)
        }
        # flag only material regressions (>1.3x AND >0.3 s absolute —
        # sub-second timings swing with ambient load)
        payload["regressions"] = sorted(
            n for n, r in payload["vs_prev"].items()
            if r > 1.3 and timings[n] - pq[n] > 0.3
        )

    # the driver keeps only a bounded stdout TAIL, which can truncate
    # this (long) line — the durable copy lives in bench_summary.json
    summary_path.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload), flush=True)
    # compact trailer (no per-query map) small enough to always fit in a
    # truncated tail window
    print(json.dumps({k: v for k, v in payload.items()
                      if k not in ("queries", "vs_prev", "spread")}),
          flush=True)


if __name__ == "__main__":
    main()
