#!/usr/bin/env python
"""Full-registry build-vs-exec profiler for the r15 optimization round.

Replicates bench.py's per-pass methodology (cold session caches, shared
builds timed first, bench ordering) but records, per registry key:

  t_build — fn(spark, sf_dir): py4j construction + analysis time
  t_exec  — noop write of the returned DataFrame: execution time

so the round can see how much of queries_total is driver-side
construction (the OPTIMIZATION_r14 change-19 lens, applied
systematically) vs actual cluster work.

    python plans/r15/profile_registry.py [passes]

Writes plans/r15/profile_registry.json. Measurement tooling only; not
part of the bench contract.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from catalyst_spark.session import get_spark
    from catalyst_spark.queries import ALL_QUERIES
    from catalyst_spark.queries.pipeline import reset_session_caches
    import bench

    spark = get_spark("profile_r15", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4))

    # same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from catalyst_spark.tables import TABLES, load as load_table
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).collect()

    _build_owners = ("dedup_prefix_filter", "dedup_minhash_pairs",
                     "dedup_clusters")
    ordered = [
        *((n, ALL_QUERIES[n]) for n in _build_owners if n in ALL_QUERIES),
        *((n, f) for n, f in ALL_QUERIES.items() if n not in _build_owners),
    ]

    builds: dict[str, list[float]] = {n: [] for n, _ in ordered}
    execs: dict[str, list[float]] = {n: [] for n, _ in ordered}
    sb: dict[str, list[float]] = {}

    for p in range(passes):
        reset_session_caches(spark)
        for n, t in bench._time_shared_builds(spark, SF_DIR).items():
            sb.setdefault(n, []).append(t)
        for name, fn in ordered:
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds[name].append(t1 - t0)
            execs[name].append(t2 - t1)
        print(f"pass {p + 1}/{passes} done", flush=True)

    med = lambda xs: round(statistics.median(xs), 3)
    out = {
        "sf_dir": SF_DIR,
        "passes": passes,
        "build": {n: med(ts) for n, ts in builds.items()},
        "exec": {n: med(ts) for n, ts in execs.items()},
        "total": {n: med([b + e for b, e in zip(builds[n], execs[n])])
                  for n in builds},
        "shared_builds": {n: med(ts) for n, ts in sb.items()},
    }
    out["build_total"] = round(sum(out["build"].values()), 2)
    out["exec_total"] = round(sum(out["exec"].values()), 2)
    (REPO / "plans" / "r15" / "profile_registry.json").write_text(
        json.dumps(out, indent=1))

    rows = sorted(out["total"].items(), key=lambda kv: -kv[1])
    print(f"\nbuild_total={out['build_total']}  exec_total={out['exec_total']}")
    print(f"{'key':38s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name, tot in rows[:60]:
        print(f"{name:38s} {out['build'][name]:7.3f} "
              f"{out['exec'][name]:7.3f} {tot:7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
