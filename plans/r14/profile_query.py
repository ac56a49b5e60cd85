#!/usr/bin/env python
"""Per-query profiling harness for the r14 optimization round.

For each named query: time DataFrame construction (Python + analysis),
cold noop execution, warm noop execution, count Spark jobs/stages via
the status tracker, and write explain("formatted") to
plans/r14/<name>_<tag>.txt.

    python plans/r14/profile_query.py <tag> name1 name2 ...
    python plans/r14/profile_query.py <tag> --top N   # N most expensive from bench_summary.json

Not part of the bench contract; measurement tooling only.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--top":
        n = int(names[1])
        qs = json.load(open(REPO / "bench_summary.json"))["queries"]
        names = [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:n]]

    from catalyst_spark.session import get_spark
    from catalyst_spark.queries import ALL_QUERIES

    spark = get_spark("profile_r14")
    sc = spark.sparkContext
    out_dir = REPO / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for name in names:
        fn = ALL_QUERIES[name]
        tracker = sc.statusTracker()
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t_warm = time.perf_counter() - t0
        after_jobs = set(tracker.getJobIdsForGroup(None) or [])
        n_jobs = len(after_jobs - before_jobs)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        n_exch = plan.count("Exchange")
        rows.append((name, t_build, t_cold, t_warm, n_jobs, n_exch))
        print(f"{name:36s} build={t_build:6.2f} cold={t_cold:6.2f} "
              f"warm={t_warm:6.2f} jobs={n_jobs:3d} exch={n_exch:3d}",
              flush=True)

    print("\nname,build,cold,warm,jobs,exchanges")
    for r in rows:
        print(",".join(str(x) for x in r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
