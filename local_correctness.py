#!/usr/bin/env python
"""Author-side oracle sweep artifact (VERDICT r3 item 8).

Runs EVERY `queries()` entry side-by-side with its DuckDB oracle at the
driver's correctness scale (sf0.01 by default) and writes
`CORRECTNESS_local_r{N}.json` in the driver's row format (rows_match /
schema_match / hash_match / counts / err per query), so a judge can diff
the full-coverage local sweep against the driver's 50-row window instead
of re-running it.

    python local_correctness.py 4          # writes CORRECTNESS_local_r4.json
    SPARK_GRAFT_SF_DIR=... python local_correctness.py 4
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from catalyst_spark.session import get_spark
    from catalyst_spark.queries import ALL_QUERIES, ORACLE_SQL
    from tests.oracle_harness import canonical, duck_run, spark_run

    spark = get_spark("catalyst_spark_local_correctness")
    results: dict[str, dict] = {}
    n_bad = 0
    for name, fn in ALL_QUERIES.items():
        row = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            s_cols, s_rows = canonical(*spark_run(fn(spark, sf_dir)))
            d_cols, d_rows = canonical(*duck_run(ORACLE_SQL[name], sf_dir))
            row.update(
                spark_rows=len(s_rows), oracle_rows=len(d_rows),
                rows_match=len(s_rows) == len(d_rows),
                schema_match=s_cols == d_cols,
                hash_match=s_rows == d_rows,
            )
        except Exception as e:  # record, keep sweeping
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = row
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        n_bad += 0 if ok else 1
        print(f"{'ok ' if ok else 'BAD'} {name}", flush=True)

    out = REPO / f"CORRECTNESS_local_r{rnd}.json"
    out.write_text(json.dumps(results, indent=1) + "\n")
    print(f"\n{len(results) - n_bad}/{len(results)} green -> {out.name}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
