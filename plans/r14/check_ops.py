#!/usr/bin/env python
"""Targeted per-op oracle check for the r14 optimization round.

    python plans/r14/check_ops.py sf0.001 name1 name2 ...
    python plans/r14/check_ops.py sf0.01  name1 name2 ...

Runs each named query side-by-side with its DuckDB oracle at the given
scale and prints ok/BAD per key. Measurement/verification tooling only —
not part of the bench or driver contract.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = f"/root/testdata/{sf}"

    from catalyst_spark.session import get_spark
    from catalyst_spark.queries import ALL_QUERIES, ORACLE_SQL
    from tests.oracle_harness import canonical, duck_run, spark_run

    spark = get_spark("check_ops_r14")
    n_bad = 0
    for name in names:
        try:
            s_cols, s_rows = canonical(*spark_run(
                ALL_QUERIES[name](spark, sf_dir)))
            d_cols, d_rows = canonical(*duck_run(ORACLE_SQL[name], sf_dir))
            ok = (s_cols == d_cols and s_rows == d_rows)
            detail = f"rows {len(s_rows)}/{len(d_rows)}"
        except Exception as e:
            ok, detail = False, f"{type(e).__name__}: {e}"[:300]
        n_bad += 0 if ok else 1
        print(f"{'ok ' if ok else 'BAD'} {name}  {detail}", flush=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
