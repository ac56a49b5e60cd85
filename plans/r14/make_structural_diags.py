"""Generate structural diag plans for ops whose committed terminal plans
are checkpoint-collapsed (the result is localCheckpointed so a shared
persist can be released, which hides the interesting structure from the
terminal explain).

- curation_funnel_stage_diag.txt: the funnel chain with the terminal
  localCheckpoint disabled — shows the single persisted per-doc
  projection, the survival-level aggregate and the broadcast stage axis.
- ann_nprobe_sweep_swept_diag.txt: the explain of every frame the op
  persists (captured via a persist hook) — shows the swept pair frame
  projecting (q_id, n_id, mcrank, sq_d2) only, no 64-long code arrays.

Run:  python plans/r14/make_structural_diags.py /root/testdata/sf0.1
"""
import io
import sys
import contextlib

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
# Spark 4: runtime instances are the classic subclass, which overrides
# the methods — patch it, not the abstract pyspark.sql.DataFrame parent.
from pyspark.sql.classic.dataframe import DataFrame

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r14"


def _fmt(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("r14-structural-diags")
        .getOrCreate()
    )
    from catalyst_spark.session import configure_existing

    configure_existing(spark)
    from catalyst_spark.queries import pipeline

    # 1. curation_funnel with the terminal checkpoint disabled: patch
    #    localCheckpoint to identity for the duration of the build.
    orig_ckpt = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        funnel = pipeline.curation_funnel(spark, SF_DIR)
        with open(f"{OUT}/curation_funnel_stage_diag.txt", "w") as f:
            f.write(_fmt(funnel))
    finally:
        DataFrame.localCheckpoint = orig_ckpt

    # 2. ann_nprobe_sweep: capture each frame the op persists.
    captured = []
    orig_persist = DataFrame.persist

    def hook(self, *a, **kw):
        captured.append(self)
        return orig_persist(self, *a, **kw)

    DataFrame.persist = hook
    try:
        pipeline.ann_nprobe_sweep(spark, SF_DIR)
    finally:
        DataFrame.persist = orig_persist
    with open(f"{OUT}/ann_nprobe_sweep_swept_diag.txt", "w") as f:
        for i, df in enumerate(captured):
            f.write(f"== persisted frame {i}: columns {df.columns}\n")
            f.write(_fmt(df))
            f.write("\n")
    print("diag plans written:", len(captured), "persisted frames captured")


if __name__ == "__main__":
    main()
