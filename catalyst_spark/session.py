"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster deployment would set per-job:
AQE on (runtime re-plan, skew-join handling), shuffle partitions sized to
cores (would be ~2-3x total cluster cores at scale), UTC session timezone
(required for DuckDB-oracle comparison — DuckDB timestamps are UTC-naive),
Arrow enabled for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# map_concat with duplicate keys must keep the LAST value: the reference's
# Prometheus path merges URL-path labels OVER scraped labels
# (ref catalyser/prometheus.go:96-99 — extra labels override inner ones).
_MAP_DEDUP_POLICY = "LAST_WIN"


def get_spark(app_name: str = "catalyst_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.mapKeyDedupPolicy", _MAP_DEDUP_POLICY)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Distribute catalyst_spark to executor Python workers.

    The mapInPandas parsers (influx, remote_write) reference this package
    from worker processes; on a real cluster the code must travel with
    the job. addPyFile of a package zip is the standard mechanism and
    also fixes local-mode sessions launched from another cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    marker = "_catalyst_spark_shipped"
    if spark.conf.get(f"spark.{marker}", None) == "true":
        return
    zpath = os.path.join(tempfile.gettempdir(), "catalyst_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark.conf.set(f"spark.{marker}", "true")


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime confs to a session we did not
    build (the driver hands us one in ``__spark_entry__.entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", _MAP_DEDUP_POLICY)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet carries TIMESTAMP(NANOS) — readable only as LONG.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ship_package(spark)
    return spark
