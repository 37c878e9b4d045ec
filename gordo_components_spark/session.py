"""SparkSession construction + per-session normalization.

The driver passes its own SparkSession to ``queries()`` callables, so
anything we depend on must be applied at runtime via ``prepare(spark)``
(all of these are runtime-settable SQL confs), not only at build time.

Scale posture (SURVEY §4): AQE on (4.x default) handles join strategy,
skew splitting and shuffle-partition coalescing at 100 TB; Arrow for
every pandas-UDF boundary; session timezone pinned UTC so naive parquet
timestamps mean the same thing in Spark and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_RUNTIME_CONFS = {
    # events.parquet is INT64 TIMESTAMP(NANOS).  Spark ≤4.0 needs this
    # conf to read it (as long; sources/tables.py converts).  Spark 4.1+
    # IGNORES it and reads timestamp_ntz natively — tables.py handles
    # both worlds; either way values match DuckDB's CAST(ts AS TIMESTAMP)
    # µs truncation.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime confs to any session (incl. the driver's)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path sets it below
    return spark


def get_spark(app_name: str = "gordo-components-spark", cpus: int | None = None) -> SparkSession:
    """Local session for tests/bench; cluster deployments supply their own."""
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(8, n)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table home (co-located joins; see tests/test_bucketed_join.py)
        .config("spark.sql.warehouse.dir", "/tmp/gordo_spark_warehouse")
        # fixtures are single smallish parquet files; without a minimum
        # split count a 20MB file scans on ONE core — split to the
        # session's parallelism (clusters get this for free from many files)
        .config("spark.sql.files.minPartitionNum", str(n))
        .config("spark.sql.files.maxPartitionBytes", "16m")
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    return prepare(b.getOrCreate())
