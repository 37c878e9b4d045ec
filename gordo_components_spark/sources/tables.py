"""Table scans over the driver-generated parquet fixtures.

Reference analog: ``gordo_components/dataset/data_provider/`` — each
provider's ``load_series(from_ts, to_ts, tag_list)`` is a per-tag lazy
scan with time-range pushdown (SURVEY §2 O1–O5).  Spark-first restatement:
one declarative ``spark.read.parquet`` per table; Catalyst gets predicate
pushdown, column pruning and partition pruning for free (SURVEY §4 P1–P3),
so there is no hand-rolled thread pool or per-file loop here.

At 100 TB the same call reads a hive-partitioned (``date=``/``asset=``)
layout with identical code — only the path changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.session import prepare

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table, normalizing its schema for the engine.

    - ``events.ts`` arrives as INT64 TIMESTAMP(NANOS); Spark reads it as
      long (``spark.sql.legacy.parquet.nanosAsLong``) and we truncate to
      micros — bit-identical to DuckDB's ``CAST(ts AS TIMESTAMP)``.
    - ``embeddings.embedding`` is ``array<float>``; cast to
      ``array<double>`` once here so all downstream math is double.
    """
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name == "embeddings":
        df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
