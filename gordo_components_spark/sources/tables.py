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

    - ``events.ts`` arrives as INT64 TIMESTAMP(NANOS).  Spark ≤4.0 reads
      it as long (``spark.sql.legacy.parquet.nanosAsLong``) and we
      truncate to micros; Spark 4.1+ ignores that conf and reads it as
      ``timestamp_ntz`` truncated to µs — same values, different type.
      Both normalize to session-TZ TIMESTAMP here (the session is pinned
      UTC by ``prepare``), bit-identical to DuckDB's
      ``CAST(ts AS TIMESTAMP)``.
    - ``embeddings.embedding`` is ``array<float>``; cast to
      ``array<double>`` once here so all downstream math is double.
    """
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if name == "embeddings":
        df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def _epoch_us(ts: str) -> int:
    from datetime import datetime, timezone

    return int(
        datetime.fromisoformat(ts).replace(tzinfo=timezone.utc).timestamp() * 1_000_000
    )


def load_events_in_range(
    spark: SparkSession,
    sf_dir: str,
    from_ts: str | None = None,
    to_ts: str | None = None,
    exclude: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """O9/O12 pushdown-preserving events scan.

    The µs timestamp is derived from the raw ns long, so a filter on the
    *converted* column can't reach the parquet scan.  Truncation is
    monotonic, so ``[from_ts, to_ts)`` on the converted column is exactly
    ``[from_us·1000, to_us·1000)`` on the raw long — filter raw first
    (PushedFilters + row-group min/max skipping), convert after.  At
    100 TB this is the difference between a pruned scan and a full one.
    """
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    raw_is_long = ts_type == "bigint"

    def bound(ts_str: str) -> "F.Column":
        # the filter literal must match the SCAN's column type, or the
        # comparison casts the column and the predicate never reaches the
        # parquet reader (PushedFilters + row-group min/max skipping):
        # raw epoch-ns long on ≤4.0's nanosAsLong read, a timestamp_ntz
        # literal on 4.1+'s native nanos read (truncation is monotonic,
        # so the µs bound is exact in every representation)
        if raw_is_long:
            return F.lit(_epoch_us(ts_str) * 1000)
        if ts_type == "timestamp_ntz":
            return F.lit(ts_str.replace("T", " ")).cast("timestamp_ntz")
        return F.lit(ts_str).cast("timestamp")

    cond = F.lit(True)
    if from_ts is not None:
        cond = cond & (F.col("ts") >= bound(from_ts))
    if to_ts is not None:
        cond = cond & (F.col("ts") < bound(to_ts))
    for lo, hi in exclude:
        cond = cond & ~((F.col("ts") >= bound(lo)) & (F.col("ts") < bound(hi)))
    df = df.where(cond)
    if raw_is_long:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
