"""User-facing dataset layer — the reference's main API, Spark-backed.

Reference: ``gordo_components/dataset/datasets.py::TimeSeriesDataset``,
``dataset/sensor_tag.py::SensorTag``/``normalize_sensor_tags``.  A user
of the reference configures ``(tag_list, train_start_date,
train_end_date, resolution, row_filter, …)`` and calls ``get_data()``
for an aligned ``(X, y)`` pair; this class keeps that exact surface but
returns Spark DataFrames built from one declarative plan:

    pushdown time-range scan (O9) → per-tag resample (O18) → wide
    alignment pivot + inner dropna (O15) → row-filter DSL + buffer
    (O10/O11) → known-period blackouts (O12) → n_samples gate (O13) →
    X/y projection (O14)

On the fixture, ``asset`` ≈ ``user_id`` (machine) and tag ≈
``event_type`` (FIXTURES.md role mapping); a custom ``provider``
callable swaps in any long-format source with (ts, tag, value) columns.
"""

from __future__ import annotations

from datetime import datetime
from typing import Callable, NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.functions.filter_dsl import compile_filter
from gordo_components_spark.functions.timeseries import RESAMPLE_METHODS
from gordo_components_spark.sources.tables import load_events_in_range


class SensorTag(NamedTuple):
    """D1 sensor identity (reference ``sensor_tag.py::SensorTag``)."""

    name: str
    asset: str | None = None


def normalize_sensor_tags(tags: list, asset: str | None = None) -> list[SensorTag]:
    """Accept ``str`` / ``dict`` / ``SensorTag`` forms, like the
    reference's ``normalize_sensor_tags`` (load-format tolerance)."""
    out: list[SensorTag] = []
    for t in tags:
        if isinstance(t, SensorTag):
            out.append(t)
        elif isinstance(t, str):
            out.append(SensorTag(t, asset))
        elif isinstance(t, dict):
            out.append(SensorTag(t["name"], t.get("asset", asset)))
        elif isinstance(t, (list, tuple)) and len(t) == 2:
            out.append(SensorTag(t[0], t[1]))
        else:
            raise ValueError(f"cannot normalize sensor tag {t!r}")
    return out


class InsufficientDataError(ValueError):
    """O13: fewer rows than ``n_samples_threshold`` after filtering."""


_RES_UNITS = {
    "S": "seconds",
    "T": "minutes",
    "MIN": "minutes",
    "H": "hours",
    "D": "days",
}


def resolution_to_duration(resolution: str) -> str:
    """pandas offset alias ("10T", "1H", "30S") → Spark duration string."""
    s = resolution.strip().upper()
    i = 0
    while i < len(s) and (s[i].isdigit() or s[i] == "."):
        i += 1
    num = s[:i] or "1"
    unit = s[i:].strip()
    if unit not in _RES_UNITS:
        raise ValueError(f"unsupported resolution {resolution!r}")
    return f"{num} {_RES_UNITS[unit]}"


def _require_tz_aware(name: str, value: datetime | str) -> datetime:
    """The reference hard-requires tz-aware bounds (ValueError otherwise)."""
    if isinstance(value, str):
        value = datetime.fromisoformat(value.replace("Z", "+00:00"))
    if value.tzinfo is None:
        raise ValueError(f"{name} must be timezone-aware, got naive {value!r}")
    return value


def _buffered_filter(wide: DataFrame, predicate: str, b: int) -> DataFrame:
    """O11 buffer dilation over the aligned matrix WITHOUT a global
    single-partition window: a row is kept iff no failing row lies within
    ±``b`` rows of it in timestamp order.

    The single-machine matrix has no partition key, so a plain
    ``MIN(ok) OVER (ORDER BY ts ROWS ±b)`` serializes the whole frame on
    one executor — the scale-killer flagged in round 1.  Instead:

    1. ``repartitionByRange(ts)`` + per-partition ``row_number`` with
       broadcast cumulative offsets → a DENSE global row index, computed
       with only per-partition windows (classic distributed row-number).
    2. Block the index into fixed ``B``-row blocks; copy each block's
       first/last ``b`` rows to its neighbor blocks (edge overlap).
    3. ``MIN(ok)`` over ``PARTITION BY block ORDER BY rn ROWS ±b`` — a
       partitioned window whose frames are exact because the index is
       dense and the overlap supplies every cross-block neighbor.

    Exactness requires only ``b < B`` (``B = max(64, 8·b)``); results are
    bit-identical to the global window at any partition count.

    ``marked`` feeds TWO subtrees (counts→offsets and idx), and the dense
    index is only correct if both see the SAME ``__pid`` assignment and
    intra-partition order.  Two guards make that hold on a real cluster
    (task retry / speculation / nondeterministic upstream order): the
    range exchange takes an explicit partition count (AQE-exempt, so the
    two consumers can't be re-planned differently), and ``marked`` is
    persisted so both subtrees read one materialization instead of
    re-evaluating the exchange."""
    from pyspark.sql import Window

    n_parts = wide.sparkSession.sparkContext.defaultParallelism
    marked = (
        wide.withColumn("__ok", F.when(F.expr(predicate), 1).otherwise(0))
        .repartitionByRange(n_parts, "ts")
        .sortWithinPartitions("ts")
        .withColumn("__pid", F.spark_partition_id())
    )
    from gordo_components_spark.caches import persist_tracked

    marked = persist_tracked(marked)
    # tiny frame (one row per partition): running offset of each partition
    # via a metadata-scale self-join (≤ P² pairs), so the plan carries NO
    # SinglePartition node anywhere — not even on the offsets frame
    counts = marked.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    c1, c2 = counts.alias("c1"), counts.alias("c2")
    offsets = (
        c1.join(F.broadcast(c2), F.col("c2.__pid") < F.col("c1.__pid"), "left")
        .groupBy(F.col("c1.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("c2.__cnt"), F.lit(0)).alias("__off"))
    )
    block = max(64, 8 * b)
    idx = (
        marked.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__pid").orderBy("ts"))
            + F.col("__off")
            - 1,
        )
        .withColumn("__blk", F.floor(F.col("__rn") / block))
    )
    owned = idx.withColumn("__dest", F.col("__blk"))
    head = idx.where(F.col("__rn") % block < b).withColumn("__dest", F.col("__blk") - 1)
    tail = idx.where(F.col("__rn") % block >= block - b).withColumn(
        "__dest", F.col("__blk") + 1
    )
    aug = owned.unionByName(head).unionByName(tail)
    w_keep = Window.partitionBy("__dest").orderBy("__rn").rowsBetween(-b, b)
    return (
        aug.withColumn("__keep", F.min("__ok").over(w_keep))
        .where((F.col("__dest") == F.col("__blk")) & (F.col("__keep") == 1))
        .drop("__ok", "__pid", "__off", "__rn", "__blk", "__dest", "__keep")
    )


class TimeSeriesDataset:
    """Reference ``TimeSeriesDataset`` surface on a Spark plan."""

    def __init__(
        self,
        train_start_date: datetime | str,
        train_end_date: datetime | str,
        tag_list: list,
        target_tag_list: list | None = None,
        resolution: str = "10T",
        row_filter: str | None = None,
        row_filter_buffer_size: int = 0,
        known_filter_periods: list[tuple[str, str]] | None = None,
        n_samples_threshold: int = 0,
        aggregation_methods: str | list[str] = "mean",
        asset_id: int | None = None,
        provider: Callable[[SparkSession], DataFrame] | None = None,
    ):
        self.train_start_date = _require_tz_aware("train_start_date", train_start_date)
        self.train_end_date = _require_tz_aware("train_end_date", train_end_date)
        if self.train_start_date >= self.train_end_date:
            raise ValueError("train_start_date must be before train_end_date")
        self.tag_list = normalize_sensor_tags(tag_list)
        self.target_tag_list = normalize_sensor_tags(target_tag_list or tag_list)
        self.resolution = resolution
        self.row_filter = row_filter
        self.row_filter_buffer_size = row_filter_buffer_size
        self.known_filter_periods = known_filter_periods or []
        self.n_samples_threshold = n_samples_threshold
        methods = aggregation_methods if isinstance(aggregation_methods, list) else [aggregation_methods]
        self.aggregation_methods = ["avg" if m == "mean" else m for m in methods]
        # _wide splices each method name into F.expr(f"{m}(value)") — the
        # YAML-config path lands HERE, not in functions/timeseries.resample,
        # so the whitelist must gate this entry point too or arbitrary
        # config text reaches the SQL parser verbatim.
        for m in self.aggregation_methods:
            if m not in RESAMPLE_METHODS:
                raise ValueError(
                    f"unsupported aggregation method {m!r}; one of "
                    f"{sorted(RESAMPLE_METHODS)}"
                )
        self.asset_id = asset_id
        self.provider = provider

    # -- plan construction -------------------------------------------------

    def _long_source(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        """Long-format (ts, tag, value) scan with O9/O12 pushdown."""
        if self.provider is not None:
            df = self.provider(spark)
        else:
            # pass the aware datetimes straight through: strftime used to
            # drop a non-UTC offset's information (a +02:00 bound silently
            # shifted the whole training window two hours); the loader now
            # normalizes aware datetimes to UTC itself
            df = load_events_in_range(
                spark,
                sf_dir,
                self.train_start_date,
                self.train_end_date,
                exclude=tuple(self.known_filter_periods),
            ).select(
                "ts", F.col("event_type").alias("tag"), "value", F.col("user_id").alias("asset")
            )
            if self.asset_id is not None:
                df = df.where(F.col("asset") == self.asset_id)
        tags = [t.name for t in {*self.tag_list, *self.target_tag_list}]
        return df.where(F.col("tag").isin(tags))

    def _wide(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        duration = resolution_to_duration(self.resolution)
        long_df = self._long_source(spark, sf_dir)
        tags = sorted({t.name for t in {*self.tag_list, *self.target_tag_list}})
        multi = len(self.aggregation_methods) > 1
        aggs = []
        for m in self.aggregation_methods:
            col = F.expr(f"{m}(value)")
            if m in ("avg", "mean", "stddev", "stddev_samp"):
                col = F.round(col, 9)
            aggs.append(col.alias(m))
        # resample (O18) then pivot (O15); MultiIndex (tag, method) flattens
        # to tag__method when multiple methods (SURVEY §1.2)
        wide = (
            long_df.groupBy(F.window("ts", duration).alias("w"), "tag")
            .agg(*aggs)
            .groupBy(F.col("w.start").alias("ts"))
            .pivot("tag", tags)
            .agg(
                *[
                    F.first(m).alias(m) if multi else F.first(m)
                    for m in self.aggregation_methods
                ]
            )
        )
        if multi:
            cols = [f"`{t}_{m}`" for t in tags for m in self.aggregation_methods]
            renames = {f"{t}_{m}": f"{t}__{m}" for t in tags for m in self.aggregation_methods}
            for old, new in renames.items():
                wide = wide.withColumnRenamed(old, new)
            value_cols = list(renames.values())
        else:
            value_cols = tags
        # inner alignment: drop any bucket missing a tag (O15 dropna)
        wide = wide.dropna(subset=value_cols)
        # row-filter DSL + buffer (O10/O11)
        if self.row_filter:
            predicate = compile_filter(self.row_filter, columns=value_cols + ["ts"])
            if self.row_filter_buffer_size > 0:
                wide = _buffered_filter(wide, predicate, self.row_filter_buffer_size)
            else:
                wide = wide.where(F.expr(predicate))
        return wide.orderBy("ts")

    def get_data(self, spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
        """(X, y) aligned wide frames (O14 projection + O13 gate)."""
        wide = self._wide(spark, sf_dir)
        n = wide.count()
        if n < self.n_samples_threshold:
            raise InsufficientDataError(
                f"{n} rows after filtering < n_samples_threshold={self.n_samples_threshold}"
            )
        multi = len(self.aggregation_methods) > 1

        def cols_for(tag_list):
            if multi:
                return [f"{t.name}__{m}" for t in tag_list for m in self.aggregation_methods]
            return [t.name for t in tag_list]

        X = wide.select("ts", *cols_for(self.tag_list))
        y = wide.select("ts", *cols_for(self.target_tag_list))
        return X, y
