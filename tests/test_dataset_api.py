"""User-facing API tests: TimeSeriesDataset / ModelBuilder / workflow
loader (reference ``tests/.../dataset/test_dataset.py``,
``builder/test_builder.py``, workflow tests; FIXTURES B1/B3 semantics)."""

import pytest

from gordo_components_spark.builder import ModelBuilder
from gordo_components_spark.dataset import (
    InsufficientDataError,
    SensorTag,
    TimeSeriesDataset,
    normalize_sensor_tags,
    resolution_to_duration,
)
from gordo_components_spark.plans.model_registry import ModelRegistry
from gordo_components_spark.workflow import ConfigError, load_config

START, END = "2024-01-01T00:00:00Z", "2024-01-20T00:00:00Z"
TAGS = ["click", "view", "purchase"]


def test_normalize_sensor_tags_forms():
    tags = normalize_sensor_tags(
        ["T1", {"name": "T2", "asset": "a2"}, SensorTag("T3", "a3"), ("T4", "a4")],
        asset="dflt",
    )
    assert tags == [
        SensorTag("T1", "dflt"),
        SensorTag("T2", "a2"),
        SensorTag("T3", "a3"),
        SensorTag("T4", "a4"),
    ]
    with pytest.raises(ValueError):
        normalize_sensor_tags([42])


def test_resolution_mapping():
    assert resolution_to_duration("10T") == "10 minutes"
    assert resolution_to_duration("1H") == "1 hours"
    assert resolution_to_duration("30S") == "30 seconds"
    with pytest.raises(ValueError):
        resolution_to_duration("10X")


def test_tz_naive_rejected():
    with pytest.raises(ValueError, match="timezone-aware"):
        TimeSeriesDataset("2024-01-01T00:00:00", END, TAGS)


def test_reversed_range_rejected():
    with pytest.raises(ValueError, match="before"):
        TimeSeriesDataset(END, START, TAGS)


def test_get_data_aligned_and_projected(spark, sf_dir):
    ds = TimeSeriesDataset(
        START, END, TAGS, target_tag_list=["purchase"], resolution="1D"
    )
    X, y = ds.get_data(spark, sf_dir)
    assert X.columns == ["ts"] + TAGS
    assert y.columns == ["ts", "purchase"]
    # inner alignment: no nulls survive
    n = X.count()
    assert n > 0 and X.dropna().count() == n


def test_multi_agg_flattens(spark, sf_dir):
    ds = TimeSeriesDataset(START, END, ["click"], resolution="1D",
                           aggregation_methods=["mean", "max"])
    X, _ = ds.get_data(spark, sf_dir)
    assert X.columns == ["ts", "click__avg", "click__max"]


def test_row_filter_applied(spark, sf_dir):
    base = TimeSeriesDataset(START, END, TAGS, resolution="1D")
    filt = TimeSeriesDataset(START, END, TAGS, resolution="1D",
                             row_filter="`click` > 100")
    n_base = base.get_data(spark, sf_dir)[0].count()
    filtered = filt.get_data(spark, sf_dir)[0]
    assert 0 < filtered.count() < n_base
    assert filtered.where("click <= 100").count() == 0


def test_row_filter_buffer_matches_global_window(spark, sf_dir):
    """_buffered_filter (distributed block-overlap form) must be
    row-identical to the single-partition global window it replaced."""
    from pyspark.sql import functions as F

    from gordo_components_spark.dataset import _buffered_filter

    ds = TimeSeriesDataset(START, "2024-02-20T00:00:00Z", TAGS, resolution="1H")
    wide = ds._wide(spark, sf_dir)
    for pred, b in [("click > 5.0", 2), ("click > 2.0", 5)]:
        new = _buffered_filter(wide, pred, b)
        old = (
            wide.withColumn("__ok", F.when(F.expr(pred), 1).otherwise(0))
            .withColumn(
                "__keep",
                F.expr(
                    f"MIN(__ok) OVER (ORDER BY ts ROWS BETWEEN {b} PRECEDING AND {b} FOLLOWING)"
                ),
            )
            .where("__keep = 1")
            .drop("__ok", "__keep")
        )
        assert new.exceptAll(old).count() == 0 and old.exceptAll(new).count() == 0
        assert 0 < new.count() < wide.count()  # non-vacuous: partial drop


def test_insufficient_data_gate(spark, sf_dir):
    ds = TimeSeriesDataset(START, END, TAGS, resolution="1D",
                           n_samples_threshold=10**9)
    with pytest.raises(InsufficientDataError):
        ds.get_data(spark, sf_dir)


MACHINE_CONFIG = {
    "name": "machine-a",
    "dataset": {
        "tags": TAGS,
        "train_start_date": START,
        "train_end_date": END,
        "resolution": "1D",
    },
    "model": {
        "anomaly.DiffBasedAnomalyDetector": {
            "base_estimator": {
                "pipeline.Pipeline": {
                    "steps": [
                        "preprocessing.MinMaxScaler",
                        {"models.AutoEncoder": {"compression_factor": 0.5}},
                    ]
                }
            }
        }
    },
    "evaluation": {"cv_mode": "full_build", "n_splits": 3},
}


def test_model_builder_end_to_end(spark, sf_dir, tmp_path):
    reg = ModelRegistry(str(tmp_path))
    builder = ModelBuilder(MACHINE_CONFIG, registry=reg)
    model, meta = builder.build(spark, sf_dir)
    assert meta["cv_scores"]["total_threshold"] > 0
    assert meta["dataset"]["n_samples"] > 0
    assert reg.check_cache(MACHINE_CONFIG) == builder.model_key
    # second build: cache hit returns persisted metadata (no rebuild)
    _, meta2 = builder.build(spark, sf_dir)
    assert meta2["model_key"] == meta["model_key"]


def test_workflow_loader_normalizes_and_validates():
    cfg = """
globals:
  dataset: {resolution: "1D"}
machines:
  - name: machine-a
    dataset: {tags: [click, view], train_start_date: "2024-01-01T00:00:00Z",
              train_end_date: "2024-01-20T00:00:00Z"}
  - name: machine-b
    dataset: {tags: [purchase], resolution: "1H",
              train_start_date: "2024-01-01T00:00:00Z",
              train_end_date: "2024-01-20T00:00:00Z"}
"""
    machines = load_config(cfg)
    assert [m.name for m in machines] == ["machine-a", "machine-b"]
    assert machines[0].dataset["resolution"] == "1D"  # global applied
    assert machines[1].dataset["resolution"] == "1H"  # override wins
    assert machines[0].model  # default model injected
    assert machines[0].evaluation["n_splits"] == 3


@pytest.mark.parametrize(
    "name", ["Machine-A", "1machine", "bad_name", "x" * 64, "trailing-"]
)
def test_workflow_loader_rejects_bad_names(name):
    cfg = f"""
machines:
  - name: {name}
    dataset: {{tags: [click], train_start_date: "2024-01-01T00:00:00Z",
               train_end_date: "2024-01-02T00:00:00Z"}}
"""
    with pytest.raises(ConfigError):
        load_config(cfg)


def test_time_bounds_accept_datetimes_and_convert_offsets(spark, sf_dir):
    """Review-hardened bound contract: datetime objects work (YAML
    resolves unquoted timestamps to datetimes), and an offset-bearing
    bound selects the same rows as its UTC equivalent (the offset used
    to be silently discarded, shifting the window)."""
    from datetime import datetime, timedelta, timezone

    from gordo_components_spark.sources.tables import load_events_in_range

    lo_utc = "2024-01-05T00:00:00"
    hi_utc = "2024-01-06T00:00:00"
    base = load_events_in_range(spark, sf_dir, lo_utc, hi_utc).count()
    # same instants as datetimes
    as_dt = load_events_in_range(
        spark,
        sf_dir,
        datetime(2024, 1, 5, tzinfo=timezone.utc),
        datetime(2024, 1, 6, tzinfo=timezone.utc),
    ).count()
    # same instants expressed in +02:00 wall clock
    tz2 = timezone(timedelta(hours=2))
    as_offset = load_events_in_range(
        spark,
        sf_dir,
        datetime(2024, 1, 5, 2, 0, tzinfo=tz2),
        datetime(2024, 1, 6, 2, 0, tzinfo=tz2),
    ).count()
    assert base == as_dt == as_offset and base > 0
