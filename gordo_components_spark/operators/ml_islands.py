"""Model-plane harness entries O38–O45 (rows-only: estimator fits aren't
SQL-expressible; semantics are pytest-verified incl. the FIXTURES B4
golden pipeline).

The flagship lifecycle (SURVEY §3.1 restated): native resample features →
``groupBy(machine).applyInPandas(train)`` → thresholds via time-ordered
CV → broadcast models → vectorized scoring → anomaly frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.ml.islands import (
    machine_features,
    predict_batch,
    score_models,
    train_models,
)
from gordo_components_spark.registry import register


@register("ml_train_autoencoder", oracle=None)
def ml_train_autoencoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O41/O45 per-machine autoencoder train + CV thresholds (grouped-map
    island).  Output: one metadata row per machine (D7) — the model blob
    column is dropped from the harness result for readability."""
    feats = machine_features(spark, sf_dir)
    return train_models(feats).select(
        "machine",
        "n_samples",
        "n_features",
        "status",
        "total_threshold",
        "cv_mae_mean",
        "explained_variance",
    )


@register("ml_anomaly_batch", oracle=None)
def ml_anomaly_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O44 end-to-end anomaly batch: train per machine, broadcast models,
    score the same feature stream, emit the flattened D6 frame."""
    feats = machine_features(spark, sf_dir)
    models = train_models(feats)
    return score_models(feats, models)


@register("ml_predict_batch", oracle=None)
def ml_predict_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O43 pure batch inference through ``mapInPandas`` with per-executor
    model caching (the serving path's batch face)."""
    feats = machine_features(spark, sf_dir)
    models = train_models(feats)
    return predict_batch(feats, models)


@register("ml_model_registry", oracle=None)
def ml_model_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O38/O39/O32: compile the YAML definition, train one machine, dump
    to the content-addressed registry, prove the cache hit — returned as
    a tiny status frame (driver-side logic; registry ops are local)."""
    import tempfile

    from gordo_components_spark.ml.islands import DEFAULT_MODEL_DEFINITION
    from gordo_components_spark.plans.model_registry import ModelRegistry, calculate_model_key
    from gordo_components_spark.plans.pipeline_compiler import from_definition, into_definition

    machine_config = {
        "name": "machine-0",
        "dataset": {"resolution": "60 minutes", "sf_dir": sf_dir},
        "model": DEFAULT_MODEL_DEFINITION,
    }
    key = calculate_model_key(machine_config)
    # into_definition emits the canonical form (defaults materialized), so
    # the invariant is idempotence of the canonical form, not literal
    # equality with the user's sparse YAML.
    canonical = into_definition(from_definition(DEFAULT_MODEL_DEFINITION))
    roundtrip = into_definition(from_definition(canonical))
    with tempfile.TemporaryDirectory() as d:
        reg = ModelRegistry(d)
        assert reg.check_cache(machine_config) is None
        reg.dump(machine_config, from_definition(DEFAULT_MODEL_DEFINITION))
        hit = reg.check_cache(machine_config) == key
    return spark.createDataFrame(
        [(key, hit, roundtrip == canonical)],
        "model_key string, cache_hit boolean, definition_roundtrip boolean",
    )
