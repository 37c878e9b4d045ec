"""Pandas-UDF model islands O41–O45 (SURVEY §2.10, §3.1).

Reference restatement of the builder (``builder/build_model.py``): the
reference schedules *one Argo pod per machine*; on Spark the exact same
independence is ``groupBy(machine).applyInPandas(train_one)`` — one
estimator fit per group, executor-side, Arrow-batched.  Everything before
the island (scan → resample → align → filter) is native DataFrame ops;
everything after (thresholds, scoring, sinks) is column algebra again.

Scale posture: training state per task is one machine's feature matrix
(bounded by the time range, not the corpus); model blobs travel as
base64 pickle columns (a few KB for the linear AE) and broadcast back
for scoring — no driver-side loops over machines.
"""

from __future__ import annotations

import base64
import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.functions.timeseries import resample
from gordo_components_spark.plans.pipeline_compiler import from_definition
from gordo_components_spark.session import prepare
from gordo_components_spark.sources.tables import load_table

#: default machine-config model definition (FIXTURES B3 shape)
DEFAULT_MODEL_DEFINITION = {
    "anomaly.DiffBasedAnomalyDetector": {
        "base_estimator": {
            "pipeline.Pipeline": {
                "steps": [
                    "preprocessing.MinMaxScaler",
                    {"models.AutoEncoder": {"kind": "feedforward_hourglass",
                                            "compression_factor": 0.5,
                                            "encoding_layers": 2}},
                ]
            }
        }
    }
}

FEATURES = ("value__avg", "value__max", "value__min", "value__count")

TRAIN_META_SCHEMA = (
    "machine string, n_samples bigint, n_features int, status string, "
    "total_threshold double, cv_mae_mean double, explained_variance double, "
    "model_pkl_b64 string"
)


def machine_features(spark: SparkSession, sf_dir: str, duration: str = "60 minutes") -> DataFrame:
    """Per-machine feature matrix: O18 multi-agg resample of the machine's
    stream (one row per active hour, 4 feature columns)."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    feats = (
        ev.groupBy("user_id", F.window("ts", duration).alias("w"))
        .agg(
            F.round(F.avg("value"), 9).alias("value__avg"),
            F.max("value").alias("value__max"),
            F.min("value").alias("value__min"),
            F.count("value").cast("double").alias("value__count"),
        )
        .select("user_id", F.col("w.start").alias("bucket"), *FEATURES)
    )
    return feats


def _spread(df: DataFrame, cols: tuple[str, ...] = ("user_id",)) -> DataFrame:
    """Explicitly hash-partition by machine before a pandas island.

    AQE's coalescing targets ~64MB partitions — right for JVM operators,
    wrong for Python-bound stages: a 5MB feature frame coalesces to ONE
    partition and 1500 model fits run single-threaded.  An explicit
    ``repartition(n, keys)`` is exempt from AQE coalescing AND satisfies
    the grouped-map's required clustering, so no extra exchange appears.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def _train_one(pdf: pd.DataFrame, definition: dict) -> pd.DataFrame:
    machine = str(pdf["user_id"].iloc[0])
    pdf = pdf.sort_values("bucket")
    X = pdf[list(FEATURES)].to_numpy(dtype=np.float64)
    row = {
        "machine": machine,
        "n_samples": len(X),
        "n_features": X.shape[1],
        "status": "ok",
        "total_threshold": None,
        "cv_mae_mean": None,
        "explained_variance": None,
        "model_pkl_b64": None,
    }
    # O13 quality gate: reference raises InsufficientDataError below the
    # sample threshold; the island records it per machine instead of dying.
    if len(X) < 8:
        row["status"] = "insufficient_data"
        return pd.DataFrame([row])
    detector = from_definition(definition)
    detector.fit(X)
    detector.cross_validate(X)
    row["total_threshold"] = detector.total_threshold_
    row["cv_mae_mean"] = float(np.mean(detector.fold_mae_))
    row["explained_variance"] = detector.base_estimator.final_estimator.score(
        detector.base_estimator.transform_input(X)
    )
    row["model_pkl_b64"] = base64.b64encode(pickle.dumps(detector)).decode("ascii")
    return pd.DataFrame([row])


def train_models(features: DataFrame, definition: dict | None = None) -> DataFrame:
    """O41/O45: one independent train+CV per machine (grouped-map island)."""
    definition = definition or DEFAULT_MODEL_DEFINITION

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _train_one(pdf, definition)

    return _spread(features).groupBy("user_id").applyInPandas(fn, TRAIN_META_SCHEMA)


#: O39 model-cache restated (reference ``builder/build_model.py::check_cache``):
#: same (data window, config) ⇒ reuse the trained models instead of
#: rebuilding.  Keyed process-locally; the durable form is
#: ``plans/model_registry.py``.  Cached as collected rows (a few KB per
#: machine — blobs are linear-AE weights), session-independent.
_TRAIN_CACHE: dict[tuple, list] = {}


def _trained_rows(
    spark: SparkSession, sf_dir: str, duration: str = "60 minutes", definition: dict | None = None
) -> list:
    import json

    from gordo_components_spark.caches import _parquet_rows, source_stat

    # the footer row count + stat fingerprint key the cache to the
    # fixture CONTENTS, not just its path — a regenerated same-basename
    # fixture retrains instead of serving stale models, even when the
    # regeneration preserves the row count (same discipline as
    # caches.materialized_cache, reviews r7/r8)
    key = (
        sf_dir,
        _parquet_rows(sf_dir, "events"),
        json.dumps(source_stat(sf_dir, "events")),
        duration,
        json.dumps(definition, sort_keys=True, default=str),
    )
    if key not in _TRAIN_CACHE:
        feats = machine_features(spark, sf_dir, duration)
        _TRAIN_CACHE[key] = train_models(feats, definition).collect()
    return _TRAIN_CACHE[key]


def island_rows_cached(
    spark: SparkSession, sf_dir: str, tag: str, params: str, build
) -> list:
    """O39 model-cache discipline for the OTHER per-machine training
    islands (r14 verdict item 5: ``ml_lifecycle`` re-ran the recurrent
    and AR fits its standalone faces had already paid — two fits per
    process for identical model cards).  Same fingerprint contract as
    ``_trained_rows``: keyed on (sf_dir, parquet-footer row count,
    source stat, island tag, hyperparams), process-local only — every
    new process (each bench/oracle invocation) retrains from the parquet
    inputs at least once; a regenerated fixture under the same basename
    retrains.  ``build()`` returns the island DataFrame; collected rows
    (the per-machine model cards) are what a registry stores."""
    import json

    from gordo_components_spark.caches import _parquet_rows, source_stat

    key = (
        tag,
        sf_dir,
        _parquet_rows(sf_dir, "events"),
        json.dumps(source_stat(sf_dir, "events")),
        params,
    )
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = build().collect()
    return _TRAIN_CACHE[key]


def trained_models(
    spark: SparkSession, sf_dir: str, duration: str = "60 minutes", definition: dict | None = None
) -> DataFrame:
    return spark.createDataFrame(
        _trained_rows(spark, sf_dir, duration, definition), TRAIN_META_SCHEMA
    )


def trained_blob_map(
    spark: SparkSession, sf_dir: str, duration: str = "60 minutes", definition: dict | None = None
) -> dict:
    """machine → model blob straight from the train cache — the scoring
    islands only ever need this dict, and routing it through
    ``trained_models`` re-ships the cached rows to the executors just to
    ``collect()`` them back (two extra Spark jobs per scoring query)."""
    return {
        r["machine"]: r["model_pkl_b64"]
        for r in _trained_rows(spark, sf_dir, duration, definition)
        if r["status"] == "ok"
    }


SCORE_SCHEMA = (
    "machine string, bucket timestamp, total_anomaly double, "
    "total_threshold double, is_anomaly boolean"
)


def _blob_broadcast(features: DataFrame, models):
    """Ship the machine→model map as a Spark broadcast variable: one copy
    per executor.  Joining blobs onto the feature stream instead would
    duplicate each model onto every row — hundreds of MB through the
    shuffle and Arrow boundary for what is a few MB of weights.  Accepts
    either a models DataFrame or the prebuilt dict from
    ``trained_blob_map`` (the cache-hot path with no driver roundtrip)."""
    if isinstance(models, dict):
        blob_map = models
    else:
        blob_map = {
            r["machine"]: r["model_pkl_b64"]
            for r in models.where(F.col("status") == "ok")
            .select("machine", "model_pkl_b64")
            .collect()
        }
    return features.sparkSession.sparkContext.broadcast(blob_map)


_EMPTY_SCORE = pd.DataFrame(
    {
        "machine": pd.Series(dtype="object"),
        "bucket": pd.Series(dtype="datetime64[us]"),
        "total_anomaly": pd.Series(dtype="float64"),
        "total_threshold": pd.Series(dtype="float64"),
        "is_anomaly": pd.Series(dtype="bool"),
    }
)


def score_models(features: DataFrame, models: "DataFrame | dict") -> DataFrame:
    """O43/O44: batch inference + anomaly frame.  One grouped island per
    machine unpickles its model (from the executor-local broadcast) once
    and scores the whole group vectorized."""
    bc = _blob_broadcast(features, models)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        machine = str(key[0])
        blob = bc.value.get(machine)
        if blob is None:  # machine gated out at train time (O13)
            return _EMPTY_SCORE
        detector = pickle.loads(base64.b64decode(blob))
        pdf = pdf.sort_values("bucket")
        X = pdf[list(FEATURES)].to_numpy(dtype=np.float64)
        out = detector.anomaly(X)
        return pd.DataFrame(
            {
                "machine": machine,
                "bucket": pdf["bucket"],
                "total_anomaly": out["total_anomaly"],
                "total_threshold": out["total_threshold"],
                "is_anomaly": out["is_anomaly"],
            }
        )

    return _spread(features).groupBy("user_id").applyInPandas(fn, SCORE_SCHEMA)


def predict_batch(features: DataFrame, models: "DataFrame | dict") -> DataFrame:
    """O43 pure inference via ``mapInPandas``: reconstruction columns only
    (the ``model-output`` group of the D6 frame).  Streams Arrow batches
    of *features only* — models come from the executor-local broadcast
    with a per-task unpickle cache (the long-lived-service pattern the
    reference gets from its hot Flask process, §4 P10)."""
    bc = _blob_broadcast(features, models)
    out_schema = "machine string, bucket timestamp, " + ", ".join(
        f"model_output__{f} double" for f in FEATURES
    )
    in_cols = ["user_id", "bucket", *FEATURES]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One output frame per ARROW BATCH, not per machine: with ~10⁴
        # machines per partition the per-group pandas-DataFrame build was
        # the dominant cost (measured 4× the matmuls) — accumulate numpy
        # slices and concatenate once instead.
        cache: dict[str, object] = {}
        feat_list = list(FEATURES)
        for pdf in batches:
            X_all = pdf[feat_list].to_numpy(dtype=np.float64)
            buckets_all = pdf["bucket"].to_numpy()
            machines, buckets, yhats = [], [], []
            for machine, idx in pdf.groupby("user_id", sort=False).indices.items():
                machine = str(machine)
                det = cache.get(machine)
                if det is None:
                    blob = bc.value.get(machine)
                    if blob is None:
                        continue
                    det = cache[machine] = pickle.loads(base64.b64decode(blob))
                yhats.append(det.base_estimator.predict(X_all[idx]))
                machines.append(np.full(len(idx), machine, dtype=object))
                buckets.append(buckets_all[idx])
            if yhats:
                Y = np.vstack(yhats)
                out = pd.DataFrame(
                    {
                        "machine": np.concatenate(machines),
                        "bucket": np.concatenate(buckets),
                    }
                )
                for i, f in enumerate(FEATURES):
                    out[f"model_output__{f}"] = Y[:, i]
                yield out

    return _spread(features.select(*in_cols)).mapInPandas(fn, out_schema)
