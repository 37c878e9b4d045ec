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

    return features.groupBy("user_id").applyInPandas(fn, TRAIN_META_SCHEMA)


SCORE_SCHEMA = (
    "machine string, bucket timestamp, total_anomaly double, "
    "total_threshold double, is_anomaly boolean"
)


def score_models(features: DataFrame, models: DataFrame) -> DataFrame:
    """O43/O44: batch inference + anomaly frame.  Trained detectors join
    the feature stream as base64 blobs on the machine key (broadcast —
    one small row per machine), then one grouped island unpickles its
    machine's model once and scores the whole partition vectorized."""
    blobs = models.where(F.col("status") == "ok").select(
        F.col("machine"), F.col("model_pkl_b64")
    )
    joined = features.join(
        F.broadcast(blobs), features["user_id"].cast("string") == blobs["machine"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        detector = pickle.loads(base64.b64decode(pdf["model_pkl_b64"].iloc[0]))
        pdf = pdf.sort_values("bucket")
        X = pdf[list(FEATURES)].to_numpy(dtype=np.float64)
        out = detector.anomaly(X)
        return pd.DataFrame(
            {
                "machine": pdf["machine"],
                "bucket": pdf["bucket"],
                "total_anomaly": out["total_anomaly"],
                "total_threshold": out["total_threshold"],
                "is_anomaly": out["is_anomaly"],
            }
        )

    return joined.groupBy("machine").applyInPandas(fn, SCORE_SCHEMA)


def predict_batch(features: DataFrame, models: DataFrame) -> DataFrame:
    """O43 pure inference via ``mapInPandas``: reconstruction columns only
    (the ``model-output`` group of the D6 frame).  Streams Arrow batches;
    each batch unpickles at most the models it references (executor-local
    LRU would cache them in a long-lived service)."""
    blobs = models.where(F.col("status") == "ok").select("machine", "model_pkl_b64")
    joined = features.join(
        F.broadcast(blobs), features["user_id"].cast("string") == blobs["machine"]
    ).select("machine", "bucket", *FEATURES, "model_pkl_b64")

    out_schema = "machine string, bucket timestamp, " + ", ".join(
        f"model_output__{f} double" for f in FEATURES
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, object] = {}
        for pdf in batches:
            outs = []
            for machine, grp in pdf.groupby("machine", sort=False):
                det = cache.get(machine)
                if det is None:
                    det = pickle.loads(base64.b64decode(grp["model_pkl_b64"].iloc[0]))
                    cache[machine] = det
                yhat = det.base_estimator.predict(
                    grp[list(FEATURES)].to_numpy(dtype=np.float64)
                )
                out = pd.DataFrame({"machine": grp["machine"], "bucket": grp["bucket"]})
                for i, f in enumerate(FEATURES):
                    out[f"model_output__{f}"] = yhat[:, i]
                outs.append(out)
            yield pd.concat(outs) if outs else pd.DataFrame()

    return joined.mapInPandas(fn, out_schema)
