"""MLlib pipeline face of the model plane (BASELINE.json approach:
"MLlib for feature engineering + model serving").

Reference mapping (SURVEY §1 D5/O6, §2 O38/O40): the sklearn
``Pipeline(scaler → estimator)`` compiles to a ``pyspark.ml.Pipeline``
— VectorAssembler → MinMaxScaler → PCA — and persists via
``PipelineModel.write().save(dir)`` (the reference's ``serializer.dump``
to the model registry volume).

The PCA stage is the MLlib twin of ``ml/estimators.py::PCAAutoEncoder``:
the anomaly score is the reconstruction residual — for a (scaled,
centered) vector x with projection z onto the top-k components,
``err² = ‖x−μ‖² − ‖z‖²`` (energy outside the subspace), computed as
native column algebra over the PCA output, no UDF.

This path serves two purposes at scale: MLlib transformers are
JVM-native (no Python boundary at inference), and PipelineModel
persistence is the cluster-standard model interchange format.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import MinMaxScaler, PCA, VectorAssembler
from pyspark.sql import DataFrame, functions as F

from gordo_components_spark.ml.islands import FEATURES


def build_mllib_pipeline(k: int = 2) -> Pipeline:
    """VectorAssembler → MinMaxScaler → PCA(k) (O38/O40 on MLlib)."""
    return Pipeline(
        stages=[
            VectorAssembler(inputCols=list(FEATURES), outputCol="features_raw"),
            MinMaxScaler(inputCol="features_raw", outputCol="features"),
            PCA(k=k, inputCol="features", outputCol="pca"),
        ]
    )


def score_residuals(model: PipelineModel, features: DataFrame) -> DataFrame:
    """Reconstruction-residual anomaly scores as column algebra over the
    fitted pipeline's outputs — the ONE definition both the fit path and
    the loaded-model path score with (operator face and library face
    must never drift).

    MLlib's PCA.transform does NOT center (z = xᵀV with V orthonormal),
    so ‖z‖ ≤ ‖x‖ always and residual² = ‖x‖² − ‖z‖² is the energy
    outside the principal subspace."""
    from pyspark.ml.functions import vector_to_array

    scored = (
        model.transform(features)
        .withColumn("x", vector_to_array("features"))
        .withColumn("z", vector_to_array("pca"))
    )
    sq = "aggregate(zip_with({c}, {c}, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    return scored.select(
        "user_id",
        "bucket",
        F.round(
            F.sqrt(
                F.greatest(F.expr(sq.format(c="x")) - F.expr(sq.format(c="z")), F.lit(0.0))
            ),
            9,
        ).alias("recon_error"),
    )


def fit_and_score(features: DataFrame, k: int = 2) -> tuple[PipelineModel, DataFrame]:
    """Fit the MLlib pipeline and emit reconstruction-residual anomaly
    scores (see ``score_residuals``)."""
    model = build_mllib_pipeline(k).fit(features)
    return model, score_residuals(model, features)


def save_load_roundtrip(model: PipelineModel, path: str) -> PipelineModel:
    """O6 model sink on MLlib: ``PipelineModel.save`` + load (the
    registry's at-rest format for JVM-served models)."""
    model.write().overwrite().save(path)
    return PipelineModel.load(path)
