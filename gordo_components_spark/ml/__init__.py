from gordo_components_spark.ml.estimators import (  # noqa: F401
    DiffBasedAnomalyDetector,
    MinMaxScaler,
    PCAAutoEncoder,
    Pipeline,
    StandardScaler,
)
