from gordo_components_spark.ml.estimators import (  # noqa: F401
    DiffBasedAnomalyDetector,
    MinMaxScaler,
    MLPAutoEncoder,
    PCAAutoEncoder,
    Pipeline,
    StandardScaler,
    make_autoencoder,
)
