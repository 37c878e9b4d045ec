from gordo_components_spark.ml.estimators import (  # noqa: F401
    ARForecaster,
    DiffBasedAnomalyDetector,
    MinMaxScaler,
    MLPAutoEncoder,
    MLPForecaster,
    PCAAutoEncoder,
    Pipeline,
    StandardScaler,
    WindowedAutoEncoder,
    make_autoencoder,
    make_forecaster,
)
