"""Estimator unit tests (reference ``tests/.../model/test_model.py``,
``test_anomaly_detectors.py`` semantics, numpy backend)."""

import numpy as np
import pytest

from gordo_components_spark.ml.estimators import (
    DiffBasedAnomalyDetector,
    MinMaxScaler,
    PCAAutoEncoder,
    Pipeline,
    StandardScaler,
    time_series_folds,
)

rng = np.random.default_rng(42)


def _toy(n=200, d=4):
    # rank-2 signal + small noise: a k=2 linear AE should reconstruct well
    latent = rng.normal(size=(n, 2))
    mix = rng.normal(size=(2, d))
    return latent @ mix + 0.01 * rng.normal(size=(n, d))


def test_minmax_scaler_roundtrip():
    X = _toy()
    s = MinMaxScaler()
    Z = s.fit_transform(X)
    assert Z.min() >= -1e-12 and Z.max() <= 1 + 1e-12
    np.testing.assert_allclose(s.inverse_transform(Z), X, atol=1e-10)


def test_standard_scaler():
    X = _toy()
    Z = StandardScaler().fit_transform(X)
    np.testing.assert_allclose(Z.mean(axis=0), 0, atol=1e-10)
    np.testing.assert_allclose(Z.std(axis=0), 1, atol=1e-10)


def test_pca_autoencoder_shapes_and_quality():
    X = _toy()
    ae = PCAAutoEncoder(compression_factor=0.5)  # k=2 of d=4
    ae.fit(X)
    assert ae.k_ == 2
    yhat = ae.predict(X)
    assert yhat.shape == X.shape
    assert ae.score(X) > 0.99  # rank-2 data → near-perfect reconstruction


def test_autoencoder_rejects_mismatched_y():
    X = _toy()
    with pytest.raises(ValueError):
        PCAAutoEncoder().fit(X, y=X[:, :2])


def test_time_series_folds_expanding():
    folds = list(time_series_folds(100, 3))
    assert len(folds) == 3
    for train, test in folds:
        assert train.max() < test.min()  # no leakage
        assert len(test) == 25
    assert len(folds[0][0]) < len(folds[1][0]) < len(folds[2][0])


def test_diff_detector_thresholds_and_anomaly():
    X = _toy(400)
    det = DiffBasedAnomalyDetector(
        base_estimator=Pipeline(steps=[MinMaxScaler(), PCAAutoEncoder(compression_factor=0.5)])
    )
    det.fit(X)
    det.cross_validate(X)
    assert det.total_threshold_ > 0
    assert det.tag_thresholds_.shape == (4,)
    out = det.anomaly(X)
    assert (out["total_anomaly"] >= 0).all()
    # clean validation data: the vast majority under threshold
    assert out["is_anomaly"].mean() < 0.05
    # an injected 10σ spike must flag
    spike = X.copy()
    spike[0] += 10 * X.std(axis=0)
    assert det.anomaly(spike)["is_anomaly"][0]


def test_detector_deterministic():
    X = _toy()
    def build():
        d = DiffBasedAnomalyDetector(
            base_estimator=Pipeline(steps=[MinMaxScaler(), PCAAutoEncoder()])
        )
        d.fit(X)
        d.cross_validate(X)
        return d
    assert build().total_threshold_ == build().total_threshold_


def test_mlp_autoencoder_nonlinear_beats_linear_optimum():
    """The numpy MLP hourglass must capture structure the OPTIMAL linear
    AE (SVD) cannot — on a circular manifold at the same bottleneck, MLP
    explained variance must exceed PCA's by a real margin.  This is the
    proof the func='tanh' backend is genuinely nonlinear, not a
    reskinned linear model."""
    import numpy as np

    from gordo_components_spark.ml.estimators import MLPAutoEncoder, PCAAutoEncoder

    rng = np.random.default_rng(7)
    t = rng.uniform(0, 2 * np.pi, 400)
    X = np.stack(
        [np.cos(t), np.sin(t), np.cos(2 * t), np.sin(2 * t)], axis=1
    ) + rng.normal(0, 0.02, (400, 4))
    mlp = MLPAutoEncoder(compression_factor=0.5, epochs=400).fit(X)
    pca = PCAAutoEncoder(compression_factor=0.5).fit(X)
    assert mlp.k_ == 2
    assert mlp.score(X) > pca.score(X) + 0.1  # measured: 0.754 vs 0.529


def test_mlp_autoencoder_deterministic_and_dispatched():
    import numpy as np

    from gordo_components_spark.ml.estimators import MLPAutoEncoder, PCAAutoEncoder
    from gordo_components_spark.plans.pipeline_compiler import (
        from_definition,
        into_definition,
    )

    X = np.random.default_rng(1).normal(size=(100, 4))
    a = MLPAutoEncoder(epochs=50).fit(X)
    b = MLPAutoEncoder(epochs=50).fit(X)
    assert all(np.array_equal(w1, w2) for w1, w2 in zip(a.W_, b.W_))
    # factory dispatch: func picks the backend; default stays linear so
    # every existing oracle/golden result is byte-identical
    assert type(from_definition({"models.AutoEncoder": {"func": "tanh"}})) is MLPAutoEncoder
    assert type(from_definition({"models.AutoEncoder": None})) is PCAAutoEncoder
    canon = into_definition(from_definition({"models.AutoEncoder": {"func": "relu"}}))
    assert into_definition(from_definition(canon)) == canon


def test_windowed_autoencoder_detects_broken_temporal_shape():
    """The sequence-reconstruction AE (KerasLSTMAutoEncoder analog) must
    flag windows whose VALUES are unchanged but whose temporal ORDER is
    broken — the failure mode a per-row AE cannot see.  Measured: clean
    p99 window error 0.066 vs 2.06 on an order-reversed window."""
    import numpy as np

    from gordo_components_spark.ml.estimators import WindowedAutoEncoder

    rng = np.random.default_rng(2)
    t = np.arange(600)
    X = np.stack([(t % 8) / 8.0, np.cos(2 * np.pi * t / 8)], axis=1) + rng.normal(
        0, 0.01, (600, 2)
    )
    ae = WindowedAutoEncoder(lookback_window=8, func="tanh", epochs=300).fit(X)
    clean_p99 = np.quantile(ae.window_errors(X), 0.99)
    Xb = X.copy()
    Xb[300:308] = Xb[300:308][::-1]  # same values, reversed order
    broken = ae.window_errors(Xb)[293:308].max()
    assert broken > 5 * clean_p99
    assert ae.score(X) > 0.95


def test_windowed_autoencoder_dispatch_and_roundtrip():
    from gordo_components_spark.ml.estimators import WindowedAutoEncoder
    from gordo_components_spark.plans.pipeline_compiler import (
        from_definition,
        into_definition,
    )

    m = from_definition({"models.LSTMAutoEncoder": {"lookback_window": 8, "epochs": 50}})
    assert type(m) is WindowedAutoEncoder
    canon = into_definition(m)
    assert into_definition(from_definition(canon)) == canon


def test_linear_factories_drop_mlp_only_kwargs():
    # ADVICE r2: {"models.AutoEncoder": {"func": "linear", "epochs": 100}}
    # is valid YAML against the reference Keras surface — the linear
    # branch must drop MLP-only keys, not TypeError at compile time
    from gordo_components_spark.ml.estimators import (
        ARForecaster,
        PCAAutoEncoder,
        make_autoencoder,
        make_forecaster,
    )
    from gordo_components_spark.plans.pipeline_compiler import from_definition

    ae = make_autoencoder("linear", epochs=100, learning_rate=0.05, seed=7)
    assert type(ae) is PCAAutoEncoder
    fc = make_forecaster("linear", lookback_window=6, epochs=100, seed=7)
    assert type(fc) is ARForecaster and fc.lookback_window == 6
    m = from_definition({"models.AutoEncoder": {"func": "linear", "epochs": 100}})
    assert type(m) is PCAAutoEncoder
    # genuinely invalid keys must still raise
    import pytest as _pytest

    with _pytest.raises(TypeError):
        make_autoencoder("linear", not_a_param=1)


def test_detector_over_windowed_bases_aligns_truth_to_output_geometry():
    # Reference wraps DiffBasedAnomalyDetector around LSTM models too:
    # forecast / windowed-AE bases emit one row per WINDOW, so the
    # detector must pair truth with prediction via residuals() instead
    # of raising a shape error on a valid YAML config.
    from gordo_components_spark.ml.estimators import ARForecaster, WindowedAutoEncoder

    X = _toy(n=120, d=3)

    det = DiffBasedAnomalyDetector(ARForecaster(lookback_window=4, lookahead=1))
    det.fit(X)
    det.cross_validate(X)
    out = det.anomaly(X)
    m = len(X) - 4 - 1 + 1
    assert out["model_output"].shape == (m, 3)
    assert out["tag_anomaly"].shape == (m, 3)
    assert out["total_anomaly"].shape == (m,)
    assert np.isfinite(out["total_threshold"])
    # truth recovered as pred + residuals must equal the window targets
    A_truth = out["model_output"] + det.base_estimator.residuals(X)
    np.testing.assert_allclose(A_truth, X[4:], atol=1e-9)

    wae = DiffBasedAnomalyDetector(
        WindowedAutoEncoder(lookback_window=5, func="linear")
    )
    wae.fit(X)
    out2 = wae.anomaly(X)
    mw = len(X) - 5 + 1
    assert out2["tag_anomaly"].shape == (mw, 5 * 3)

    # an estimator with mismatched output and no residuals() still fails loudly
    class Bad:
        def predict(self, X):
            return np.zeros((1, 1))

        def fit(self, X, y=None):
            return self

    with pytest.raises(ValueError, match="residuals"):
        DiffBasedAnomalyDetector(Bad()).fit(X).anomaly(X)
