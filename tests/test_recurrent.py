"""Genuine-recurrence ring: the numpy LSTM autoencoder (O42 without the
round-3 substitution) — BPTT gradients proven against finite differences,
temporal-shape sensitivity, determinism, YAML dispatch."""

import numpy as np
import pytest

from gordo_components_spark.ml.recurrent import LSTMAutoEncoder


def _tiny_problem():
    rng = np.random.default_rng(5)
    Xw = rng.normal(0, 1.0, (3, 4, 2))  # (m, lb, d)
    H = 3
    def glorot(a, b):
        return rng.normal(0.0, 0.5, size=(a, b))
    P = {
        "Wxe": glorot(2, 4 * H), "Whe": glorot(H, 4 * H), "be": rng.normal(0, 0.1, 4 * H),
        "Wxd": glorot(H, 4 * H), "Whd": glorot(H, 4 * H), "bd": rng.normal(0, 0.1, 4 * H),
        "Wy": glorot(H, 2), "by": rng.normal(0, 0.1, 2),
    }
    return Xw, P, H


def test_bptt_gradients_match_finite_differences():
    """Central finite differences on EVERY parameter element must agree
    with the analytic BPTT gradient — the proof the hand-rolled backward
    pass is the true gradient, not merely a direction that happens to
    converge."""
    Xw, P, H = _tiny_problem()
    _, G = LSTMAutoEncoder._loss_and_grads(Xw, P, H)
    # eps=1e-5, not 1e-6: the deep-BPTT encoder gradients are ~1e-7 and
    # the smaller step's roundoff noise exceeds a 1e-4 relative gate
    # (verified: error scales exactly as 1/eps — pure FD noise)
    eps = 1e-5
    for k in P:
        num = np.zeros_like(P[k])
        it = np.nditer(P[k], flags=["multi_index"])
        while not it.finished:
            idx = it.multi_index
            orig = P[k][idx]
            P[k][idx] = orig + eps
            lp, _ = LSTMAutoEncoder._loss_and_grads(Xw, P, H)
            P[k][idx] = orig - eps
            lm, _ = LSTMAutoEncoder._loss_and_grads(Xw, P, H)
            P[k][idx] = orig
            num[idx] = (lp - lm) / (2 * eps)
            it.iternext()
        denom = np.maximum(np.abs(num) + np.abs(G[k]), 1e-8)
        rel = np.abs(num - G[k]) / denom
        # 1e-4: central-difference noise floor at eps=1e-6 for the tiny
        # deep-BPTT encoder gradients; a wrong backward pass misses by
        # orders of magnitude, not by 1e-5
        assert rel.max() < 1e-4, f"gradient mismatch in {k}: {rel.max()}"


def test_lstm_ae_detects_broken_temporal_shape():
    """Same contract as the windowed-MLP AE: flag windows whose values
    are unchanged but whose temporal ORDER is broken."""
    rng = np.random.default_rng(2)
    t = np.arange(600)
    X = np.stack([(t % 8) / 8.0, np.cos(2 * np.pi * t / 8)], axis=1) + rng.normal(
        0, 0.01, (600, 2)
    )
    ae = LSTMAutoEncoder(lookback_window=8, hidden_units=8, epochs=300).fit(X)
    assert ae.score(X) > 0.95
    clean_p99 = np.quantile(ae.window_errors(X), 0.99)
    Xb = X.copy()
    Xb[300:308] = Xb[300:308][::-1]
    broken = ae.window_errors(Xb)[293:308].max()
    assert broken > 5 * clean_p99


def test_lstm_ae_deterministic():
    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (60, 3))
    a = LSTMAutoEncoder(lookback_window=4, hidden_units=4, epochs=20).fit(X)
    b = LSTMAutoEncoder(lookback_window=4, hidden_units=4, epochs=20).fit(X)
    for k in a.params_:
        assert np.array_equal(a.params_[k], b.params_[k])
    assert np.array_equal(a.predict(X), b.predict(X))


def test_lstm_yaml_dispatch_and_roundtrip():
    from gordo_components_spark.ml.estimators import WindowedAutoEncoder
    from gordo_components_spark.plans.pipeline_compiler import (
        from_definition,
        into_definition,
    )

    # default stays the windowed-MLP backend (round-3 behavior preserved)
    m = from_definition({"models.LSTMAutoEncoder": {"lookback_window": 8}})
    assert type(m) is WindowedAutoEncoder
    # func="lstm" selects genuine recurrence
    r = from_definition(
        {"models.LSTMAutoEncoder": {"func": "lstm", "lookback_window": 8, "epochs": 20}}
    )
    assert type(r) is LSTMAutoEncoder
    canon = into_definition(r)
    assert into_definition(from_definition(canon)) == canon


def test_lstm_ae_rejects_short_series():
    with pytest.raises(ValueError):
        LSTMAutoEncoder(lookback_window=10).fit(np.zeros((4, 2)))


def test_lstm_forecaster_gradients_match_finite_differences():
    from gordo_components_spark.ml.recurrent import LSTMForecaster

    rng = np.random.default_rng(9)
    Xw = rng.normal(0, 1.0, (3, 4, 2))
    Y = rng.normal(0, 1.0, (3, 2))
    H = 3
    def glorot(a, b):
        return rng.normal(0.0, 0.5, size=(a, b))
    P = {
        "Wxe": glorot(2, 4 * H), "Whe": glorot(H, 4 * H), "be": rng.normal(0, 0.1, 4 * H),
        "Wy": glorot(H, 2), "by": rng.normal(0, 0.1, 2),
    }
    _, G = LSTMForecaster._fc_loss_and_grads(Xw, Y, P, H)
    eps = 1e-5
    for k in P:
        num = np.zeros_like(P[k])
        it = np.nditer(P[k], flags=["multi_index"])
        while not it.finished:
            idx = it.multi_index
            orig = P[k][idx]
            P[k][idx] = orig + eps
            lp, _ = LSTMForecaster._fc_loss_and_grads(Xw, Y, P, H)
            P[k][idx] = orig - eps
            lm, _ = LSTMForecaster._fc_loss_and_grads(Xw, Y, P, H)
            P[k][idx] = orig
            num[idx] = (lp - lm) / (2 * eps)
            it.iternext()
        denom = np.maximum(np.abs(num) + np.abs(G[k]), 1e-8)
        assert (np.abs(num - G[k]) / denom).max() < 1e-4, k


def test_lstm_forecaster_learns_periodic_series():
    from gordo_components_spark.ml.recurrent import LSTMForecaster

    rng = np.random.default_rng(3)
    t = np.arange(400)
    X = np.stack([np.sin(2 * np.pi * t / 8), np.cos(2 * np.pi * t / 8)], axis=1)
    X = X + rng.normal(0, 0.01, X.shape)
    fc = LSTMForecaster(lookback_window=8, hidden_units=8, epochs=300).fit(X)
    assert fc.score(X) > 0.95
    # determinism
    fc2 = LSTMForecaster(lookback_window=8, hidden_units=8, epochs=300).fit(X)
    assert np.array_equal(fc.predict(X), fc2.predict(X))


def test_lstm_forecaster_yaml_dispatch():
    from gordo_components_spark.ml.recurrent import LSTMForecaster
    from gordo_components_spark.plans.pipeline_compiler import (
        from_definition,
        into_definition,
    )

    m = from_definition({"models.LSTMForecast": {"func": "lstm", "epochs": 20}})
    assert type(m) is LSTMForecaster
    canon = into_definition(m)
    assert into_definition(from_definition(canon)) == canon
