"""Genuine recurrent sequence autoencoder in pure numpy.

Closes SURVEY §2 O42's documented substitution (reference
``model/factories/lstm_autoencoder.py::lstm_hourglass`` /
``lstm_symmetric`` built Keras LSTM encoder–decoders; this container has
no TensorFlow): a real LSTM cell — forget/input/output gates, BPTT
through the window — hand-rolled the same way ``ml/estimators.py``
hand-rolls its Adam MLP.

Architecture (the Keras ``RepeatVector`` seq2seq AE):

    window (lb, d) → encoder LSTM → final hidden state z (h,)
    z repeated lb times → decoder LSTM → per-step linear readout (d,)

Anomaly = window reconstruction error, like ``WindowedAutoEncoder`` —
but the encoder consumes the window STEP BY STEP through gated state,
so the model is recurrent in the exact sense the reference's was.

Determinism: fixed-seed Glorot init, full-batch Adam, no dropout — the
same contract every estimator here honors (content-addressed model
registry, cross-run stability).
"""

from __future__ import annotations

import numpy as np

from gordo_components_spark.ml.estimators import _Base


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


class LSTMAutoEncoder(_Base):
    """Seq2seq LSTM autoencoder over lookback windows (sklearn protocol,
    same surface as ``WindowedAutoEncoder``: predict/window_errors/score
    operate on the windowed matrix)."""

    _params = (
        "lookback_window",
        "hidden_units",
        "func",
        "epochs",
        "learning_rate",
        "seed",
    )

    def __init__(
        self,
        lookback_window: int = 4,
        hidden_units: int = 8,
        func: str = "lstm",
        epochs: int = 300,
        learning_rate: float = 0.02,
        seed: int = 0,
    ):
        self.lookback_window = lookback_window
        self.hidden_units = hidden_units
        self.func = func
        self.epochs = epochs
        self.learning_rate = learning_rate
        self.seed = seed

    # -- windowing (identical to WindowedAutoEncoder, but 3-D) -------------
    def _windows(self, X: np.ndarray) -> np.ndarray:
        n, d = X.shape
        lb = self.lookback_window
        m = n - lb + 1
        if m < 1:
            raise ValueError(f"need ≥ {lb} rows, got {n}")
        idx = np.arange(lb)[None, :] + np.arange(m)[:, None]
        return X[idx]  # (m, lb, d)

    # -- one LSTM cell step (batched) --------------------------------------
    @staticmethod
    def _cell_forward(x, h, c, Wx, Wh, b, H):
        z = x @ Wx + h @ Wh + b
        i = _sigmoid(z[:, :H])
        f = _sigmoid(z[:, H : 2 * H])
        g = np.tanh(z[:, 2 * H : 3 * H])
        o = _sigmoid(z[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        return h_new, c_new, (x, h, c, i, f, g, o, c_new)

    @staticmethod
    def _cell_backward(dh, dc, cache, Wx, Wh):
        x, h_prev, c_prev, i, f, g, o, c_new = cache
        tc = np.tanh(c_new)
        do = dh * tc
        dc = dc + dh * o * (1.0 - tc * tc)
        di, dg, df = dc * g, dc * i, dc * c_prev
        dz = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        return (
            x.T @ dz,  # dWx
            h_prev.T @ dz,  # dWh
            dz.sum(axis=0),  # db
            dz @ Wx.T,  # dx
            dz @ Wh.T,  # dh_prev
            dc * f,  # dc_prev
        )

    @classmethod
    def _loss_and_grads(cls, Xw: np.ndarray, P: dict, H: int):
        """Full-batch MSE loss and analytic BPTT gradients for every
        parameter (numerically verified against central finite
        differences in tests/test_recurrent.py)."""
        m, lb, d = Xw.shape
        # ---- forward ----
        h = np.zeros((m, H)); c = np.zeros((m, H))
        enc_caches = []
        for t in range(lb):
            h, c, cache = cls._cell_forward(
                Xw[:, t, :], h, c, P["Wxe"], P["Whe"], P["be"], H
            )
            enc_caches.append(cache)
        z_enc = h  # (m, H)
        h2 = np.zeros((m, H)); c2 = np.zeros((m, H))
        dec_caches = []; outs = []
        for t in range(lb):
            h2, c2, cache = cls._cell_forward(
                z_enc, h2, c2, P["Wxd"], P["Whd"], P["bd"], H
            )
            dec_caches.append(cache)
            outs.append(h2 @ P["Wy"] + P["by"])
        loss = sum(
            float(((outs[t] - Xw[:, t, :]) ** 2).sum()) for t in range(lb)
        ) / (m * lb * d)
        # ---- backward ----
        G = {k: np.zeros_like(v) for k, v in P.items()}
        scale_g = 2.0 / (m * lb * d)
        dh2 = np.zeros((m, H)); dc2 = np.zeros((m, H))
        dz_enc = np.zeros((m, H))
        for t in range(lb - 1, -1, -1):
            dy = (outs[t] - Xw[:, t, :]) * scale_g
            # readout grads use the decoder hidden state at step t,
            # recovered from the cache's o/c_new (h = o·tanh(c))
            o_t, c_t = dec_caches[t][6], dec_caches[t][7]
            h_t = o_t * np.tanh(c_t)
            G["Wy"] += h_t.T @ dy
            G["by"] += dy.sum(axis=0)
            dh2 = dh2 + dy @ P["Wy"].T
            dWx, dWh, db, dx, dh_prev, dc_prev = cls._cell_backward(
                dh2, dc2, dec_caches[t], P["Wxd"], P["Whd"]
            )
            G["Wxd"] += dWx; G["Whd"] += dWh; G["bd"] += db
            dz_enc += dx
            dh2, dc2 = dh_prev, dc_prev
        dh = dz_enc; dc = np.zeros((m, H))
        for t in range(lb - 1, -1, -1):
            dWx, dWh, db, _, dh_prev, dc_prev = cls._cell_backward(
                dh, dc, enc_caches[t], P["Wxe"], P["Whe"]
            )
            G["Wxe"] += dWx; G["Whe"] += dWh; G["be"] += db
            dh, dc = dh_prev, dc_prev
        return loss, G

    def fit(self, X: np.ndarray, y=None):
        X = np.asarray(X, dtype=np.float64)
        n, d = X.shape
        self.n_features_ = d
        self.mean_ = X.mean(axis=0)
        scale = X.std(axis=0)
        self.scale_ = np.where(scale > 0, scale, 1.0)
        Xw = self._windows((X - self.mean_) / self.scale_)  # (m, lb, d)
        m, lb, _ = Xw.shape
        H = int(self.hidden_units)
        self.k_ = H
        rng = np.random.default_rng(self.seed)

        def glorot(a, b):
            return rng.normal(0.0, np.sqrt(2.0 / (a + b)), size=(a, b))

        # encoder, decoder (input = repeated encoding), linear readout
        P = {
            "Wxe": glorot(d, 4 * H), "Whe": glorot(H, 4 * H), "be": np.zeros(4 * H),
            "Wxd": glorot(H, 4 * H), "Whd": glorot(H, 4 * H), "bd": np.zeros(4 * H),
            "Wy": glorot(H, d), "by": np.zeros(d),
        }
        P["be"][H : 2 * H] = 1.0  # forget-gate bias 1 (standard LSTM init)
        P["bd"][H : 2 * H] = 1.0
        mom = {k: np.zeros_like(v) for k, v in P.items()}
        vel = {k: np.zeros_like(v) for k, v in P.items()}
        b1, b2, eps = 0.9, 0.999, 1e-8
        lr = float(self.learning_rate)

        for t_step in range(1, int(self.epochs) + 1):
            _, G = self._loss_and_grads(Xw, P, H)
            # ---- Adam ----
            c1, c2m = 1 - b1**t_step, 1 - b2**t_step
            for k in P:
                mom[k] = b1 * mom[k] + (1 - b1) * G[k]
                vel[k] = b2 * vel[k] + (1 - b2) * G[k] * G[k]
                P[k] -= lr * (mom[k] / c1) / (np.sqrt(vel[k] / c2m) + eps)
        self.params_ = P
        return self

    def _reconstruct(self, Xw: np.ndarray) -> np.ndarray:
        """Scaled-space reconstruction of (m, lb, d) windows."""
        m, lb, d = Xw.shape
        H = int(self.hidden_units)
        P = self.params_
        h = np.zeros((m, H)); c = np.zeros((m, H))
        for t in range(lb):
            h, c, _ = self._cell_forward(Xw[:, t, :], h, c, P["Wxe"], P["Whe"], P["be"], H)
        z = h
        h2 = np.zeros((m, H)); c2 = np.zeros((m, H))
        outs = []
        for t in range(lb):
            h2, c2, _ = self._cell_forward(z, h2, c2, P["Wxd"], P["Whd"], P["bd"], H)
            outs.append(h2 @ P["Wy"] + P["by"])
        return np.stack(outs, axis=1)  # (m, lb, d)

    def predict(self, X: np.ndarray) -> np.ndarray:
        """Reconstructed windows flattened to (m, lb·d) — the
        WindowedAutoEncoder interface, in original units."""
        X = np.asarray(X, dtype=np.float64)
        Xw = self._windows((X - self.mean_) / self.scale_)
        R = self._reconstruct(Xw) * self.scale_ + self.mean_
        m, lb, d = R.shape
        return R.reshape(m, lb * d)

    def truth_prediction(self, X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(flattened raw windows, reconstruction) with ONE forward pass
        — the combined accessor the anomaly detector scores through
        (round-8 advisory; also closes the gap where wrapping this class
        in DiffBasedAnomalyDetector raised for want of a residuals())."""
        X = np.asarray(X, dtype=np.float64)
        # ground truth straight from the raw windows — the old
        # scale-then-unscale roundtrip reintroduced ~1-ulp noise into
        # y_true for no reason (review r6)
        W = self._windows(X).reshape(-1, self.lookback_window * X.shape[1])
        return W, self.predict(X)

    def window_errors(self, X: np.ndarray) -> np.ndarray:
        W, P = self.truth_prediction(X)
        return np.linalg.norm(W - P, axis=1)

    def score(self, X: np.ndarray, y=None) -> float:
        X = np.asarray(X, dtype=np.float64)
        Xw = self._windows(X)
        W = Xw.reshape(len(Xw), -1)
        err = W - self.predict(X)
        denom = W.var(axis=0).sum()
        return float(1.0 - err.var(axis=0).sum() / denom) if denom else 0.0


def make_sequence_autoencoder(func: str = "tanh", **kw):
    """Factory for the sequence-reconstruction family (reference
    ``lstm_autoencoder.py::lstm_hourglass``/``lstm_symmetric``):
    ``func="lstm"`` builds the genuine recurrent encoder–decoder above;
    ``"tanh"``/``"relu"``/``"linear"`` keep the windowed-MLP backend
    (the round-3 substitute, still the cheap default).  Reference-surface
    YAML may carry MLP-only keys (``compression_factor``,
    ``encoding_layers``); the lstm branch drops whatever
    ``LSTMAutoEncoder`` doesn't take, mirroring ``make_forecaster``'s
    ``_MLP_ONLY_KEYS`` handling."""
    if func == "lstm":
        kw = {k: v for k, v in kw.items() if k in LSTMAutoEncoder._params}
        return LSTMAutoEncoder(func=func, **kw)
    from gordo_components_spark.ml.estimators import WindowedAutoEncoder

    return WindowedAutoEncoder(func=func, **kw)


class LSTMForecaster(_Base):
    """Recurrent forecaster (reference
    ``model/models.py::KerasLSTMForecast`` without the round-3 windowed-
    MLP substitution): an LSTM consumes the trailing ``lookback_window``
    rows step by step; the final hidden state feeds a linear readout
    predicting x[t+lookahead].  Window alignment is ARForecaster's, so
    all three backends (ridge AR / windowed MLP / LSTM) are drop-in
    interchangeable.  Same determinism contract: fixed-seed init,
    full-batch Adam, BPTT via the gradient-checked cell above."""

    _params = (
        "lookback_window",
        "lookahead",
        "func",
        "hidden_units",
        "epochs",
        "learning_rate",
        "seed",
    )

    def __init__(
        self,
        lookback_window: int = 4,
        lookahead: int = 1,
        func: str = "lstm",
        hidden_units: int = 8,
        epochs: int = 300,
        learning_rate: float = 0.02,
        seed: int = 0,
    ):
        self.lookback_window = lookback_window
        self.lookahead = lookahead
        self.func = func
        self.hidden_units = hidden_units
        self.epochs = epochs
        self.learning_rate = learning_rate
        self.seed = seed

    def _windows(self, X: np.ndarray):
        n, d = X.shape
        lb, la = self.lookback_window, self.lookahead
        m = n - lb - la + 1
        if m < 1:
            raise ValueError(f"need ≥ {lb + la} rows, got {n}")
        idx = np.arange(lb)[None, :] + np.arange(m)[:, None]
        return X[idx], X[np.arange(m) + lb + la - 1]  # (m, lb, d), (m, d)

    @classmethod
    def _fc_loss_and_grads(cls, Xw: np.ndarray, Y: np.ndarray, P: dict, H: int):
        m, lb, d = Xw.shape
        h = np.zeros((m, H)); c = np.zeros((m, H))
        caches = []
        for t in range(lb):
            h, c, cache = LSTMAutoEncoder._cell_forward(
                Xw[:, t, :], h, c, P["Wxe"], P["Whe"], P["be"], H
            )
            caches.append(cache)
        y_hat = h @ P["Wy"] + P["by"]
        loss = float(((y_hat - Y) ** 2).sum()) / (m * d)
        G = {k: np.zeros_like(v) for k, v in P.items()}
        dy = (y_hat - Y) * (2.0 / (m * d))
        G["Wy"] = h.T @ dy
        G["by"] = dy.sum(axis=0)
        dh = dy @ P["Wy"].T; dc = np.zeros((m, H))
        for t in range(lb - 1, -1, -1):
            dWx, dWh, db, _, dh_prev, dc_prev = LSTMAutoEncoder._cell_backward(
                dh, dc, caches[t], P["Wxe"], P["Whe"]
            )
            G["Wxe"] += dWx; G["Whe"] += dWh; G["be"] += db
            dh, dc = dh_prev, dc_prev
        return loss, G

    def fit(self, X: np.ndarray, y=None):
        X = np.asarray(X, dtype=np.float64)
        n, d = X.shape
        self.n_features_ = d
        self.mean_ = X.mean(axis=0)
        scale = X.std(axis=0)
        self.scale_ = np.where(scale > 0, scale, 1.0)
        Xs = (X - self.mean_) / self.scale_
        Xw, Y = self._windows(Xs)
        m = len(Xw)
        H = int(self.hidden_units)
        rng = np.random.default_rng(self.seed)

        def glorot(a, b):
            return rng.normal(0.0, np.sqrt(2.0 / (a + b)), size=(a, b))

        P = {
            "Wxe": glorot(d, 4 * H), "Whe": glorot(H, 4 * H), "be": np.zeros(4 * H),
            "Wy": glorot(H, d), "by": np.zeros(d),
        }
        P["be"][H : 2 * H] = 1.0
        mom = {k: np.zeros_like(v) for k, v in P.items()}
        vel = {k: np.zeros_like(v) for k, v in P.items()}
        b1, b2, eps = 0.9, 0.999, 1e-8
        lr = float(self.learning_rate)
        for t_step in range(1, int(self.epochs) + 1):
            _, G = self._fc_loss_and_grads(Xw, Y, P, H)
            c1, c2m = 1 - b1**t_step, 1 - b2**t_step
            for k in P:
                mom[k] = b1 * mom[k] + (1 - b1) * G[k]
                vel[k] = b2 * vel[k] + (1 - b2) * G[k] * G[k]
                P[k] -= lr * (mom[k] / c1) / (np.sqrt(vel[k] / c2m) + eps)
        self.params_ = P
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        Xw, _ = self._windows((X - self.mean_) / self.scale_)
        m, lb, d = Xw.shape
        H = int(self.hidden_units)
        P = self.params_
        h = np.zeros((m, H)); c = np.zeros((m, H))
        for t in range(lb):
            h, c, _ = LSTMAutoEncoder._cell_forward(
                Xw[:, t, :], h, c, P["Wxe"], P["Whe"], P["be"], H
            )
        return (h @ P["Wy"] + P["by"]) * self.scale_ + self.mean_

    def residuals(self, X: np.ndarray) -> np.ndarray:
        """Per-window forecast errors (targets − predictions) — the
        accessor island callers use on :class:`ARForecaster`; added for
        the documented drop-in interchangeability of the three forecast
        backends (review r6: the lstm face would AttributeError where
        the linear/MLP faces worked)."""
        Y, P = self.truth_prediction(X)
        return Y - P

    def truth_prediction(self, X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(targets, forecasts) with ONE forward pass — the combined
        accessor the anomaly detector scores through (round-8
        advisory; same contract as ARForecaster)."""
        X = np.asarray(X, dtype=np.float64)
        _, Y = self._windows(X)
        return Y, self.predict(X)

    def score(self, X: np.ndarray, y=None) -> float:
        X = np.asarray(X, dtype=np.float64)
        _, Y = self._windows(X)
        err = self.residuals(X)
        denom = Y.var(axis=0).sum()
        return float(1.0 - err.var(axis=0).sum() / denom) if denom else 0.0
