"""Declarative pipeline compiler O38 (SURVEY §2.10).

Reference: ``gordo_components/serializer/__init__.py::from_definition`` /
``into_definition`` — a YAML/dict definition compiles to an estimator
object graph and back.  The grammar is the reference's: a definition node
is either a bare dotted class name (no kwargs), or a single-key dict
``{dotted.ClassName: {kwargs}}``; kwarg values recurse (so pipelines nest
estimators, detectors nest pipelines).

The class table maps the reference's sklearn/Keras names onto this
engine's numpy estimators — the YAML surface is unchanged, so a machine
config written for the reference compiles here verbatim.
"""

from __future__ import annotations

from typing import Any

from gordo_components_spark.ml.recurrent import (
    LSTMAutoEncoder,
    LSTMForecaster,
    make_sequence_autoencoder,
)
from gordo_components_spark.ml.estimators import (
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


class DefinitionError(ValueError):
    """Malformed pipeline definition."""


#: dotted-name → class; both reference-style and short names accepted.
CLASS_TABLE: dict[str, type] = {
    "pipeline.Pipeline": Pipeline,
    "sklearn.pipeline.Pipeline": Pipeline,
    "preprocessing.MinMaxScaler": MinMaxScaler,
    "sklearn.preprocessing.MinMaxScaler": MinMaxScaler,
    "preprocessing.StandardScaler": StandardScaler,
    "sklearn.preprocessing.StandardScaler": StandardScaler,
    # factory: func="linear" → closed-form SVD AE; "tanh"/"relu" → numpy
    # MLP (the reference's feedforward_hourglass dispatches the same way)
    "models.AutoEncoder": make_autoencoder,
    "gordo_components.model.models.KerasAutoEncoder": make_autoencoder,
    # forecast family: func="linear" → closed-form ridge AR; else MLP
    "models.LSTMForecast": make_forecaster,
    "gordo_components.model.models.KerasLSTMForecast": make_forecaster,
    # sequence-reconstruction family: func="lstm" → genuine numpy LSTM
    # encoder–decoder (ml/recurrent.py); default stays the windowed AE
    "models.LSTMAutoEncoder": make_sequence_autoencoder,
    "gordo_components.model.models.KerasLSTMAutoEncoder": make_sequence_autoencoder,
    "anomaly.DiffBasedAnomalyDetector": DiffBasedAnomalyDetector,
    "gordo_components.model.anomaly.diff.DiffBasedAnomalyDetector": DiffBasedAnomalyDetector,
}

_REVERSE = {cls: name for name, cls in CLASS_TABLE.items()}  # first name wins on dups
# factory products serialize back to the factory's definition name
_REVERSE[PCAAutoEncoder] = "models.AutoEncoder"
_REVERSE[MLPAutoEncoder] = "models.AutoEncoder"
_REVERSE[ARForecaster] = "models.LSTMForecast"
_REVERSE[MLPForecaster] = "models.LSTMForecast"
_REVERSE[LSTMForecaster] = "models.LSTMForecast"
_REVERSE[WindowedAutoEncoder] = "models.LSTMAutoEncoder"
_REVERSE[LSTMAutoEncoder] = "models.LSTMAutoEncoder"


def from_definition(definition: Any):
    """Compile a definition node into an estimator object."""
    if isinstance(definition, str):
        return _lookup(definition)()
    if isinstance(definition, dict):
        if len(definition) != 1:
            raise DefinitionError(
                f"definition node must have exactly one key, got {sorted(definition)}"
            )
        (name, kwargs), = definition.items()
        cls = _lookup(name)
        if kwargs is None:
            return cls()
        if not isinstance(kwargs, dict):
            raise DefinitionError(f"kwargs for {name} must be a mapping, got {type(kwargs)}")
        return cls(**{k: _compile_value(v) for k, v in kwargs.items()})
    raise DefinitionError(f"cannot compile definition of type {type(definition)}")


def _compile_value(value: Any):
    if isinstance(value, str) and value in CLASS_TABLE:
        return _lookup(value)()
    if isinstance(value, dict) and len(value) == 1 and next(iter(value)) in CLASS_TABLE:
        return from_definition(value)
    if isinstance(value, list):
        return [_compile_value(v) for v in value]
    return value


def _lookup(name: str) -> type:
    if name not in CLASS_TABLE:
        raise DefinitionError(f"unknown estimator {name!r}; known: {sorted(CLASS_TABLE)}")
    return CLASS_TABLE[name]


def into_definition(obj: Any) -> Any:
    """Serialize an estimator object graph back to definition form
    (roundtrip partner of :func:`from_definition`)."""
    cls = type(obj)
    if cls not in _REVERSE:
        return obj  # plain value
    params = {k: _serialize_value(v) for k, v in obj.get_params().items()}
    params = {k: v for k, v in params.items() if v is not None}
    return {_REVERSE[cls]: params} if params else _REVERSE[cls]


def _serialize_value(value: Any) -> Any:
    if type(value) in _REVERSE:
        return into_definition(value)
    if isinstance(value, tuple):
        # a ("name", estimator) step tuple serializes as the ESTIMATOR's
        # definition — names are presentation, the reference serializer
        # drops them the same way (review r6: the old bare list(value)
        # left LIVE estimator objects inside the "serialized" definition,
        # and keeping the name would deserialize into a 2-element list
        # the Pipeline can't fit)
        if len(value) == 2 and type(value[1]) in _REVERSE:
            return into_definition(value[1])
        return [_serialize_value(v) for v in value]
    if isinstance(value, list):
        return [_serialize_value(v) for v in value]
    return value
