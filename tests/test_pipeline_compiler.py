"""Pipeline compiler + registry tests (reference
``tests/.../serializer/test_serializer_from_definition.py``,
``test_dump_load.py``, builder cache tests; FIXTURES B3)."""

import numpy as np
import pytest

from gordo_components_spark.ml.estimators import (
    DiffBasedAnomalyDetector,
    MinMaxScaler,
    PCAAutoEncoder,
    Pipeline,
)
from gordo_components_spark.plans.model_registry import ModelRegistry, calculate_model_key
from gordo_components_spark.plans.pipeline_compiler import (
    DefinitionError,
    from_definition,
    into_definition,
)

B3_DEFINITION = {
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


def test_from_definition_builds_object_graph():
    det = from_definition(B3_DEFINITION)
    assert isinstance(det, DiffBasedAnomalyDetector)
    assert isinstance(det.base_estimator, Pipeline)
    steps = det.base_estimator._pairs()
    assert isinstance(steps[0][1], MinMaxScaler)
    assert isinstance(steps[1][1], PCAAutoEncoder)
    assert steps[1][1].compression_factor == 0.5


def test_roundtrip_from_into_from():
    defn = into_definition(from_definition(B3_DEFINITION))
    # compiled twice == compiled once (structural roundtrip)
    again = into_definition(from_definition(defn))
    assert defn == again


def test_compiled_pipeline_fits():
    det = from_definition(B3_DEFINITION)
    X = np.random.default_rng(0).normal(size=(100, 4))
    det.fit(X)
    det.cross_validate(X)
    assert det.anomaly(X)["total_anomaly"].shape == (100,)


@pytest.mark.parametrize(
    "bad",
    [
        {"a": 1, "b": 2},  # two keys
        "not.AClass",  # unknown
        {"pipeline.Pipeline": "steps"},  # kwargs not a mapping
    ],
)
def test_malformed_definitions_rejected(bad):
    with pytest.raises(DefinitionError):
        from_definition(bad)


def test_model_key_sensitivity():
    cfg = {"name": "machine-a", "dataset": {"resolution": "10T"}, "model": B3_DEFINITION}
    same = {"model": B3_DEFINITION, "dataset": {"resolution": "10T"}, "name": "machine-a"}
    changed = {**cfg, "dataset": {"resolution": "5T"}}
    assert calculate_model_key(cfg) == calculate_model_key(same)  # key-order invariant
    assert calculate_model_key(cfg) != calculate_model_key(changed)


def test_registry_cache_roundtrip(tmp_path):
    cfg = {"name": "machine-a", "model": B3_DEFINITION}
    reg = ModelRegistry(str(tmp_path))
    assert reg.check_cache(cfg) is None
    model = from_definition(B3_DEFINITION)
    X = np.random.default_rng(1).normal(size=(50, 3))
    model.fit(X)
    key = reg.dump(cfg, model, metadata={"n_samples": 50})
    assert reg.check_cache(cfg) == key
    loaded = reg.load(key)
    np.testing.assert_allclose(
        loaded.base_estimator.predict(X), model.base_estimator.predict(X)
    )
    assert reg.load_metadata(key)["n_samples"] == 50


def test_named_tuple_steps_roundtrip_functional():
    """("name", estimator) step tuples must serialize to JSON-safe
    definitions that deserialize into a FITTABLE pipeline (r6 review:
    the old path left live objects in the definition)."""
    import json

    import numpy as np

    from gordo_components_spark.ml.estimators import (
        MinMaxScaler,
        PCAAutoEncoder,
        Pipeline,
    )
    from gordo_components_spark.plans.pipeline_compiler import (
        from_definition,
        into_definition,
    )

    p = Pipeline([("scale", MinMaxScaler()), ("ae", PCAAutoEncoder())])
    d = into_definition(p)
    json.dumps(d)  # JSON-safe, no live objects
    p2 = from_definition(d)
    X = np.random.default_rng(0).normal(size=(30, 4))
    p2.fit(X)
    assert p2.predict(X).shape == X.shape
