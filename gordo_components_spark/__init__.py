"""gordo_components_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``equinor/gordo-components``.

The reference (see SURVEY.md; reference paths cited per-module as
``gordo_components/<path>::<Symbol>``) is a configuration-driven ML
pipeline system for industrial time-series anomaly detection.  This
package re-expresses its whole query surface Spark-first:

- ``sources/``   — table/provider scans (reference ``dataset/data_provider/``)
- ``operators/`` — declarative DataFrame operators + the driver-harness
  query registry (reference ``dataset/datasets.py`` et al.)
- ``functions/`` — column-algebra building blocks (filter DSL compiler,
  anomaly scoring expressions, vector/text helpers)
- ``plans/``     — YAML pipeline compiler + model registry
  (reference ``serializer/``, ``builder/``)
- ``ml/``        — pandas-UDF model islands (train/score per machine;
  reference ``model/``)
- ``streaming/`` — Structured Streaming micro-batch scoring
  (reference ``server/`` + ``client/`` restated)
"""

__version__ = "0.1.0"

from gordo_components_spark.registry import REGISTRY, register  # noqa: F401
