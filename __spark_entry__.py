"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``gordo_components_spark``: the operator modules register
every SURVEY.md §2 Harness ID into ``gordo_components_spark.registry``;
this file exposes them in the driver's required shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from gordo_components_spark.registry import load_all  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["flagship_anomaly"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    (oracle=None in the registry) get the driver's rows-only check."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
