"""Query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 with a Harness ID registers here as a
(name, spark_fn, oracle_sql) triple.  ``spark_fn(spark, sf_dir)`` returns a
DataFrame; ``oracle_sql`` is the equivalent ANSI SQL DuckDB runs over the
same parquet (views pre-registered by the driver).  ``oracle_sql=None``
marks rows-only checks (non-SQL-expressible ops).

Oracle-parity rules (learned from the driver contract, SURVEY §5 ring 2):
- alias every computed column identically on both sides;
- exact aggregates over approx (``percentile``, exact COUNT(DISTINCT));
- money-like SUMs go through DECIMAL so both engines do exact integer
  arithmetic, then CAST back to DOUBLE (bit-identical);
- float outputs that pass through multi-row summation get ROUND(x, 6)
  on both sides (per-row IEEE arithmetic is bit-identical across
  engines; only accumulation order is not);
- ``events.ts`` is nanosecond parquet: Spark truncates to micros, so the
  oracle always uses ``CAST(ts AS TIMESTAMP)`` (same truncation);
- LIMIT queries carry a unique total-order tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a harness query (SURVEY §2 Harness ID)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate harness query {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its @register calls run."""
    import gordo_components_spark.operators  # noqa: F401  (imports submodules)

    return REGISTRY
