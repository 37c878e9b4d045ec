"""Wire codecs O8 (SURVEY §2.1).

Reference: ``gordo_components/server/utils.py`` —
``dataframe_to_dict`` / ``dataframe_from_dict`` (JSON wire format,
MultiIndex-aware) and ``dataframe_into_parquet_bytes`` /
``dataframe_from_parquet_bytes`` (the parquet HTTP body the client
prefers).  Spark restatement: the JSON face uses per-row dicts (flattened
``group__tag`` columns stand in for the reference's 2-level MultiIndex,
SURVEY §1.2); the binary face uses Arrow-backed parquet bytes, which is
also exactly what crosses the executor boundary in a pandas UDF.

These are driver/edge utilities (one HTTP payload at a time), not bulk
paths — bulk data movement stays ``df.write.parquet``.
"""

from __future__ import annotations

import io
import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession


_JSON_MAX_ROWS = 10_000
_PARQUET_MAX_ROWS = 1_000_000


def _bounded_pandas(
    df: DataFrame, max_rows: int | None, default: int, face: str, truncate: bool = False
):
    """Driver-side collect with a guard rail: these codecs materialize the
    whole frame on the driver, so an unbounded call on a big DataFrame is
    an OOM, not a payload.  ``max_rows=None`` (the default) applies the
    documented per-face bound and RAISES past it — the caller must pass an
    explicit larger bound (or ``truncate=True``) to go bigger.

    BEHAVIOR CHANGE (round 3): ``max_rows`` used to silently truncate to
    N rows; it is now a hard bound that raises.  Callers that want the
    old truncating semantics pass ``truncate=True`` — the guard rail is
    opt-out, not a silent redefinition of the argument."""
    bound = default if max_rows is None else max_rows
    pdf = df.limit(bound + 1).toPandas()
    if len(pdf) > bound:
        if truncate:
            return pdf.iloc[:bound]
        raise ValueError(
            f"{face}: frame exceeds {bound} rows; wire codecs are "
            f"driver-side HTTP payloads, not bulk paths — pass an explicit "
            f"max_rows or truncate=True, pre-limit the frame, or use "
            f"df.write.parquet"
        )
    return pdf


def dataframe_to_dict(df: DataFrame, max_rows: int | None = None, truncate: bool = False) -> dict:
    """DataFrame → JSON-safe dict payload (column-oriented, like the
    reference's ``orient="index"``-era wire dicts but stable-ordered).
    Timestamps serialize at full microsecond precision (pandas to_json's
    ISO mode is only ms-grained) and record themselves in ``dtypes`` so
    the decoder can restore them losslessly.  Bounded at 10k rows by
    default (see ``_bounded_pandas``)."""
    pdf = _bounded_pandas(df, max_rows, _JSON_MAX_ROWS, "dataframe_to_dict", truncate)
    dtypes: dict[str, str] = {}
    out = pdf.copy()
    for col in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[col]):
            dtypes[col] = "timestamp"
            out[col] = out[col].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    return {
        "columns": list(out.columns),
        "dtypes": dtypes,
        "data": json.loads(out.to_json(orient="values")),
    }


def dataframe_from_dict(spark: SparkSession, payload: dict, schema=None) -> DataFrame:
    pdf = pd.DataFrame(payload["data"], columns=payload["columns"])
    for col, kind in payload.get("dtypes", {}).items():
        if kind == "timestamp":
            pdf[col] = pd.to_datetime(pdf[col], format="%Y-%m-%dT%H:%M:%S.%f")
    return spark.createDataFrame(pdf, schema=schema)


def dataframe_into_parquet_bytes(df: DataFrame, max_rows: int | None = None, truncate: bool = False) -> bytes:
    """DataFrame → parquet file bytes (HTTP body / cache blob).  Bounded
    at 1M rows by default (see ``_bounded_pandas``)."""
    pdf = _bounded_pandas(df, max_rows, _PARQUET_MAX_ROWS, "dataframe_into_parquet_bytes", truncate)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def dataframe_from_parquet_bytes(spark: SparkSession, blob: bytes) -> DataFrame:
    pdf = pq.read_table(io.BytesIO(blob)).to_pandas()
    return spark.createDataFrame(pdf)
