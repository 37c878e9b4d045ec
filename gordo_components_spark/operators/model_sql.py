"""SQL-expressible faces of the model plane (SURVEY §2.10).

The model plane proper (Keras/sklearn fit+predict) lives in ``ml/`` as
pandas-UDF islands; these queries declare the *column-algebra* halves the
reference implements around the estimator — scaling (O40), anomaly
scoring given ŷ (O44), CV fold metrics (O45) and grouped normalization
(O46) — so the driver's oracle can hash-check them.  This split is the
point of the design: everything around the estimator is native Spark
expressions reused verbatim by batch and streaming paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.functions.timeseries import pivot_wide, pivot_wide_sql
from gordo_components_spark.registry import register
from gordo_components_spark.sources.tables import load_table


@register(
    "udf_minmax_scale",
    oracle="""
    WITH stats AS (
      SELECT event_id, event_type, value,
             min(value) OVER (PARTITION BY event_type) AS v_min,
             max(value) OVER (PARTITION BY event_type) AS v_max
      FROM events
    )
    SELECT event_id, event_type,
           round((value - v_min) / NULLIF(v_max - v_min, 0.0), 9) AS value_scaled
    FROM stats
    """,
)
def udf_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O40 MinMaxScaler as column algebra: (x−min)/(max−min) per tag.
    MLlib's MinMaxScaler model is the fitted form; the transform is this
    exact expression, shared with the DuckDB oracle.  Per-row division is
    IEEE-exact; min/max are exact — only the output is rounded."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.select(
        "event_id",
        "event_type",
        "value",
        F.expr("min(value) OVER (PARTITION BY event_type)").alias("v_min"),
        F.expr("max(value) OVER (PARTITION BY event_type)").alias("v_max"),
    )
    return stats.select(
        "event_id",
        "event_type",
        F.round(
            (F.col("value") - F.col("v_min")) / F.nullif(F.col("v_max") - F.col("v_min"), F.lit(0.0)),
            9,
        ).alias("value_scaled"),
    )


@register(
    "udf_group_normalize",
    oracle="""
    WITH stats AS (
      SELECT event_id, user_id, value,
             round(avg(value) OVER (PARTITION BY user_id), 9) AS mu,
             round(stddev_samp(value) OVER (PARTITION BY user_id), 9) AS sigma
      FROM events
    )
    SELECT event_id, user_id,
           round((value - mu) / NULLIF(sigma, 0.0), 6) AS value_z
    FROM stats
    """,
)
def udf_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O46 grouped-map normalize: per-machine standardization.  The
    canonical applyInPandas demo — expressed here as window algebra (no
    Python in the hot path); ``ml/islands.py`` carries the pandas-UDF
    form for the shapes SQL can't do."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.expr("avg(value) OVER (PARTITION BY user_id)"), 9).alias("mu"),
        F.round(F.expr("stddev_samp(value) OVER (PARTITION BY user_id)"), 9).alias("sigma"),
    )
    return stats.select(
        "event_id",
        "user_id",
        F.round((F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)), 6).alias(
            "value_z"
        ),
    )


_TAGS3 = ("click", "purchase", "view")


@register(
    "udaf_anomaly_score",
    oracle=f"""
    WITH {pivot_wide_sql(1440)},
    complete AS (
      SELECT * FROM wide
      WHERE {" AND ".join(f"evt_{t} IS NOT NULL" for t in _TAGS3)}
    ), pred AS (
      SELECT user_id, bucket,
             {", ".join(f"evt_{t}" for t in _TAGS3)},
             {", ".join(f"round(avg(evt_{t}) OVER (PARTITION BY user_id), 9) AS yhat_{t}" for t in _TAGS3)}
      FROM complete
    ), err AS (
      SELECT user_id, bucket,
             {", ".join(f"round(abs(evt_{t} - yhat_{t}), 9) AS err_{t}" for t in _TAGS3)}
      FROM pred
    )
    SELECT user_id, bucket,
           {", ".join(f"round(err_{t}, 6) AS tag_anomaly_{t}" for t in _TAGS3)},
           round(sqrt({" + ".join(f"err_{t} * err_{t}" for t in _TAGS3)}), 6) AS total_anomaly
    FROM err
    """,
)
def udaf_anomaly_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O44 DiffBasedAnomalyDetector.anomaly as pure column algebra, given
    a precomputed ŷ stand-in (per-machine mean — a linear model):
    per-tag ``err = |y − ŷ|`` and aggregate L2 norm across tags
    (reference emits the D6 MultiIndex frame: ``tag-anomaly-*`` +
    ``total-anomaly``; flattened names here per SURVEY §1.2)."""
    wide = pivot_wide(load_table(spark, sf_dir, "events"), "1440 minutes")
    complete = wide.dropna(subset=[f"evt_{t}" for t in _TAGS3])
    pred = complete.select(
        "user_id",
        "bucket",
        *[F.col(f"evt_{t}") for t in _TAGS3],
        *[
            F.round(F.expr(f"avg(evt_{t}) OVER (PARTITION BY user_id)"), 9).alias(f"yhat_{t}")
            for t in _TAGS3
        ],
    )
    err = pred.select(
        "user_id",
        "bucket",
        *[
            F.round(F.abs(F.col(f"evt_{t}") - F.col(f"yhat_{t}")), 9).alias(f"err_{t}")
            for t in _TAGS3
        ],
    )
    l2 = F.sqrt(sum(F.col(f"err_{t}") * F.col(f"err_{t}") for t in _TAGS3))
    return err.select(
        "user_id",
        "bucket",
        *[F.round(F.col(f"err_{t}"), 6).alias(f"tag_anomaly_{t}") for t in _TAGS3],
        F.round(l2, 6).alias("total_anomaly"),
    )


@register(
    "udaf_ts_cv_metrics",
    oracle="""
    WITH folds AS (
      SELECT user_id, value,
             CAST(ntile(3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS fold
      FROM events
    ), mu AS (
      SELECT user_id, fold,
             round(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*), 9) AS fold_mean
      FROM folds GROUP BY user_id, fold
    )
    SELECT f.user_id, f.fold,
           COUNT(*) AS n,
           floor(CAST(SUM(CAST(abs(f.value - m.fold_mean) AS DECIMAL(30,8))) AS DOUBLE)
                 / COUNT(*) * 1000000 + 0.5) / 1000000.0 AS mae,
           floor(sqrt(CAST(SUM(CAST((f.value - m.fold_mean) * (f.value - m.fold_mean)
                 AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)) * 1000000 + 0.5) / 1000000.0 AS rmse
    FROM folds f JOIN mu m ON f.user_id = m.user_id AND f.fold = m.fold
    GROUP BY f.user_id, f.fold
    """,
)
def udaf_ts_cv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O45 TimeSeriesSplit CV metrics: time-ordered ntile(3) fold
    assignment per machine, then per-fold MAE/RMSE against the fold-mean
    predictor (reference ``cross_validate`` + ``metric_wrapper``).  The
    real estimator CV runs in ``ml/islands.py``; fold bookkeeping and
    metric aggregation stay native."""
    ev = load_table(spark, sf_dir, "events")
    folds = ev.select(
        "user_id",
        "value",
        F.expr("CAST(ntile(3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)").alias(
            "fold"
        ),
    )
    # decimal-routed means throughout: avg-of-doubles is engine-order
    # dependent at ~1 ulp, enough to flip round() boundaries at sf0.1+;
    # exact decimal numerators / counts are bit-identical (scales sized
    # so numerators stay under 2^53 — decimal→double is then exact too)
    mu = folds.groupBy("user_id", "fold").agg(
        F.round(
            F.expr("CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE)") / F.count(F.lit(1)), 9
        ).alias("fold_mean")
    )
    dev = F.col("value") - F.col("fold_mean")
    n = F.count(F.lit(1))
    mae_sum = F.expr(
        "CAST(SUM(CAST(abs(value - fold_mean) AS DECIMAL(30,8))) AS DOUBLE)"
    )
    sq_sum = F.expr(
        "CAST(SUM(CAST((value - fold_mean) * (value - fold_mean) AS DECIMAL(30,6))) AS DOUBLE)"
    )
    return (
        folds.join(mu, ["user_id", "fold"])
        .groupBy("user_id", "fold")
        .agg(
            n.alias("n"),
            # floor-shift, not round(): engines disagree on exact half-ties
            # (Spark rounds the shortest decimal repr, DuckDB multiplies)
            (F.floor(mae_sum / n * 1e6 + 0.5) / 1e6).alias("mae"),
            (F.floor(F.sqrt(sq_sum / n) * 1e6 + 0.5) / 1e6).alias("rmse"),
        )
    )
