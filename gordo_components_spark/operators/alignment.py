"""Multi-tag alignment joins O15–O16 (SURVEY §2.3) — the reference's one
join family.

Reference: ``gordo_components/dataset/datasets.py::_join_timeseries`` —
after per-tag resample, inner-join all tag series on the bucket index
(dropna ≡ inner); later revisions (gordo-dataset) add ffill/linear
interpolation bounded by ``interpolation_limit`` — a bounded as-of join.

Spark-first: one pivot produces the outer-aligned frame (single shuffle,
no N-way join chain); inner = dropna, as-of = last-ignore-nulls window +
staleness bound.  Both partition by machine, so windows never cross
partition boundaries at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.functions.timeseries import EVENT_TYPES, pivot_wide, pivot_wide_sql
from gordo_components_spark.registry import register
from gordo_components_spark.sources.tables import load_table

_TAGS3 = ("click", "purchase", "view")


@register(
    "join_align_inner",
    oracle=f"""
    WITH {pivot_wide_sql(1440)}
    SELECT user_id, bucket, {", ".join(f"evt_{t}" for t in _TAGS3)}
    FROM wide
    WHERE {" AND ".join(f"evt_{t} IS NOT NULL" for t in _TAGS3)}
    """,
    tags=("bench",),
)
def join_align_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15 inner alignment: buckets missing ANY tag are dropped (the
    reference's dropna-after-join).  Pivot + dropna — one shuffle total
    vs. N−1 shuffles for an iterated join chain."""
    wide = pivot_wide(load_table(spark, sf_dir, "events"), "1440 minutes")
    return wide.dropna(subset=[f"evt_{t}" for t in _TAGS3]).select(
        "user_id", "bucket", *[f"evt_{t}" for t in _TAGS3]
    )


_FFILL_LIMIT_BUCKETS = 6  # staleness bound ≡ interpolation_limit (e.g. "6H" at 1h buckets)


@register(
    "join_asof_ffill",
    oracle=f"""
    WITH {pivot_wide_sql(60)},
    spine AS (
      SELECT u.user_id, s.bucket
      FROM (SELECT DISTINCT user_id FROM wide) u
      CROSS JOIN (
        SELECT unnest(generate_series(
          (SELECT min(bucket) FROM wide),
          (SELECT max(bucket) FROM wide),
          INTERVAL '60 minutes')) AS bucket
      ) s
    ), joined AS (
      SELECT s.user_id, s.bucket, w.evt_click
      FROM spine s LEFT JOIN wide w USING (user_id, bucket)
    ), filled AS (
      SELECT user_id, bucket, evt_click,
             last_value(evt_click IGNORE NULLS) OVER w AS ff,
             max(CASE WHEN evt_click IS NOT NULL THEN bucket END) OVER w AS last_seen
      FROM joined
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, bucket,
           CASE WHEN bucket - last_seen <= INTERVAL '{_FFILL_LIMIT_BUCKETS} hours'
                THEN ff END AS evt_click_ffill
    FROM filled
    """,
)
def join_asof_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16 as-of forward-fill with staleness limit: project each tag onto a
    dense bucket spine, carry the last observation forward, NULL it out
    once older than ``interpolation_limit`` (gordo-dataset
    ``interpolation_method="ffill"``).  last(ignoreNulls) over an
    unbounded-preceding frame is Spark's as-of idiom."""
    wide = pivot_wide(load_table(spark, sf_dir, "events"), "60 minutes")
    bounds = wide.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    spine = (
        wide.select("user_id").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 60 minutes)")).alias("bucket"),
        )
    )
    joined = spine.join(wide.select("user_id", "bucket", "evt_click"), ["user_id", "bucket"], "left")
    w = "PARTITION BY user_id ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    filled = joined.select(
        "user_id",
        "bucket",
        F.expr(f"last(evt_click, true) OVER ({w})").alias("ff"),
        F.expr(
            f"max(CASE WHEN evt_click IS NOT NULL THEN bucket END) OVER ({w})"
        ).alias("last_seen"),
    )
    return filled.select(
        "user_id",
        "bucket",
        F.when(
            F.col("bucket") <= F.col("last_seen") + F.expr(f"INTERVAL {_FFILL_LIMIT_BUCKETS} HOURS"),
            F.col("ff"),
        ).alias("evt_click_ffill"),
    )
