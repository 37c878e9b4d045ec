"""TPC-H classics adapted to the fixture star schema (bench depth).

The driver's tables are TPC-H-ish (TESTDATA.md); these are the
standard multi-join analytical shapes — Q3 (shipping priority), Q5
(local-supplier volume), Q10 (returned items) — with the columns the
fixture actually has.  They exercise the join-ordering / broadcast /
partial-agg machinery end-to-end and anchor the bench against
recognizable workloads.

Scale notes: dims broadcast; orders⋈lineitem is the one real shuffle
(AQE sort-merge); revenue sums ride the DECIMAL-exact convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gordo_components_spark.registry import register
from gordo_components_spark.sources.tables import load_table

_REV = "CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) * 100 AS BIGINT)"


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           {_REV} AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """,
    tags=("bench",),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping-priority shape: unshipped revenue of a segment's
    orders placed before the cutoff."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.expr(_REV).alias("revenue_cents"))
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))), 2) * 100
           AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue-change: pure predicate + aggregate — the
    canonical scan-pushdown benchmark (every predicate reaches the
    parquet scan; no shuffle beyond the final single-row agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.expr(
            "CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))), 2) * 100 AS BIGINT)"
        ).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, {_REV} AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: revenue where customer and supplier
    share a nation inside one region (the classic snowflake 6-way)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(_REV).alias("revenue_cents"))
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {_REV} AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-items report: per-customer lost revenue from returns
    in a window."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(_REV).alias("revenue_cents"))
    )
