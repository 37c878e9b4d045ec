"""Bucketed co-located join (SURVEY §4 physical posture): two tables
bucketed on the join key join WITHOUT any Exchange — the 100 TB recipe
for repeated fact-fact joins (pay the shuffle once at write time).
Result parity against the plain join is asserted too."""

import io
import contextlib

import pytest

from pyspark.sql import functions as F

from gordo_components_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist — clear both catalog and location
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/gordo_spark_warehouse/{t}", ignore_errors=True)
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_orders"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("b_lineitem"))

    bucketed = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bucketed.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"

    plain = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
    assert bucketed.count() == plain.count()
