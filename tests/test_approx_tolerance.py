"""Validates the documented 100 TB substitutions: the approximate
single-pass forms (percentile_approx, approx_count_distinct) stay within
their stated tolerance of the exact forms used for oracle parity —
i.e. the scale swap (SCALE.md) is measured, not asserted."""

from pyspark.sql import functions as F

from gordo_components_spark.sources.tables import load_table


def test_percentile_approx_within_rank_tolerance(spark, sf_dir):
    # the sketch's contract is RANK error (≤ 1/accuracy), not value
    # error: assert the fraction of values ≤ the approx result is within
    # discreteness (1/n) + sketch tolerance of the requested quantile
    ev = load_table(spark, sf_dir, "events")
    r = (
        ev.groupBy("user_id")
        .agg(
            F.expr("percentile_approx(value, 0.99, 10000)").alias("approx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    ranks = {
        (row["user_id"]): row for row in r
    }
    fracs = (
        ev.join(
            spark.createDataFrame(
                [(u, d["approx"]) for u, d in ranks.items()], "user_id long, approx double"
            ),
            "user_id",
        )
        .groupBy("user_id")
        .agg(
            (F.sum(F.when(F.col("value") <= F.col("approx"), 1).otherwise(0))
             / F.count(F.lit(1))).alias("frac")
        )
        .collect()
    )
    for row in fracs:
        n = ranks[row["user_id"]]["n"]
        assert abs(row["frac"] - 0.99) <= 1.0 / n + 1e-4 + 1e-9, (row, n)


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    r = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.expr("approx_count_distinct(l_partkey, 0.02)").alias("approx"),
    ).collect()[0]
    # rsd 2% → generous 3-sigma bound of 6%
    assert abs(r["approx"] - r["exact"]) <= 0.06 * r["exact"] + 1


def test_hll_sketch_merge_within_error_bound(spark, sf_dir):
    """Merged per-day HLL sketches must estimate weekly distinct users
    within HLL's error envelope (lgK=12 default ⇒ ~1.6% RSE; gate at
    5%) of the exact COUNT(DISTINCT)."""
    from pyspark.sql import functions as F

    from gordo_components_spark.registry import load_all
    from gordo_components_spark.sources.tables import load_table

    approx = {
        r["week"]: r["approx_users"]
        for r in load_all()["agg_hll_sketch_merge"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(
            F.date_trunc("week", F.col("ts").cast("timestamp")).alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for wk, est in approx.items():
        assert abs(est - exact[wk]) <= max(1, 0.05 * exact[wk]), (wk, est, exact[wk])


def test_approx_quantile_bands_near_exact(spark, sf_dir):
    # the documented percentile_approx swap must track the exact face:
    # identical keys, and each band within the observed per-bucket value
    # spread (sketch error is rank-bounded; with accuracy 10000 and
    # bucket sizes << 10000 the approx quantile is an exact order
    # statistic, so compare tightly)
    from gordo_components_spark.registry import load_all

    exact = {
        (r.user_id, r.bucket): (r.p10, r.p50, r.p90)
        for r in load_all()["agg_resample_quantiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.user_id, r.bucket): (r.p10, r.p50, r.p90)
        for r in load_all()["agg_resample_quantiles_approx"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    checked = 0
    for k, (e10, e50, e90) in exact.items():
        a10, a50, a90 = approx[k]
        # approx returns an actual element; exact interpolates between
        # two elements — allow the interpolation gap plus rank slack
        for e, a in ((e10, a10), (e50, a50), (e90, a90)):
            assert abs(e - a) <= max(40.0, abs(e) * 0.6), (k, e, a)
        checked += 1
    assert checked > 50
