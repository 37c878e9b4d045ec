"""Cluster-determinism ring: results must be BYTE-IDENTICAL regardless of
partition count — the property that makes a 1000-executor run agree with
local[32] (and the DuckDB oracle hash meaningful).  Summation order
changes with partitioning; the decimal-routing / round-9-6 / floor-shift
conventions exist precisely so the answer doesn't."""

import pytest

from gordo_components_spark.registry import load_all

# float-heavy faces where accumulation order WOULD leak without the
# conventions: decimal sums, windowed means, resample aggs, top-k ties
QUERIES = [
    "agg_groupby_sum",
    "agg_resample_multi",
    "window_rolling_avg",
    "agg_error_quantile",
    "tpch_q1",
    "sort_limit_topk",
    # round 3: interpolation (floor-shift over window blends), the
    # market-share ratio (cents/cents division), and the e2e curation
    # composition (hash-bucket split over a dedup shuffle)
    "agg_resample_interp",
    "tpch_q8",
    "pipe_curation_e2e",
    # round 4: the two-stage (per-partition, then global) batch top-k —
    # the local cut must never drop a global top-k row at any layout —
    # and the packing window (integer cumsum per source partition)
    "ext_ann_batch",
    "pipe_pack_sequences",
]


def _rows(spark, name, sf_dir):
    df = load_all()[name].fn(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_partition_count(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        low = _rows(spark, name, sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        high = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert low == high
