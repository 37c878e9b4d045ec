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
    # round 5: the batch-through-IVF face shares the two-stage cut and
    # adds a pruned-scan + broadcast probe-map join to keep invariant
    "ext_ann_batch_ivf",
    # round 5: salted pair-join sharding must not perturb the pair sums
    "ext_tfidf_similar_capped",
    # round 7 late: the 1-row benchmark fold (collect_list order varies
    # with partitioning; max-of-cosines must not) and the per-source
    # rank cut (rank ties broken by doc_id, so the kept set is fixed)
    "pipe_decontaminate_semantic",
    "pipe_quality_trim",
    # round 8 late: the two island downsamplers/forecasters (per-series
    # sequential selection must depend only on the series, never the
    # partition layout feeding the spread repartition), the stacked
    # rolling-median pair, and the floor-shift-ranked xcorr is_best cut
    "agg_lttb_downsample",
    "ml_forecast_holt",
    "window_hampel_outlier",
    "agg_xcorr_leadlag",
    # round 9: the order-pinned float fold (running-sum window — the
    # canonical partition-order hazard), the decimal-summed entropy
    # terms, the double-argmax binseg split, the sorted-union nearest
    # join, RRF's two TakeOrdered legs, the per-day trapezoid TWA, and
    # the three-level global-rank decomposition
    "pipe_mixture_temperature",
    "agg_entropy",
    "window_binseg_split",
    "join_nearest_value",
    "ext_hybrid_rrf",
    "agg_time_weighted_avg",
    "pipe_curriculum_rank",
    # round 11 session 2: the decimal-PAA symbol cut (z chain must see
    # the same exact ints at any layout), the sufficient-statistics OLS
    # (decimal-routed moments), the e9 covariance cells, the two eval
    # faces (rank/argmin tie rules are part of the contract), the
    # integer-census triangle count, the CM sketch (pure ints — pins
    # the hash/cell algebra), the salted join (decimal cents through a
    # replicated build), and the driver-fold PCA projection (collect
    # order of the 2080 covariance rows must not matter)
    "agg_sax_symbols",
    "agg_ols_trend",
    "ext_embed_covariance",
    "ext_eval_retrieval",
    "ext_eval_cluster_assign",
    "ext_graph_triangles",
    "agg_countmin_estimate",
    "join_skew_salted",
    "ext_embed_pca_project",
]


def _rows(spark, name, sf_dir):
    df = load_all()[name].fn(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


def test_pack_prefix_sum_distributes_beyond_source_count(spark, sf_dir, monkeypatch):
    """Round-5: the packing prefix sum is a TWO-PASS shard decomposition —
    its output must be invariant to the shard width (the per-source serial
    window is the width=∞ degenerate case), and the big-side window key
    (source, shard) must have MORE distinct groups than there are sources,
    i.e. parallelism is #shards, not #sources (r4 verdict's one `weak`)."""
    from gordo_components_spark.operators import extensions_pipeline as ep

    base = _rows(spark, "pipe_pack_sequences", sf_dir)
    monkeypatch.setattr(ep, "_PACK_SHARD_DOCS", 7)
    sharded = _rows(spark, "pipe_pack_sequences", sf_dir)
    assert base == sharded

    from gordo_components_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    n_groups = (
        docs.selectExpr("source", f"doc_id div {ep._PACK_SHARD_DOCS} as s")
        .distinct()
        .count()
    )
    assert n_groups > n_sources


def test_pack_slices_partition_doc_tokens(spark, sf_dir, monkeypatch):
    """With a small budget (the fixture's packs barely straddle at the
    default 2048), every doc's slice list must exactly partition
    [0, n_toks): contiguous, ordered by pack_id, each slice at most one
    budget long, and consistent with pipe_pack_sequences' start pack."""
    from collections import defaultdict

    from gordo_components_spark.operators import extensions_pipeline as ep

    monkeypatch.setattr(ep, "_PACK_BUDGET", 64)
    slices = defaultdict(list)
    for r in ep.pipe_pack_slices(spark, sf_dir).collect():
        slices[r.doc_id].append((r.pack_id, r.begin_tok, r.end_tok))
    starts = {
        r.doc_id: (r.pack_id, r.n_toks)
        for r in ep.pipe_pack_sequences(spark, sf_dir).collect()
    }
    assert set(slices) == {d for d, (_, n) in starts.items() if n > 0}
    n_multi = 0
    for doc_id, sl in slices.items():
        sl.sort()
        first_pack, n_toks = starts[doc_id]
        assert sl[0][0] == first_pack
        assert sl[0][1] == 0 and sl[-1][2] == n_toks
        n_multi += len(sl) > 1
        for (p0, _, e0), (p1, b1, _) in zip(sl, sl[1:]):
            assert p1 == p0 + 1 and b1 == e0  # contiguous doc coverage
        for _, b, e in sl:
            assert 0 < e - b <= 64
    assert n_multi > 0  # the small budget must actually force straddles


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


def test_curriculum_rank_shard_invariance(spark, sf_dir, monkeypatch):
    """Round-9: the three-level offset decomposition must be invariant
    to the corpus-derived shard width (at scale the width tracks
    cluster parallelism, so it WILL differ between local[32] and a
    1000-executor run) and must emit a contiguous 1..n permutation —
    the literal global row_number the oracle derives with one window."""
    from gordo_components_spark.operators import extensions_pipeline as ep

    base = _rows(spark, "pipe_curriculum_rank", sf_dir)
    monkeypatch.setattr(ep, "_pack_shard_docs", lambda spark, sf: 13)
    sharded = _rows(spark, "pipe_curriculum_rank", sf_dir)
    assert base == sharded
    ranks = sorted(r[2] for r in base)
    assert ranks == list(range(1, len(base) + 1))
