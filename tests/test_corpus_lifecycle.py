"""Corpus-lifecycle operators (extensions_corpus): Misra–Gries guarantee
under forced decrements, incremental-dedup index cache hygiene, and
snapshot-diff classification invariants."""

import json
import os
import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_misra_gries_guarantee_under_decrements():
    """Adversarial stream with a tiny capacity: many distinct fillers force
    the batched-decrement path repeatedly; every token whose count exceeds
    Np/(capacity+1) must still survive the summary, with residual <= true
    count (undercount only, never overcount)."""
    import pandas as pd

    from gordo_components_spark.operators.extensions_corpus import (
        _misra_gries_partition,
    )

    # 3 heavy tokens among a sea of 400 singletons, chunked to force the
    # decrement step at capacity 7 on every chunk boundary.
    stream = []
    for rep in range(40):
        stream.append(["hot_a", "hot_b"] * 3 + [f"noise_{rep}_{j}" for j in range(10)])
    docs = pd.DataFrame({"t": stream})
    batches = [docs.iloc[i : i + 5] for i in range(0, len(docs), 5)]
    (out,) = list(_misra_gries_partition(iter(batches), capacity=7))

    np_row = out[out["token"].isnull()]
    n_total = int(np_row["est"].iloc[0])
    assert n_total == sum(len(t) for t in stream)

    survivors = dict(zip(out["token"], out["est"]))
    true_counts = {"hot_a": 120, "hot_b": 120}
    bound = n_total / (7 + 1)
    for tok, c in true_counts.items():
        assert c > bound  # fixture sanity: they are genuinely heavy
        assert tok in survivors, f"heavy token {tok} evicted"
        assert 0 < survivors[tok] <= c  # undercount-only residual


def test_heavy_hitters_matches_bruteforce(spark):
    from gordo_components_spark.operators.extensions_corpus import (
        _HH_INV_PHI,
        agg_heavy_hitters,
    )
    from gordo_components_spark.sources.tables import load_table

    got = {
        r["token"]: r["cnt"]
        for r in agg_heavy_hitters(spark, SF_SMALL).collect()
    }
    toks = load_table(spark, SF_SMALL, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    n = toks.count()
    want = {
        r["token"]: r["cnt"]
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * _HH_INV_PHI > n)
        .collect()
    }
    assert got == want and len(want) > 0


def test_dedup_index_rebuilds_after_partial_deletion(spark):
    """CLAUDE.md marks /tmp/gordo_spark_* safe to delete: a marker left
    behind after the payload dir is removed must trigger a rebuild, not a
    permanent failure (advisory-hardened cache discipline)."""
    from gordo_components_spark.operators.extensions_corpus import (
        build_dedup_index,
        pipe_dedup_incremental,
    )

    root = build_dedup_index(spark, SF_SMALL)
    assert os.path.isdir(os.path.join(root, "hist"))
    # simulate partial deletion: payload gone, marker kept
    shutil.rmtree(os.path.join(root, "hist"))
    assert os.path.isfile(os.path.join(root, "_BUILT.json"))
    root2 = build_dedup_index(spark, SF_SMALL)
    assert os.path.isdir(os.path.join(root2, "hist"))
    # stale fingerprint: marker content mismatch also rebuilds
    with open(os.path.join(root2, "_BUILT.json"), "w") as fh:
        json.dump({"stale": True}, fh)
    root3 = build_dedup_index(spark, SF_SMALL)
    with open(os.path.join(root3, "_BUILT.json")) as fh:
        assert json.load(fh) != {"stale": True}
    assert pipe_dedup_incremental(spark, SF_SMALL).count() > 0


def test_snapshot_diff_classes_are_exhaustive(spark):
    from gordo_components_spark.operators.extensions_corpus import pipe_snapshot_diff
    from gordo_components_spark.sources.tables import load_table

    diff = pipe_snapshot_diff(spark, SF_SMALL)
    rows = diff.collect()
    classes = {r["change_type"] for r in rows}
    assert classes == {"added", "removed", "changed"}
    docs = load_table(spark, SF_SMALL, "documents")
    n_rm = docs.where(F.col("doc_id") % 13 == 0).count()
    n_add = docs.where(F.col("doc_id") % 17 == 0).count()
    by_class = {c: sum(1 for r in rows if r["change_type"] == c) for c in classes}
    assert by_class["removed"] == n_rm
    assert by_class["added"] == n_add
    # changed rows carry both digests; added/removed carry exactly one
    for r in rows:
        if r["change_type"] == "changed":
            assert r["old_hash"] and r["new_hash"] and r["old_hash"] != r["new_hash"]
        elif r["change_type"] == "added":
            assert r["old_hash"] is None and r["new_hash"]
        else:
            assert r["new_hash"] is None and r["old_hash"]
