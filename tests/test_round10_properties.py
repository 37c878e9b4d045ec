"""Property rings for the round-10 operators (SURVEY §5 style): the
claims that carry each operator's correctness argument, attacked with
randomized inputs — independent of the DuckDB oracle (which is the
cross-engine check, not a completeness proof)."""

import hashlib
import random

import pytest
from hypothesis import given, settings, strategies as st

from gordo_components_spark.registry import load_all
from gordo_components_spark.sources.tables import load_table


# ---------------------------------------------------- levenshtein blocking


def _blocks(s: str) -> set:
    # mirror of join_fuzzy_levenshtein's two block keys: 6-char prefix,
    # 6-char END-aligned suffix
    return {(0, s[:6]), (1, s[-6:])}


def _random_edit(rng: random.Random, s: str) -> str:
    p = rng.randrange(len(s))
    kind = rng.choice(["sub", "ins", "del"])
    if kind == "sub":
        return s[:p] + "z" + s[p + 1 :]
    if kind == "ins":
        return s[:p] + "z" + s[p:]
    return s[:p] + s[p + 1 :]


def test_levenshtein_pigeonhole_complete_under_random_single_edits():
    # the k=1 two-half pigeonhole claim: ANY single substitution,
    # insertion, or deletion leaves the prefix-6 or the end-aligned
    # suffix-6 intact — so the candidate equi-join can never miss a
    # true (distance <= 1) match.  5000 random trials over random
    # 12-hex fingerprints x random edit kind/position.
    rng = random.Random(1610)
    for _ in range(5000):
        fp = hashlib.md5(str(rng.random()).encode()).hexdigest()[:12]
        dirty = _random_edit(rng, fp)
        assert _blocks(fp) & _blocks(dirty), (fp, dirty)


# ------------------------------------------------------ bottom-k sketch


def _bottomk(items, k=10):
    return sorted(items)[:k]


@settings(max_examples=200, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bottomk_merge_invariant_under_any_slicing(ids, seed):
    # the mergeability claim behind stream_sample_bottomk_genuine:
    # folding the sketch over ANY partition of the input into batches
    # (state update = merge + truncate) equals the global bottom-k.
    rng = random.Random(seed)
    pairs = [(hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids]
    golden = _bottomk(pairs)
    # random slicing into micro-batches, random arrival order
    shuffled = pairs[:]
    rng.shuffle(shuffled)
    state = []
    while shuffled:
        n = rng.randrange(1, len(shuffled) + 1)
        batch, shuffled = shuffled[:n], shuffled[n:]
        state = _bottomk(state + batch)
    assert state == golden


# ------------------------------------------------- Mann-Kendall / Theil-Sen


def test_mann_kendall_matches_pure_python_reference(spark, sf_dir):
    # third implementation (after Spark and the DuckDB oracle): a
    # sequential pure-python MK over the same fixture must agree row
    # for row — the decimal-routed cross-multiplication argument is
    # only as good as its agreement with the naive rational compare.
    from fractions import Fraction

    reg = load_all()
    got = {
        (r["user_id"], r["event_type"]): (r["n_pairs"], r["s_stat"])
        for r in reg["agg_mann_kendall"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "event_type",
            "CAST(date_trunc('day', ts) AS DATE) AS day",
            "CAST(round(value * 100) AS BIGINT) AS v100",
        )
        .collect()
    )
    series = {}
    for r in rows:
        key = (r["user_id"], r["event_type"])
        day = series.setdefault(key, {}).setdefault(r["day"], [0, 0])
        day[0] += 1
        day[1] += r["v100"]
    for key, days in series.items():
        means = [
            Fraction(s, n) for _, (n, s) in sorted(days.items(), key=lambda kv: kv[0])
        ]
        s_stat = 0
        n_pairs = 0
        for i in range(len(means)):
            for j in range(i + 1, len(means)):
                n_pairs += 1
                s_stat += (means[j] > means[i]) - (means[j] < means[i])
        assert got[key] == (n_pairs, s_stat), key


def test_theil_sen_median_slope_sign_consistent_with_mk(spark, sf_dir):
    # cross-operator sanity: on series where MK says strongly monotone
    # (|S| close to n_pairs), the Theil-Sen median slope must carry the
    # same sign.  (Weak-trend series can legitimately disagree at 0.)
    reg = load_all()
    mk = {
        (r["user_id"], r["event_type"]): (r["n_pairs"], r["s_stat"])
        for r in reg["agg_mann_kendall"].fn(spark, sf_dir).collect()
    }
    ts = {
        (r["user_id"], r["event_type"]): r["slope_cents_per_day"]
        for r in reg["agg_theil_sen"].fn(spark, sf_dir).collect()
    }
    assert set(mk) == set(ts)
    checked = 0
    for key, (n_pairs, s_stat) in mk.items():
        if n_pairs >= 10 and abs(s_stat) * 2 > n_pairs:
            slope = ts[key]
            assert slope != 0, key
            assert (slope > 0) == (s_stat > 0), key
            checked += 1
    assert checked > 0  # the fixture must exercise the property


# --------------------------------------------------------- coverage curve


def test_coverage_curve_is_minimal_and_monotone(spark, sf_dir):
    # k_tokens must be the SMALLEST prefix reaching the threshold:
    # cum(k) >= thr*total and cum(k-1) < thr*total; thresholds monotone.
    reg = load_all()
    rows = {
        r["thr"]: r
        for r in reg["ext_ngram_coverage_curve"].fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").selectExpr("text").collect()
    from collections import Counter

    tf = Counter()
    for r in docs:
        tf.update(r["text"].split(" "))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    cums = []
    acc = 0
    for _, c in ranked:
        acc += c
        cums.append(acc)
    for thr, row in rows.items():
        k = row["k_tokens"]
        assert row["total"] == total and row["vocab"] == len(ranked)
        assert cums[k - 1] * 100 >= total * thr
        if k > 1:
            assert cums[k - 2] * 100 < total * thr
        assert row["cum_count"] == cums[k - 1]
    ks = [rows[t]["k_tokens"] for t in sorted(rows)]
    assert ks == sorted(ks)


# ------------------------------------------------------------- uptime SLA


def test_uptime_sla_invariants(spark, sf_dir):
    reg = load_all()
    for r in reg["agg_uptime_sla"].fn(spark, sf_dir).collect():
        assert 1 <= r["hours_present"] <= r["span_hours"]
        assert 0 < r["coverage_permille"] <= 1000
        assert r["meets_sla95"] == (
            r["hours_present"] * 100 >= r["span_hours"] * 95
        )


# -------------------------------------------------- paragraph/block dedup


def test_paragraph_dedup_block_accounting_matches_pure_python(spark, sf_dir):
    # r10 verdict item 9 (the one r10 operator without its own ring):
    # every COMPLETE 8-token block is counted exactly once — n_blocks per
    # doc equals the independent pure-python floor(len/8) recount, and
    # n_shared_blocks equals a pure-python dict recount of blocks seen in
    # >= 2 distinct docs.
    rows = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    texts = {r.doc_id: r.text.split(" ") for r in rows}
    expect_blocks = {d: len(tk) // 8 for d, tk in texts.items()}
    owners: dict[str, set] = {}
    per_doc: dict[int, list] = {}
    for d, tk in texts.items():
        blks = [" ".join(tk[i * 8 : i * 8 + 8]) for i in range(len(tk) // 8)]
        per_doc[d] = blks
        for b in blks:
            owners.setdefault(b, set()).add(d)
    expect_shared = {
        d: sum(1 for b in blks if len(owners[b]) > 1) for d, blks in per_doc.items()
    }

    out = {
        r.doc_id: r
        for r in load_all()["ext_dedup_paragraph"].fn(spark, sf_dir).collect()
    }
    assert set(out) == {d for d, n in expect_blocks.items() if n > 0}
    for d, r in out.items():
        assert r.n_blocks == expect_blocks[d], d
        assert r.n_shared_blocks == expect_shared[d], d
        assert r.dup_ratio == pytest.approx(expect_shared[d] / expect_blocks[d])


def test_paragraph_dedup_verbatim_duplicate_has_ratio_one(spark, tmp_path):
    # a document duplicated verbatim shares EVERY block with its twin ->
    # dup_ratio exactly 1.0 for both; an all-unique-words doc shares none.
    import pandas as pd

    dup_text = " ".join(f"w{i % 9}" for i in range(24))  # 3 full blocks
    uniq_text = " ".join(f"u{i}" for i in range(17))  # 2 full blocks + tail
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [dup_text, dup_text, uniq_text],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.doc_id: r
        for r in load_all()["ext_dedup_paragraph"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1].n_blocks == out[2].n_blocks == 3
    assert out[1].dup_ratio == out[2].dup_ratio == 1.0
    assert out[3].n_blocks == 2 and out[3].n_shared_blocks == 0
    assert out[3].dup_ratio == 0.0


def test_paragraph_dedup_digest_grouping_collision_free_on_fixture(spark, sf_dir):
    # the digest swap the oracle cross-checks: xxhash64(block text) must
    # partition the fixture's blocks exactly like the strings themselves
    # (distinct digests == distinct block texts).
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    blocks = (
        docs.select("doc_id", F.split("text", " ").alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.expr("sequence(0, CAST(floor((size(tk) - 1) / 8) AS INT))")
            ).alias("k"),
            "tk",
        )
        .select(F.expr("slice(tk, k * 8 + 1, 8)").alias("bt"))
        .where(F.size("bt") == 8)
        .select(F.array_join("bt", " ").alias("btxt"))
    )
    agg = blocks.agg(
        F.count_distinct("btxt").alias("n_str"),
        F.count_distinct(F.xxhash64("btxt")).alias("n_hash"),
    ).collect()[0]
    assert agg.n_str == agg.n_hash
