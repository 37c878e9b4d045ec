"""Property rings for the round-11 operators (SURVEY §5 style): the
claims carrying each operator's correctness argument, attacked with
randomized inputs — independent of the DuckDB oracle."""

import random

import pytest

from gordo_components_spark.registry import load_all
from gordo_components_spark.sources.tables import load_table


# ------------------------------------------------------- pHash banding


def _words(h: int) -> list:
    return [(h >> (16 * i)) & 0xFFFF for i in range(4)]


def test_phash_pigeonhole_complete_under_any_3_bit_flips():
    # the banding claim: ANY <= 3 bit flips on a 64-bit hash leave at
    # least one of the four 16-bit bands untouched, so the band
    # equi-join can never miss a true (hamming <= 3) pair.  Random
    # hashes x random flip sets, including adversarial same-band
    # clusters.
    rng = random.Random(1611)
    for _ in range(5000):
        h = rng.getrandbits(64)
        n_flips = rng.randint(0, 3)
        flipped = h
        for _ in range(n_flips):
            flipped ^= 1 << rng.randrange(64)
        wa, wb = _words(h), _words(flipped)
        assert any(a == b for a, b in zip(wa, wb))
        # and the verify expression is the true Hamming distance
        ham = sum(bin(a ^ b).count("1") for a, b in zip(wa, wb))
        assert ham == bin(h ^ flipped).count("1")
        assert ham <= n_flips  # duplicate flips only cancel


def test_phash_four_flips_can_escape_banding():
    # the contract boundary: k=3 is the guarantee; 4 flips hitting all
    # four bands DO escape — documents why the threshold and band count
    # move together (k+1 bands).
    h = 0
    flipped = h ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)
    wa, wb = _words(h), _words(flipped)
    assert not any(a == b for a, b in zip(wa, wb))


def test_phash_operator_finds_every_clone_pair(spark, sf_dir):
    # fixture-level completeness: every doc_id % 4 == 0 clone (<= 2
    # flips by construction) must appear in the output paired with its
    # original.
    out = load_all()["ext_media_phash_neardup"].fn(spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    for r in docs:
        if r.doc_id % 4 == 0:
            assert (r.doc_id, r.doc_id + 10000000) in pairs, r.doc_id
    assert all(r.hamming <= 3 for r in out)


# -------------------------------------------------- span corruption masks


@pytest.fixture(scope="module")
def span_rows(request):
    spark = request.getfixturevalue("spark")
    sf_dir = request.getfixturevalue("sf_dir")
    rows = load_all()["pipe_span_corruption_masks"].fn(spark, sf_dir).collect()
    toks = {
        r.doc_id: len(r.text.split(" "))
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    return rows, toks


def test_span_masks_in_bounds_and_window_aligned(span_rows):
    rows, toks = span_rows
    assert rows
    for r in rows:
        n = toks[r.doc_id]
        assert 1 <= r.span_start <= n, r
        assert 1 <= r.span_len <= 3, r
        assert r.span_start + r.span_len - 1 <= n, r
        # the span's start lies inside its window's 8-offset head
        assert r.window_id * 10 + 1 <= r.span_start <= r.window_id * 10 + 8, r


def test_span_masks_deterministic_pure_function(spark, sf_dir, span_rows):
    # re-running yields the identical mask set (no RNG, no partition
    # dependence) — the resumable-loader property.
    rows, _ = span_rows
    again = load_all()["pipe_span_corruption_masks"].fn(spark, sf_dir).collect()
    key = lambda r: (r.doc_id, r.window_id, r.span_start, r.span_len)  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))


def test_span_masks_corruption_rate_near_nominal(span_rows):
    # ~30% of windows draw a span; the md5 bucket is uniform, so the
    # fixture-wide rate sits near 0.3 (loose 5-sigma band).
    rows, toks = span_rows
    n_windows = sum((n - 1) // 10 + 1 for n in toks.values())
    rate = len(rows) / n_windows
    # masked-window selection additionally requires span_start <= n_tok
    # (rarely cut on the trailing partial window), so allow a low skew
    assert 0.24 < rate < 0.36, rate


# -------------------------------------------------- round-11 batch 2 ops


def test_countmin_matches_pure_python_sketch(spark, sf_dir):
    # independent replication: build the 4x256 sketch in plain python
    # (hashlib md5, ints) and check every estimate and overcount.
    import hashlib

    reg = load_all()
    out = {
        (r["event_type"], r["user_id"]): (r["n_exact"], r["cm_est"], r["overcount"])
        for r in reg["agg_countmin_estimate"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    exact: dict = {}
    for r in ev:
        exact[(r["event_type"], r["user_id"])] = exact.get((r["event_type"], r["user_id"]), 0) + 1
    sketch = [[0] * 256 for _ in range(4)]
    cells = {}
    for (et, uid), n in exact.items():
        h = hashlib.md5(f"{et}:{uid}".encode()).hexdigest()
        cs = [int(h[2 * r : 2 * r + 2], 16) for r in range(4)]
        cells[(et, uid)] = cs
        for r, c in enumerate(cs):
            sketch[r][c] += n
    assert set(out) == set(exact)
    for key, n in exact.items():
        est = min(sketch[r][c] for r, c in enumerate(cells[key]))
        assert out[key] == (n, est, est - n)
        assert est >= n  # CM error is one-sided


def test_triangle_census_matches_pure_python_recount(spark, sf_dir):
    reg = load_all()
    row = reg["ext_graph_triangles"].fn(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    from collections import defaultdict

    by_block = defaultdict(set)
    for r in docs:
        tk = r["text"].split(" ")
        for k in range(0, len(tk) // 8 * 8, 8):
            by_block[" ".join(tk[k : k + 8])].add(r["doc_id"])
    adj = defaultdict(set)
    for ds in by_block.values():
        if 2 <= len(ds) <= 8:
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    adj[ds[i]].add(ds[j])
                    adj[ds[j]].add(ds[i])
    n_nodes = len(adj)
    n_edges = sum(len(v) for v in adj.values()) // 2
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tri = 0
    for u, nbrs in adj.items():
        for v in nbrs:
            if v > u:
                tri += len(nbrs & adj[v] & {x for x in adj[v] if x > v})
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"], row["n_triangles"]) == (
        n_nodes,
        n_edges,
        n_wedges,
        tri,
    )
    assert 3 * row["n_triangles"] <= max(row["n_wedges"], 1)


def test_covariance_matches_numpy_e9(spark, sf_dir):
    import numpy as np

    reg = load_all()
    got = {
        (r["i"], r["j"]): (r["sxy_e9"], r["cov"])
        for r in reg["ext_embed_covariance"].fn(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    x = np.array([r["embedding"] for r in emb], dtype=np.float64)
    n, d = x.shape
    assert len(got) == d * (d + 1) // 2
    p9 = np.floor(x[:, :, None] * x[:, None, :] * 1e9 + 0.5).sum(axis=0)
    s9 = np.floor(x * 1e9 + 0.5).sum(axis=0)
    for i in range(d):
        for j in range(i, d):
            sxy, cov = got[(i, j)]
            assert sxy == int(p9[i, j])
            want = (p9[i, j] / 1e9 - (s9[i] / 1e9) * (s9[j] / 1e9) / n) / n
            assert abs(cov - round(want, 9)) <= 1e-9


def test_pca_projection_matches_numpy_power_iteration(spark, sf_dir):
    import numpy as np

    reg = load_all()
    out = reg["ext_embed_pca_project"].fn(spark, sf_dir).collect()
    assert len(out) == 20
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    x = np.array([r["embedding"] for r in emb], dtype=np.float64)
    n, d = x.shape
    # replicate the operator's exact covariance + deterministic power iteration
    p9 = np.floor(x[:, :, None] * x[:, None, :] * 1e9 + 0.5).sum(axis=0)
    s9 = np.floor(x * 1e9 + 0.5).sum(axis=0)
    cov = np.round((p9 / 1e9 - np.outer(s9, s9) / 1e18 / n) / n, 9)
    cov = np.triu(cov) + np.triu(cov, 1).T  # operator mirrors the upper triangle
    w = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(64):
        w = cov @ w
        w /= np.linalg.norm(w)
    if w[int(np.argmax(np.abs(w)))] < 0:
        w = -w
    # the converged direction is the true top eigenvector
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    assert abs(float(np.dot(w, top))) >= 0.999
    mu = np.round(x.mean(axis=0), 9)
    scores = np.round((x - mu) @ w, 6)
    want = {int(i): s for i, s in zip(ids, scores)}
    for r in out:
        assert abs(r["score_pc1"] - want[r["vec_id"]]) <= 2e-6
    # and the 20 rows really are the global top |score|
    kth = sorted((abs(s) for s in want.values()), reverse=True)[19]
    assert all(abs(r["score_pc1"]) >= kth - 2e-6 for r in out)


# -------------------------------------------------- round-11 batch 3 ops


def test_sax_symbols_invariants(spark, sf_dir):
    import math

    reg = load_all()
    rows = reg["agg_sax_symbols"].fn(spark, sf_dir).collect()
    assert rows
    breaks = (-0.6745, 0.0, 0.6745)
    by_type: dict = {}
    for r in rows:
        # paa is the exact milli-quantized mean
        assert abs(r["paa"] * 1000 - round(r["paa"] * 1000)) < 1e-9
        sym = "a" if r["z"] < breaks[0] else "b" if r["z"] < breaks[1] else "c" if r["z"] < breaks[2] else "d"
        # z is floor-shifted to 6dp AFTER the CASE uses full precision, so
        # only exact-boundary rounding could disagree — allow the knife-edge
        if not any(abs(r["z"] - b) < 1e-6 for b in breaks):
            assert r["symbol"] == sym
        by_type.setdefault(r["event_type"], []).append((r["paa"], r["z"]))
    # z must be a strictly increasing function of paa within each tag
    for vals in by_type.values():
        vals.sort()
        zs = [z for _, z in vals]
        assert all(z2 >= z1 for z1, z2 in zip(zs, zs[1:]))
        # and roughly centered: mean of z near 0 (exact up to milli-quantization)
        assert abs(sum(zs) / len(zs)) < 0.01
    # pandas cross-check: paa within milli-rounding of the float mean
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").toPandas()
    ev["bucket"] = ev["ts"].dt.floor("h")
    want = ev.groupby(["event_type", "bucket"])["value"].mean()
    for r in rows:
        m = want.loc[(r["event_type"], pd.Timestamp(r["bucket"]))]
        assert abs(r["paa"] - m) <= 5.01e-4 + 1e-8


def test_tokenizer_fertility_matches_pure_python(spark, sf_dir):
    import math
    import re

    reg = load_all()
    out = {
        (r["lang"], r["source"]): r
        for r in reg["ext_tokenizer_fertility"].fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("lang", "source", "text").collect()
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")
    agg: dict = {}
    for r in docs:
        k = (r["lang"], r["source"])
        d = agg.setdefault(k, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(r["text"].split(" "))
        d[2] += len(pat.findall(r["text"]))
        d[3] += len(r["text"].encode("utf-8"))
    assert set(out) == set(agg)
    for k, (nd, nw, nt, nb) in agg.items():
        r = out[k]
        assert (r["n_docs"], r["n_words"], r["n_subtokens"], r["n_bytes"]) == (nd, nw, nt, nb)
        assert r["fertility"] == math.floor(nt / nw * 1e6 + 0.5) / 1e6
        assert r["bytes_per_token"] == math.floor(nb / nt * 1e6 + 0.5) / 1e6


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pyspark.sql import functions as F

    reg = load_all()
    salted = {
        (r["c_mktsegment"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in reg["join_skew_salted"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = {
        (r["c_mktsegment"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in (
            ev.join(cust, ev.user_id == cust.c_custkey)
            .groupBy("c_mktsegment", "event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.expr(
                    "CAST(round(SUM(CAST(value AS DECIMAL(30,8))), 2) * 100 AS BIGINT)"
                ).alias("value_cents"),
            )
            .collect()
        )
    }
    assert salted == plain


def test_retrieval_eval_matches_pure_python(spark, sf_dir):
    import math

    import numpy as np

    reg = load_all()
    out = {r["qid"]: r for r in reg["ext_eval_retrieval"].fn(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding").collect()
    ids = [r["vec_id"] for r in emb]
    labels = {r["vec_id"]: r["label"] for r in emb}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    n2 = {i: int(np.floor(vecs[i] * vecs[i] * 1e9 + 0.5).sum()) for i in ids}
    k = 10
    w = [round(1e9 / math.log2(i + 1)) for i in range(1, k + 1)]
    p = [sum(w[: j + 1]) for j in range(k)]
    assert set(out) == set(range(8))
    for qid in range(8):
        cand = []
        for i in ids:
            if i == qid:
                continue
            dot = int(np.floor(vecs[i] * vecs[qid] * 1e9 + 0.5).sum())
            cos = dot / (math.sqrt(n2[qid]) * math.sqrt(n2[i]))
            cand.append((-cos, i))
        cand.sort()
        top = [(i, labels[i] == labels[qid]) for _, i in cand[:k]]
        n_rel = sum(1 for i in ids if i != qid and labels[i] == labels[qid])
        first = next((rk for rk, (_, rel) in enumerate(top, 1) if rel), 0)
        dcg = sum(w[rk - 1] for rk, (_, rel) in enumerate(top, 1) if rel)
        ndcg = math.floor(dcg / p[min(n_rel, k) - 1] * 1e6 + 0.5) / 1e6
        rr = 0.0 if first == 0 else math.floor(1e6 / first + 0.5) / 1e6
        r = out[qid]
        assert (r["n_rel"], r["first_rel_rank"], r["dcg_e9"]) == (n_rel, first, dcg)
        assert r["ndcg"] == ndcg and r["rr"] == rr


# -------------------------------------------------- round-11 batch 4 ops


def test_ols_trend_matches_numpy(spark, sf_dir):
    import math

    import numpy as np

    reg = load_all()
    out = {r["event_type"]: r for r in reg["agg_ols_trend"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").toPandas()
    base = 473352
    for tag, grp in ev.groupby("event_type"):
        x = (grp["ts"].astype("int64") // 10**9 // 3600 - base).to_numpy(dtype=np.float64)
        y = np.floor(grp["value"].to_numpy(dtype=np.float64) * 1000 + 0.5)
        n = len(x)
        mx, my = x.sum() / n, y.sum() / n
        covxy = (x * y).sum() / n - mx * my
        covxx = (x * x).sum() / n - mx * mx
        covyy = (y * y).sum() / n - my * my
        slope = covxy / covxx / 1000
        intercept = (my - covxy / covxx * mx) / 1000
        r2 = covxy * covxy / max(covxx * covyy, 1e-12)
        r = out[tag]
        assert r["n"] == n
        assert abs(r["slope_per_hr"] - math.floor(slope * 1e6 + 0.5) / 1e6) <= 2e-6
        assert abs(r["intercept"] - math.floor(intercept * 1e6 + 0.5) / 1e6) <= 2e-6
        assert abs(r["r2"] - math.floor(r2 * 1e6 + 0.5) / 1e6) <= 2e-6
        assert 0.0 <= r["r2"] <= 1.0


def test_cluster_assign_kappa_matches_sklearn_free_python(spark, sf_dir):
    import numpy as np

    reg = load_all()
    rows = reg["ext_eval_cluster_assign"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding").collect()
    labels = sorted({r["label"] for r in emb})
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb}
    true = {r["vec_id"]: r["label"] for r in emb}
    cents = {
        l: np.round(
            np.mean([vecs[i] for i in vecs if true[i] == l], axis=0), 6
        )
        for l in labels
    }
    assigned = {}
    for i, v in vecs.items():
        best = min(
            labels,
            key=lambda l: (int(np.floor((v - cents[l]) ** 2 * 1e9 + 0.5).sum()), l),
        )
        assigned[i] = best
    from collections import Counter

    cm = Counter((true[i], assigned[i]) for i in vecs)
    n = len(vecs)
    correct = sum(c for (t, a), c in cm.items() if t == a)
    rt = Counter(true.values())
    ct = Counter(assigned.values())
    chance = sum(rt[l] * ct.get(l, 0) for l in labels)
    import math

    acc = math.floor(correct / n * 1e6 + 0.5) / 1e6
    kappa = math.floor((n * correct - chance) / (n * n - chance) * 1e6 + 0.5) / 1e6
    got = {(r["true_label"], r["assigned"]): r["n"] for r in rows}
    assert got == dict(cm)
    for r in rows:
        assert (r["n_total"], r["n_correct"]) == (n, correct)
        assert r["accuracy"] == acc and r["kappa"] == kappa
        assert -1.0 <= r["kappa"] <= 1.0
