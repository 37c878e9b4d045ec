"""MinHash-LSH quality: band-bucket candidate generation must recall the
high-similarity pairs that exact Jaccard finds (the fixture contains a
known near-dup pair at jaccard ≈ 0.97 at sf0.01).  16 hashes / 4 bands
⇒ P(candidate) = 1−(1−s⁴)⁴ ≈ 0.98 at s=0.8 — high-s pairs must appear."""

from pyspark.sql import functions as F

from gordo_components_spark.registry import load_all


def test_minhash_recalls_high_jaccard_pairs(spark):
    sf_dir = "/root/testdata/sf0.01"  # this SF contains a 0.97-jaccard pair
    reg = load_all()
    exact = reg["ext_dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas()
    high = exact[exact["jaccard"] >= 0.8]
    assert len(high) >= 1, "fixture should contain at least one near-dup pair"

    cand = reg["ext_dedup_minhash"].fn(spark, sf_dir).toPandas()
    cand_pairs = set(zip(cand["doc_a"], cand["doc_b"]))
    for _, row in high.iterrows():
        assert (row["doc_a"], row["doc_b"]) in cand_pairs, (
            f"LSH missed high-similarity pair {row['doc_a']}-{row['doc_b']} "
            f"(jaccard={row['jaccard']})"
        )
    # and the candidates' verified jaccard agrees with the exact computation
    merged = cand.merge(exact, on=["doc_a", "doc_b"], suffixes=("_lsh", "_exact"))
    if len(merged):
        assert (abs(merged["jaccard_lsh"] - merged["jaccard_exact"]) < 1e-9).all()


def test_rplsh_recall_vs_exact_topk(spark):
    """Random-hyperplane LSH must recall ≥0.9 of the exact cosine top-10.
    Per-neighbor recall with K=4 bits / L=16 tables + Hamming-1
    multi-probe at the fixture's weak-neighbor cosines (~0.3, p≈0.6):
    per-table p⁴+4p³(1−p) ≈ 0.47, over 16 tables 1−(1−0.47)¹⁶ ≈ 1.0 —
    the 0.9 gate leaves headroom for the hyperplane draw."""
    sf_dir = "/root/testdata/sf0.01"
    reg = load_all()
    exact = {r["vec_id"] for r in reg["ext_cosine_topk"].fn(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in reg["ext_ann_rplsh"].fn(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"RP-LSH recall@10 = {recall}"
    # scores of recalled ids must match the exact computation bit-for-bit
    ex = {r["vec_id"]: r["cosine"] for r in reg["ext_cosine_topk"].fn(spark, sf_dir).collect()}
    ap = {r["vec_id"]: r["cosine"] for r in reg["ext_ann_rplsh"].fn(spark, sf_dir).collect()}
    for vid in exact & approx:
        assert ex[vid] == ap[vid]
