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
