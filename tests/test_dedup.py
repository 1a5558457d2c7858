"""MinHash-LSH near-dup dedup tests (VERDICT r1 #1): planted duplicates are
found with exact Jaccard values; unrelated docs produce no pairs; the
banding math is deterministic (md5) so there is no flake."""

import itertools

import pytest

from parser_indexer_spark.relops import near_dup_pairs


def _shingles(text, k=3):
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()).split() if t]
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _jaccard(a, b):
    return len(a & b) / len(a | b)


BASE = ("spark join filter window merge sort hash agg shuffle partition "
        "broadcast index query scan table column row group order limit")
DOCS = [
    (0, BASE),
    (1, BASE),                                  # exact dup of 0 (J = 1.0)
    (2, BASE.replace("hash", "minhash")),       # near dup of 0/1
    (3, BASE.replace("spark", "flink").replace("limit", "offset")),  # near
    (4, "completely different text about training data pipelines and "
        "quality scoring with language id and token counting at scale"),
    (5, "the quick brown fox jumps over the lazy dog again and again "
        "and again with more words to pass the shingle minimum"),
]


@pytest.fixture(scope="module")
def pairs(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = near_dup_pairs(d, threshold=0.5).collect()
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}


def test_planted_duplicates_found(pairs):
    sh = {i: _shingles(t) for i, t in DOCS}
    truth = {(a, b): round(_jaccard(sh[a], sh[b]), 4)
             for a, b in itertools.combinations(sorted(sh), 2)
             if _jaccard(sh[a], sh[b]) >= 0.5}
    # precision: every emitted pair is a true near-dup with its EXACT
    # verified Jaccard (the verification stage is not approximate)
    for p, j in pairs.items():
        assert truth[p] == j
    # recall: the exact dup (all bands collide at J=1) and the high-J
    # mutations (J >= 0.71 here) must be found at r=2,b=4
    for p in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]:
        assert p in pairs, f"missed planted near-dup {p}"
    assert pairs[(0, 1)] == 1.0


def test_more_bands_improve_boundary_recall(spark):
    """(2,3) sits at J=0.5652 — below the r=2,b=4 S-curve knee, found once
    the band count doubles (1-(1-J^2)^8 ≈ 0.95). Deterministic md5 makes
    both outcomes reproducible, which is what this pins down."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    loose = {(r["doc_a"], r["doc_b"]) for r in
             near_dup_pairs(d, n_hashes=16, n_bands=8, threshold=0.5).collect()}
    assert (2, 3) in loose


def test_no_false_pairs_across_unrelated(pairs):
    for (a, b) in pairs:
        assert not ((a in (4, 5)) ^ (b in (4, 5))), \
            f"unrelated doc paired: {(a, b)}"


def test_threshold_is_respected(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    strict = near_dup_pairs(d, threshold=0.95).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in strict}
    assert got == {(0, 1)}  # only the exact duplicate survives 0.95


def test_bucket_cap_bounds_adversarial_candidates(spark):
    """VERDICT r2 #2: a degenerate bucket (1k identical docs) is dropped
    by the max_bucket cap — candidate generation stays bounded instead of
    going quadratic — while genuinely-similar pairs in small buckets are
    still found, and the dropped buckets are observable via the audit."""
    from parser_indexer_spark.relops import (lsh_oversized_buckets,
                                             simhash_band_candidates)

    clones = [(i, BASE) for i in range(1000)]          # one hot bucket
    planted = [(2000, "alpha beta gamma delta epsilon zeta eta theta iota "
                      "kappa lambda mu nu xi omicron pi rho sigma tau"),
               (2001, "alpha beta gamma delta epsilon zeta eta theta iota "
                      "kappa lambda mu nu xi omicron pi rho sigma upsilon")]
    d = spark.createDataFrame(clones + planted, "doc_id long, text string")

    got = near_dup_pairs(d, threshold=0.5, max_bucket=100).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    # the 1000-clone bucket would emit ~500k pairs uncapped; capped => none
    assert pairs == {(2000, 2001)}

    audit = lsh_oversized_buckets(d, max_bucket=100).collect()
    assert len(audit) == 4                      # all 4 bands of the clones
    assert all(r["size"] == 1000 for r in audit)

    # uncapped control on a small clone set: cap leaves small buckets alone
    small = [(i, BASE) for i in range(5)] + planted
    ds = spark.createDataFrame(small, "doc_id long, text string")
    capped = {(r["doc_a"], r["doc_b"])
              for r in near_dup_pairs(ds, max_bucket=100).collect()}
    uncapped = {(r["doc_a"], r["doc_b"])
                for r in near_dup_pairs(ds, max_bucket=10 ** 9).collect()}
    assert capped == uncapped

    # simhash band candidates: same cap semantics — the 1000-clone band
    # buckets are dropped, while an exact duplicate pair in a 2-member
    # bucket survives (identical docs => identical bands, size-2 bucket)
    twins = [(3000, planted[0][1]), (3001, planted[0][1])]
    d2 = spark.createDataFrame(clones + twins, "doc_id long, text string")
    sb = {(r["doc_a"], r["doc_b"])
          for r in simhash_band_candidates(d2, max_bucket=100).collect()}
    assert sb == {(3000, 3001)}
