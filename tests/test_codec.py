"""M0 codec tests — SURVEY.md §5.1 / FIXTURES.md §4.

decode∘encode == id for varint and FOR on arbitrary uint64 gap arrays;
delta∘undelta == id; block boundary lengths {0,1,127,128,129,1000}.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from parser_indexer_spark import codec

LENGTHS = [0, 1, 127, 128, 129, 1000]


def _rand(n, hi, seed):
    return np.random.default_rng(seed).integers(0, hi, size=n, dtype=np.uint64)


@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("hi", [2, 2**7, 2**20, 2**63])
def test_varint_roundtrip_lengths(n, hi):
    vals = _rand(n, hi, seed=n * 7 + hi % 97)
    out = codec.varint_decode(codec.varint_encode(vals))
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("hi", [2, 2**7, 2**20, 2**63])
def test_for_roundtrip_lengths(n, hi):
    vals = _rand(n, hi, seed=n * 13 + hi % 89)
    out = codec.for_decode(codec.for_encode(vals), n)
    np.testing.assert_array_equal(out, vals)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(codec.varint_decode(codec.varint_encode(vals)), vals)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_for_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    np.testing.assert_array_equal(codec.for_decode(codec.for_encode(vals), len(xs)), vals)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_property(xs):
    doc_ids = np.sort(np.array(xs, dtype=np.int64))
    base = int(doc_ids[0])
    gaps = codec.delta_encode(doc_ids, base)
    assert gaps[0] == 0
    np.testing.assert_array_equal(codec.delta_decode(gaps, base), doc_ids)


def test_delta_then_for_full_block():
    doc_ids = np.cumsum(_rand(128, 1000, seed=3).astype(np.int64) + 1) + 10_000_000
    base = int(doc_ids[0])
    buf = codec.for_encode(codec.delta_encode(doc_ids, base))
    np.testing.assert_array_equal(codec.delta_decode(codec.decode(buf, 128), base), doc_ids)


def test_delta_rejects_non_increasing():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([5, 5], dtype=np.int64), 5)
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([5, 4], dtype=np.int64), 5)


def test_generic_decode_dispatch():
    vals = _rand(129, 2**30, seed=9)
    assert codec.decode(codec.varint_encode(vals), 129).tolist() == vals.tolist()
    assert codec.decode(codec.for_encode(vals), 129).tolist() == vals.tolist()
    with pytest.raises(ValueError):
        codec.decode(b"Xjunk", 1)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=500),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=200, deadline=None)
def test_for_encode_blocks_equals_per_block(xs, nblocks):
    """Batch multi-block FOR encoder is wire-identical to per-block
    for_encode at arbitrary block boundaries."""
    vals = np.array(xs, dtype=np.uint64)
    cuts = np.unique(np.linspace(0, len(xs), nblocks + 1).astype(np.int64))
    bstarts, bends = cuts[:-1], cuts[1:]
    keep = bends > bstarts
    bstarts, bends = bstarts[keep], bends[keep]
    got = codec.for_encode_blocks(vals, bstarts, bends)
    exp = [codec.for_encode(vals[s:e]) for s, e in zip(bstarts, bends)]
    assert got == exp
    for buf, s, e in zip(got, bstarts, bends):
        np.testing.assert_array_equal(codec.for_decode(buf, int(e - s)),
                                      vals[s:e])


def test_bit_widths():
    vals = np.array([0, 1, 2, 3, 127, 128, 2**40, 2**63 - 1], dtype=np.uint64)
    exp = [max(1, int(v).bit_length()) for v in vals]
    assert codec._bit_widths(vals).tolist() == exp


def test_varint_truncated_raises():
    vals = np.array([300], dtype=np.uint64)
    buf = codec.varint_encode(vals)
    with pytest.raises(ValueError):
        codec.varint_decode(buf[:-1])


@given(st.lists(st.integers(min_value=0, max_value=2**50 - 1),
                min_size=1, max_size=400),
       st.integers(min_value=1, max_value=9),
       st.sampled_from(["for", "varint", "mixed"]))
@settings(max_examples=200, deadline=None)
def test_decode_blocks_equals_per_block(xs, nblocks, codecs):
    """Batched multi-block decode == per-block decode() for FOR, varint,
    and mixed-codec batches at arbitrary block boundaries."""
    vals = np.array(xs, dtype=np.uint64)
    cuts = np.unique(np.linspace(0, len(xs), nblocks + 1).astype(np.int64))
    bstarts, bends = cuts[:-1], cuts[1:]
    keep = bends > bstarts
    bstarts, bends = bstarts[keep], bends[keep]
    bufs = []
    for i, (s, e) in enumerate(zip(bstarts, bends)):
        use_for = codecs == "for" or (codecs == "mixed" and i % 2 == 0)
        bufs.append(codec.for_encode(vals[s:e]) if use_for
                    else codec.varint_encode(vals[s:e]))
    ns = (bends - bstarts).astype(np.int64)
    got = codec.decode_blocks(bufs, ns)
    exp = np.concatenate([codec.decode(b, int(n))
                          for b, n in zip(bufs, ns)])
    np.testing.assert_array_equal(got, exp)


@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**40),
                         min_size=1, max_size=50),
                min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_delta_decode_blocks_equals_per_block(runs):
    """Segmented delta decode == per-block delta_decode over ascending
    doc runs whose first gap is 0 (the build contract)."""
    blocks = []
    base = 0
    for r in runs:
        docs = np.cumsum(np.array(r, dtype=np.int64) + 1) + base
        blocks.append(docs)
        base = int(docs[-1]) + 1
    gaps, firsts, ns = [], [], []
    for docs in blocks:
        g = np.diff(docs, prepend=docs[0])
        g[0] = 0
        gaps.append(g.astype(np.uint64))
        firsts.append(int(docs[0]))
        ns.append(len(docs))
    got = codec.delta_decode_blocks(
        np.concatenate(gaps), np.array(ns, dtype=np.int64),
        np.array(firsts, dtype=np.int64))
    exp = np.concatenate([codec.delta_decode(g, f)
                          for g, f in zip(gaps, firsts)])
    np.testing.assert_array_equal(got, exp)
