"""Posting-block codecs: delta (gap) encoding + FOR bit-packing + LEB128
varint — all vectorized numpy, zero per-integer Python loops
(BASELINE.json:15 "no per-row Python"; SURVEY.md §2 C4-C5, §7 hard-part 4).

Design point (public): Lucene's Lucene50/90 PostingsFormat packs 128-posting
blocks with PackedInts FOR (frame-of-reference bit-packing) and a vint tail;
the classic alternative is PForDelta (Zukowski et al. 2006; Lemire & Boytsov
2015).  v1 here implements exact-width FOR per block (no patch exceptions —
with <=128-entry blocks the patch win is small) plus a varint codec kept for
format evolution; the codec id is the first byte of every payload so formats
can coexist shard-by-shard.

Wire format of an encoded array (bytes):
    [0] codec id: b'F' (FOR) | b'V' (varint)
    FOR:    [1] bit width w (1..64), then ceil(n*w/8) bytes of
            np.packbits(little-endian-per-value bit matrix) — n is stored
            externally (the block's num_docs column).
    varint: LEB128 stream, 7 bits per byte, continuation bit 0x80.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_VARINT_THRESH = (np.uint64(1) << (np.arange(1, 10, dtype=np.uint64) * np.uint64(7)))
_SHIFTS10 = np.arange(10, dtype=np.uint64) * np.uint64(7)


# ---------------------------------------------------------------- varint ---

def varint_encode_stream(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; returns (raw stream WITHOUT codec tag,
    per-value byte counts). The byte counts let a caller slice the stream
    into sub-ranges (e.g. per posting block) without re-encoding — the
    whole-batch fast path of the block builder."""
    v = np.ascontiguousarray(vals, dtype=_U64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = 1 + (v[:, None] >= _VARINT_THRESH[None, :]).sum(axis=1)
    mat = ((v[:, None] >> _SHIFTS10[None, :]) & _U64(0x7F)).astype(np.uint8)
    pos = np.arange(10)[None, :]
    mat |= (pos < (nbytes[:, None] - 1)).astype(np.uint8) << 7
    out = mat[pos < nbytes[:, None]]
    return out.tobytes(), nbytes.astype(np.int64)


def varint_slices(vals: np.ndarray, starts: np.ndarray) -> list:
    """LEB128-encode ``vals`` once and slice the stream at the value
    boundaries ``starts`` (ascending, starts[0] == 0): returns one RAW
    (untagged) byte string per segment [starts[i], starts[i+1]).

    Because LEB128 streams are self-delimiting, the raw slices concatenate
    back into a valid stream — the binary positional payload rides the
    build shuffle as ONE bytes value per posting and the block builder
    just joins slices, no array<int> Arrow conversion and no re-encode
    (VERDICT r3 #2: positional build cost)."""
    stream, nb = varint_encode_stream(vals)
    if vals.size == 0:
        return []
    off = np.concatenate(([0], np.cumsum(nb)))
    b_lo = off[starts]
    b_hi = np.append(off[starts[1:]], off[-1])
    mv = memoryview(stream)
    return [mv[s:e].tobytes() for s, e in zip(b_lo.tolist(), b_hi.tolist())]


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: byte-width by 9 threshold
    comparisons, a (n,10) byte matrix, then a mask flatten."""
    stream, _ = varint_encode_stream(vals)
    return b"V" + stream


def varint_decode(buf: bytes) -> np.ndarray:
    if buf[:1] != b"V":
        raise ValueError(f"not a varint payload: {buf[:1]!r}")
    b = np.frombuffer(buf, dtype=np.uint8, offset=1)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    term = (b & 0x80) == 0
    if not term[-1]:
        raise ValueError("truncated varint stream")
    ends = np.flatnonzero(term)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(b.size)
    gid = np.searchsorted(ends, idx)
    off = (idx - starts[gid]).astype(_U64)
    contrib = (b & 0x7F).astype(_U64) << (off * _U64(7))
    return np.add.reduceat(contrib, starts).astype(_U64)


# ------------------------------------------------------------------- FOR ---

def for_encode(vals: np.ndarray) -> bytes:
    """Frame-of-reference bit-pack a uint64 array at the exact max bit width.
    n is NOT stored (caller persists it as the block's num_docs)."""
    v = np.ascontiguousarray(vals, dtype=_U64)
    if v.size == 0:
        return b"F\x01"
    mx = int(v.max())
    width = max(1, mx.bit_length())
    shifts = np.arange(width, dtype=_U64)
    # little-endian bit order within each value; packbits big-endian over the
    # flattened stream — symmetric with unpackbits below, so it round-trips.
    bits = ((v[:, None] >> shifts[None, :]) & _U64(1)).astype(np.uint8)
    return b"F" + bytes([width]) + np.packbits(bits.ravel()).tobytes()


def _bit_widths(maxes: np.ndarray) -> np.ndarray:
    """Vectorized bit_length (min 1) of a uint64 array — binary reduction,
    6 masked shifts, no per-element Python."""
    v = np.ascontiguousarray(maxes, dtype=_U64).copy()
    w = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (_U64(1) << _U64(shift))
        w[m] += shift
        v[m] >>= _U64(shift)
    return np.maximum(w + (v > 0), 1)


def for_encode_blocks(vals: np.ndarray, bstarts: np.ndarray,
                      bends: np.ndarray) -> list[bytes]:
    """FOR bit-pack MANY blocks of one flat uint64 array in one shot;
    returns per-block payloads wire-identical to ``for_encode`` (b'F' +
    width byte + packbits stream). This is the build hot path: one bit
    scatter per distinct width (<=64 vectorized passes, typically ~3) and a
    single packbits over the whole batch, then byte slicing per block —
    the FOR analogue of varint_encode_stream's encode-once-slice-many."""
    v = np.ascontiguousarray(vals, dtype=_U64)
    nblk = int(bstarts.size)
    if nblk == 0:
        return []
    bstarts = np.ascontiguousarray(bstarts, dtype=np.int64)
    bends_a = np.ascontiguousarray(bends, dtype=np.int64)
    # contiguity contract (ADVICE r2): blocks must be non-empty, adjacent,
    # and cover vals exactly — np.maximum.reduceat segments run
    # start-to-start, so a gap/overlap/empty block would silently produce
    # wrong widths and payloads. Cheap O(nblk) check, always on.
    lens = bends_a - bstarts
    if (lens <= 0).any() or bstarts[0] != 0 or bends_a[-1] != v.size \
            or (nblk > 1 and (bends_a[:-1] != bstarts[1:]).any()):
        raise ValueError("for_encode_blocks: blocks must be contiguous, "
                         "non-empty, and cover vals exactly")
    widths = _bit_widths(np.maximum.reduceat(v, bstarts))
    blk_bytes = (lens * widths + 7) // 8  # blocks start byte-aligned
    byte_off = np.concatenate(([0], np.cumsum(blk_bytes)))
    bitbuf = np.zeros(int(byte_off[-1]) * 8, dtype=np.uint8)
    blk_of = np.repeat(np.arange(nblk), lens)
    within = np.arange(v.size, dtype=np.int64) - np.repeat(bstarts, lens)
    val_off = byte_off[blk_of] * 8 + within * widths[blk_of]
    for w in np.unique(widths):
        sel = widths[blk_of] == w
        vv, off = v[sel], val_off[sel]
        shifts = np.arange(w, dtype=_U64)
        bits = ((vv[:, None] >> shifts[None, :]) & _U64(1)).astype(np.uint8)
        pos = off[:, None] + np.arange(w, dtype=np.int64)[None, :]
        bitbuf[pos.ravel()] = bits.ravel()
    mv = memoryview(np.packbits(bitbuf).tobytes())
    off_l = byte_off.tolist()
    return [b"F" + bytes([int(widths[i])]) + mv[off_l[i]:off_l[i + 1]].tobytes()
            for i in range(nblk)]


def for_decode(buf: bytes, n: int) -> np.ndarray:
    if buf[:1] != b"F":
        raise ValueError(f"not a FOR payload: {buf[:1]!r}")
    if n == 0:
        return np.empty(0, dtype=_U64)
    width = buf[1]
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=2),
                         count=n * width).reshape(n, width)
    # uint8 @ uint64 weights: one C pass with an int accumulator — no
    # (n, width) uint64 temporary, ~2x less CPU and far less memory
    # traffic than astype + shift + sum (measured on a df=3M term)
    return bits @ (_U64(1) << np.arange(width, dtype=_U64))


def decode_blocks(bufs, ns) -> np.ndarray:
    """Decode many tagged payloads (mixed codecs allowed) into ONE flat
    uint64 array in block order, writing straight into a preallocated
    output — no per-block allocations, astype()s, or list/concatenate
    churn around the inner decode. FOR blocks keep the CONTIGUOUS
    per-block reshape+matmul (measured faster and far more
    memory-stable than a width-grouped gather over a joined bit buffer);
    varint blocks strip tags, join (LEB128 streams are self-delimiting)
    and decode in one pass.

    ``bufs``: sequence of tagged byte strings; ``ns``: per-block value
    counts (the blocks' num_docs column)."""
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    nblk = len(bufs)
    if nblk == 0 or ns.sum() == 0:
        return np.empty(0, dtype=_U64)
    ends = np.cumsum(ns)
    starts = ends - ns
    out = np.empty(int(ends[-1]), dtype=_U64)
    v_idx = []
    for i in range(nblk):
        buf = bufs[i]
        tag = buf[0]
        if tag == 70:                                   # b'F'
            n = int(ns[i])
            if n:
                width = buf[1]
                bits = np.unpackbits(
                    np.frombuffer(buf, dtype=np.uint8, offset=2),
                    count=n * width).reshape(n, width)
                out[starts[i]:ends[i]] = \
                    bits @ (_U64(1) << np.arange(width, dtype=_U64))
        elif tag == 86:                                 # b'V'
            v_idx.append(i)
        else:
            raise ValueError(f"unknown codec id {buf[:1]!r}")
    if v_idx:
        stream = b"V" + b"".join(bufs[i][1:] for i in v_idx)
        vals = varint_decode(stream)
        if vals.size != int(ns[v_idx].sum()):
            raise ValueError("varint batch decoded wrong value count")
        voff = np.concatenate(([0], np.cumsum(ns[v_idx])))
        for j, i in enumerate(v_idx):
            out[starts[i]:ends[i]] = vals[voff[j]:voff[j + 1]]
    return out


def delta_decode_blocks(gaps: np.ndarray, ns: np.ndarray,
                        firsts: np.ndarray) -> np.ndarray:
    """Segmented delta_decode: ``gaps`` is the flat gap array of many
    blocks (each block's first gap is 0 per the build contract), ``ns``
    the per-block counts, ``firsts`` the blocks' first_doc_id bases.
    One cumsum + one subtraction instead of a per-block Python loop."""
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    g = gaps.astype(np.int64, copy=False)
    if g.size == 0:
        return np.empty(0, dtype=np.int64)
    c = np.cumsum(g)
    starts = np.concatenate(([0], np.cumsum(ns)))[:-1]
    base = np.asarray(firsts, dtype=np.int64) - c[starts]
    return c + np.repeat(base, ns)


# --------------------------------------------------------------- generic ---

def decode(buf: bytes, n: int) -> np.ndarray:
    tag = buf[:1]
    if tag == b"F":
        return for_decode(buf, n)
    if tag == b"V":
        out = varint_decode(buf)
        if out.size != n:
            raise ValueError(f"varint payload has {out.size} values, expected {n}")
        return out
    raise ValueError(f"unknown codec id {tag!r}")


# ----------------------------------------------------------------- delta ---

def delta_encode(doc_ids: np.ndarray, base: int) -> np.ndarray:
    """Gaps of a strictly-increasing doc_id run, relative to ``base`` (the
    block's first_doc_id => gaps[0] == 0). SURVEY.md §2 C4."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.diff(d, prepend=np.int64(base))
    if gaps.size and gaps[1:].min(initial=1) <= 0:
        raise ValueError("doc_ids not strictly increasing")
    return gaps.astype(_U64)


def delta_decode(gaps: np.ndarray, base: int) -> np.ndarray:
    """Inverse of delta_encode: doc_ids = base + cumsum(gaps)."""
    g = gaps.astype(np.int64, copy=False)
    return (np.cumsum(g) + np.int64(base)).astype(np.int64)
