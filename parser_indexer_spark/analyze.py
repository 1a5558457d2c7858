"""Analyzer (C1) + fused tokenize+tf stage (C2) — SURVEY.md §2.B2/C1-C2.

Frozen spec (FIXTURES.md §2, ANALYZER_VERSION nfkd-lower-lmn-v1):
    NFKD normalize -> lowercase -> tokens = maximal runs of [\\p{L}\\p{M}\\p{N}]
    (letters, marks, digits; underscore and punctuation split). No stopwords,
    no stemming. Empty token lists allowed (dl = 0, matches nothing).

Two implementations that MUST agree (tested in tests/test_analyze.py):
  * Arrow fast path — pyarrow compute kernels only (utf8_normalize NFKD,
    utf8_lower, split_pattern_regex): zero per-row Python, used inside the
    mapInPandas build stage and the pandas_udf surface (BASELINE.json:15).
    NOTE: pyarrow 16's utf8_normalize composes nothing (NFC/NFKC return
    decomposed output — verified in-sandbox), hence the NFKD freeze.
  * Python oracle path — unicodedata + per-char category scan; single-node
    test/oracle code only, never shipped into a Spark stage.

The reference analyzer analogue is Solr ``text_general`` (StandardTokenizer +
LowerCaseFilter) [public: Solr]; stopwords are deliberately dropped from the
engine spec so the DuckDB SQL oracle stays expressible (SURVEY.md §2 C1).
"""

from __future__ import annotations

import unicodedata
from typing import Iterator, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from parser_indexer_spark.codec import varint_slices
from parser_indexer_spark.config import TOKEN_SPLIT_REGEX


# ------------------------------------------------------------ Arrow path ---

def tokenize_arrow(texts: pa.Array) -> pa.ListArray:
    """string array -> list<string> of tokens (empty strings NOT yet removed;
    callers filter — split_pattern_regex emits '' at string boundaries)."""
    norm = pc.utf8_normalize(texts, form="NFKD")
    low = pc.utf8_lower(norm)
    return pc.split_pattern_regex(low, TOKEN_SPLIT_REGEX)


def tokenize_series(texts: pd.Series) -> pd.Series:
    """pandas Series[str] -> Series[list[str]] with empties removed and nulls
    -> []. Used by the `str_tokens` pandas_udf and small helpers."""
    arr = pa.array(texts, type=pa.string())
    toks = tokenize_arrow(arr)
    flat, _, counts = _flatten(toks)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets), flat)
    return pd.Series(la.to_pandas().to_numpy(), index=texts.index)


def _flatten(toks: pa.ListArray, stopwords: tuple = ()):
    """ListArray -> (flat token StringArray w/o empties, parent row indices
    int64 ndarray, per-row token counts int64 ndarray). Optional stopword
    removal (C1 analyzer option, Solr StopFilter analogue) stays on the
    Arrow kernel path: one is_in per batch."""
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lengths = pc.list_value_length(toks)
    lengths = pc.fill_null(lengths, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)  # drops null rows' contribution
    parents = np.repeat(np.arange(len(toks), dtype=np.int64), lengths)
    keep = pc.fill_null(pc.not_equal(flat, ""), False)
    if stopwords:
        keep = pc.and_(keep, pc.invert(
            pc.is_in(flat, value_set=pa.array(list(stopwords), pa.string()))))
    keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
    flat = flat.filter(keep)
    parents = parents[keep_np]
    counts = np.bincount(parents, minlength=len(toks)).astype(np.int64)
    return flat, parents, counts


def make_tokenize_tf(stopwords: tuple = (), positions: bool = True):
    """Factory for the fused C1+C2 mapInPandas stage with an optional
    per-index stopword list (persisted in the manifest; analyzer_version is
    bumped by EngineConfig when set).

    ``positions``: emit ``pos_gaps`` — per (doc, term) the token positions
    in the doc, gap-encoded within the posting (first value absolute, then
    strictly-positive deltas) and PACKED as one raw LEB128 byte string per
    posting (binary column, not array<int>: the list-of-ints Arrow
    conversion was a measured x1.48 build-CPU overhead, VERDICT r3 #2;
    LEB128 slices concatenate, so the block builder joins bytes instead of
    re-encoding). Positions index the POST-stopword-filter token stream
    (documented deviation from Lucene's position-increment gaps — with the
    default empty stop list the two coincide). Vectorized: one lexsort +
    boundary diff + one whole-batch varint encode, no per-row Python."""

    def tokenize_tf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            arr = pa.array(pdf["text"], type=pa.string())
            flat, parents, counts = _flatten(tokenize_arrow(arr), stopwords)
            n = len(flat)
            if n == 0:
                continue
            # token position within its doc: flat keeps doc-major token
            # order, so position = global index - the doc's first index
            row_starts = np.concatenate(
                ([0], np.cumsum(counts)[:-1])).astype(np.int64)
            pos = np.arange(n, dtype=np.int64) - row_starts[parents]
            codes, uniq_terms = pd.factorize(flat.to_pandas(), sort=False)
            order = np.lexsort((pos, codes, parents))
            p_s, c_s, pos_s = parents[order], codes[order], pos[order]
            cut = np.empty(n, dtype=bool)
            cut[0] = True
            cut[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
            starts = np.flatnonzero(cut)
            tf = np.diff(np.append(starts, n)).astype(np.int32)
            out = {
                "doc_id": doc_ids[p_s[starts]],
                "term": uniq_terms.to_numpy(dtype=object)[c_s[starts]],
                "tf": tf,
                "dl": counts[p_s[starts]].astype(np.int32),
            }
            if positions:
                gaps = pos_s.copy()
                gaps[1:] -= pos_s[:-1]
                gaps[starts] = pos_s[starts]  # first-of-posting = absolute
                out["pos_gaps"] = varint_slices(gaps.astype(np.uint64),
                                                starts)
            else:
                out["pos_gaps"] = [None] * starts.size
            yield pd.DataFrame(out)

    return tokenize_tf


# default stage (no stopwords) — the frozen v1 analyzer
# mapInPandas stage: (doc_id:int64, text:str) -> (doc_id, term, tf, dl).
# Fused C1+C2: tokenize, then collapse to per-(doc, term) tf BEFORE the
# term shuffle so the shuffle carries tf-rows, not token occurrences
# (SURVEY.md §2 C2). dl rides along on every tf row (int32) so query-time
# BM25 needs no norms join (SURVEY.md §2 C8 deviation: exact dl).
# Vectorized: Arrow kernels + pandas C groupby; no per-row Python.
tokenize_tf_batches = make_tokenize_tf()


TOKENIZE_TF_SCHEMA = ("doc_id long, term string, tf int, dl int, "
                      "pos_gaps binary")


# ----------------------------------------------------------- Python oracle ---

def tokenize_py(text: str, stopwords: tuple = ()) -> List[str]:
    """Single-node oracle tokenizer; must agree with tokenize_arrow exactly.
    Per-char category scan == runs of [\\p{L}\\p{M}\\p{N}]; optional
    stopword removal mirrors make_tokenize_tf's is_in filter."""
    if text is None:
        return []
    s = unicodedata.normalize("NFKD", text).lower()
    out: List[str] = []
    cur: List[str] = []
    for ch in s:
        if unicodedata.category(ch)[0] in ("L", "M", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    if stopwords:
        stop = set(stopwords)
        out = [t for t in out if t not in stop]
    return out
