"""Tombstone (delete) bookkeeping [public: Lucene liveDocs; Solr
deleteById / delete-by-query].

The engine is append-only at the segment level; deletes are a SMALL sorted
doc_id set written as its own parquet generation under <root>/deletes/ and
referenced from the manifest (``{"deletes": {"gen": N, "n": count}}`` —
manifest written last = atomic commit). Queries subtract the set pre-heap
(scorer mask, impact-sidecar mask, θ-seed mask); merge/compaction purges
tombstoned postings and doc-store rows physically and drops the purged ids
from the set. Corpus stats (df, n_docs, avg_dl) keep their build-time
values until a purge — the Lucene semantics: surviving docs' scores do not
move when a neighbor is deleted, and the rebuilt-equivalent scores appear
after the merge.

The set is bounded by search.FILTER_BROADCAST_LIMIT so it always fits a
driver read + one broadcast; delete_docs refuses beyond the bound and
points at compaction. At 100 TB that bound is per-index-handle memory, not
a data-scale limit: a pipeline deleting more rows than that per compaction
cycle is doing a rebuild, not a delete.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
import pandas as pd


def deletes_path(root: str, gen: int) -> str:
    return os.path.join(root, "deletes", f"gen={gen}")


def read_tombstones(root: str, gen: int) -> Optional[np.ndarray]:
    """Driver-side read of a tombstone generation (sorted int64 array, or
    None when empty). Plain pandas/pyarrow — no Spark job for a table
    bounded at FILTER_BROADCAST_LIMIT rows."""
    files = sorted(glob.glob(os.path.join(deletes_path(root, gen),
                                          "*.parquet")))
    if not files:
        return None
    arrs = [pd.read_parquet(f, columns=["doc_id"])["doc_id"]
            .to_numpy(dtype=np.int64) for f in files]
    out = np.sort(np.concatenate(arrs)) if arrs else None
    return out if out is not None and out.size else None


def live_mask(d: np.ndarray, ts: Optional[np.ndarray]) -> Optional[np.ndarray]:
    """Boolean mask selecting the entries of ``d`` NOT in the sorted
    tombstone array ``ts``; None when there are no tombstones (callers
    skip the masking entirely)."""
    if ts is None or ts.size == 0:
        return None
    pos = np.searchsorted(ts, d)
    pos_c = np.minimum(pos, ts.size - 1)
    return ts[pos_c] != d
