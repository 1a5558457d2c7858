"""Dense global doc_id assignment (B7) — SURVEY.md §2.B7, §7 M2 + hard-part 2.

Reference analogue: parser-indexer's document identity is the file path/URL
string [upstream — UNVERIFIED]; delta-encoded postings need dense int64 ids
sorted by a stable total order, so the engine assigns
``doc_id = rank of (conv_id, turn_idx)``.

Spark's ``repartitionByRange`` is NOT usable here: its boundary sampling is
nondeterministic across jobs (verified in-sandbox — two runs of the same
plan produced different split keys), so a count pass and an assign pass can
disagree. Instead the engine computes boundaries itself, TeraSort-style but
deterministic (SURVEY.md §7 hard-part 2):

  1. sort key  skey = conv_id || '\\x01' || lpad(turn_idx, 10)   (JVM-side)
  2. sample    rows where crc32(skey) % inv == 0  — a pure function of the
               key, identical at any parallelism
  3. boundaries = evenly spaced order statistics of the sorted sample
  4. gid       = searchsorted(boundaries, skey)  — vectorized pandas_udf on
               the single skey column (numpy '<U' fixed-width compare, C loop)
  5. exact counts per gid -> prefix-sum offsets (G longs on the driver)
  6. repartition(G, gid) + sortWithinPartitions(skey)  — gid is monotone in
               skey, so a key sort groups gids contiguously
  7. mapInPandas: doc_id = offset[gid] + running position within gid.

Every step is a deterministic function of the input table alone, so doc_ids
are identical at local[8] and local[32] (tested, SURVEY.md §5.8). Scale: the
driver holds only the sample (bounded by ``target_sample``) and G offsets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

ORDER_COLS = ("conv_id", "turn_idx")
_SEP = "\x01"


def _skey_col():
    return F.concat(F.col("conv_id"), F.lit(_SEP),
                    F.lpad(F.col("turn_idx").cast("string"), 10, "0"))


def assign_doc_ids(df: DataFrame, partitions: int = 32,
                   target_sample: int = 100_000) -> DataFrame:
    """Input: transcripts-shaped DataFrame with unique (conv_id, turn_idx).
    Output: same columns + dense ``doc_id`` long starting at 0,
    order-isomorphic to the (conv_id, turn_idx) total order."""
    spark = df.sparkSession
    n = df.count()
    if n == 0:
        from pyspark.sql.types import LongType, StructField, StructType
        schema = StructType(list(df.schema.fields) + [StructField("doc_id", LongType(), False)])
        return spark.createDataFrame([], schema)

    keyed = df.withColumn("_skey", _skey_col())

    # deterministic hash sample of sort keys
    inv = max(1, n // target_sample)
    sample = [r[0] for r in keyed.select("_skey")
              .where(F.crc32(F.col("_skey")) % inv == 0).collect()]
    sample.sort()
    n_groups = max(1, min(partitions, len(sample)))
    if n_groups > 1:
        step = len(sample) / n_groups
        bounds = sorted({sample[int(step * i)] for i in range(1, n_groups)})
    else:
        bounds = []
    # numpy fixed-width unicode array -> C-level compares in searchsorted
    width = max((len(b) for b in bounds), default=1)
    bnd_arr = np.array(bounds, dtype=f"<U{width}") if bounds else np.empty(0, "<U1")

    @F.pandas_udf("int")
    def gid_of(skeys: pd.Series) -> pd.Series:
        if bnd_arr.size == 0:
            return pd.Series(np.zeros(len(skeys), dtype=np.int32), index=skeys.index)
        arr = skeys.to_numpy(dtype=f"<U{max(width, skeys.str.len().max() or 1)}")
        gids = np.searchsorted(bnd_arr, arr, side="right").astype(np.int32)
        return pd.Series(gids, index=skeys.index)

    gidded = keyed.withColumn("_gid", gid_of(F.col("_skey")))

    counts = {r["_gid"]: r["count"]
              for r in gidded.groupBy("_gid").count().collect()}
    n_gids = len(bounds) + 1
    sizes = np.array([counts.get(g, 0) for g in range(n_gids)], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1])).tolist()

    srt = (gidded.repartition(max(partitions, n_gids), "_gid")
                 .sortWithinPartitions("_skey"))

    from pyspark.sql.types import LongType, StructField, StructType
    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField("doc_id", LongType(), False)]
    )
    out_cols = [f.name for f in df.schema.fields]

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            gids = pdf["_gid"].to_numpy()
            ids = np.empty(len(pdf), dtype=np.int64)
            # contiguous runs of gid within the key-sorted batch
            change = np.flatnonzero(np.diff(gids)) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(gids)]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                g = int(gids[s])
                base = offsets[g] + pos.get(g, 0)
                ids[s:e] = np.arange(base, base + (e - s), dtype=np.int64)
                pos[g] = pos.get(g, 0) + (e - s)
            out = pdf[out_cols].copy()
            out["doc_id"] = ids
            yield out

    return srt.mapInPandas(add_ids, out_schema)
