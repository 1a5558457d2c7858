"""Dense global doc_id assignment (B7) — SURVEY.md §2.B7, §7 M2 + hard-part 2.

Reference analogue: parser-indexer's document identity is the file path/URL
string [upstream — UNVERIFIED]; delta-encoded postings need dense int64 ids
sorted by a stable total order, so the engine assigns
``doc_id = rank of (conv_id, turn_idx)``.

Spark's ``repartitionByRange`` is NOT usable here: its boundary sampling is
nondeterministic across jobs (verified in-sandbox — two runs of the same
plan produced different split keys), so a count pass and an assign pass can
disagree. Instead boundaries are computed explicitly, TeraSort-style but
deterministic, and the whole pipeline stays JVM-side (zero Python
crossings — profiled 2x faster than a pandas_udf/mapInPandas variant):

  1. sort key  skey = conv_id || '\\x01' || lpad(turn_idx, 10)
  2. sample    rows where crc32(skey) % inv == 0  — a pure function of the
               key, identical at any parallelism; driver holds <= ~100k keys
  3. boundaries = evenly spaced order statistics of the sorted sample,
               shipped as a literal array (G ~ 2x partitions, tiny)
  4. gid       = size(filter(boundaries, b -> b <= skey))   (whole-stage
               codegen; O(G) per row)
  5. exact counts per gid -> prefix-sum offsets -> broadcast G-row join
  6. doc_id    = offset[gid] + row_number() OVER (PARTITION BY gid
               ORDER BY conv_id, turn_idx) - 1

Every step is a deterministic function of the input table alone, so doc_ids
are identical at local[8] and local[32] (tested, SURVEY.md §5.8). The
per-gid window sort is the same physical shuffle+sort a repartition-based
scheme needs — no extra wide stage.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

ORDER_COLS = ("conv_id", "turn_idx")
_SEP = "\x01"


def _skey_col():
    return F.concat(F.col("conv_id"), F.lit(_SEP),
                    F.lpad(F.col("turn_idx").cast("string"), 10, "0"))


def assign_doc_ids(df: DataFrame, partitions: int = 32,
                   target_sample: int = 100_000,
                   n_rows: int | None = None) -> DataFrame:
    """Input: transcripts-shaped DataFrame with unique (conv_id, turn_idx).
    Output: same columns + dense ``doc_id`` long starting at 0,
    order-isomorphic to the (conv_id, turn_idx) total order.
    ``n_rows``: pass the known row count to skip the count job."""
    spark = df.sparkSession
    n = n_rows if n_rows is not None else df.count()
    if n == 0:
        from pyspark.sql.types import LongType, StructField, StructType
        schema = StructType(list(df.schema.fields) +
                            [StructField("doc_id", LongType(), False)])
        return spark.createDataFrame([], schema)

    keyed = df.withColumn("_skey", _skey_col())

    # deterministic hash sample of sort keys (ceil: never collect the
    # whole key column when n is just under 2x target_sample)
    inv = max(1, -(-n // target_sample))
    sample = [r[0] for r in keyed.select("_skey")
              .where(F.crc32(F.col("_skey")) % inv == 0).collect()]
    sample.sort()
    n_groups = max(1, min(2 * partitions, len(sample)))
    if n_groups > 1:
        step = len(sample) / n_groups
        bounds = sorted({sample[int(step * i)] for i in range(1, n_groups)})
    else:
        bounds = []

    if bounds:
        bnd_lit = F.array(*[F.lit(b) for b in bounds])
        gid = F.size(F.filter(bnd_lit, lambda b: b <= F.col("_skey")))
    else:
        gid = F.lit(0)
    gidded = keyed.withColumn("_gid", gid)

    counts = {r["_gid"]: r["count"]
              for r in gidded.groupBy("_gid").count().collect()}
    n_gids = len(bounds) + 1
    sizes = np.array([counts.get(g, 0) for g in range(n_gids)], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    off_df = spark.createDataFrame(
        [(int(g), int(offsets[g])) for g in range(n_gids)], "_gid int, _off long")

    w = Window.partitionBy("_gid").orderBy(*ORDER_COLS)
    out_cols = [f.name for f in df.schema.fields]
    return (gidded.join(F.broadcast(off_df), "_gid")
            .withColumn("doc_id",
                        F.col("_off") + F.row_number().over(w) - F.lit(1))
            .select(*out_cols, "doc_id"))
