"""Index build pipeline (C1-C13) — SURVEY.md §2.C, §3.1, §7 M3/M6/M7.

The reference path is: Tika parse -> JSONL -> SolrJ add() -> Lucene
IndexWriter in-memory inversion + segment flush + background merges
[upstream pipeline — UNVERIFIED; public: Solr/Lucene indexing path]. The
engine re-expresses inversion as Spark's shuffle: the
``repartition(term, salt) + sortWithinPartitions(term, doc_id)`` exchange IS
the invert-and-flush, and one fused Arrow stage per leg keeps everything
vectorized (BASELINE.json:6,15).

Physical plan per segment (doc_id range slice):
    docs/seg=s parquet scan (column-pruned to doc_id, text)
      -> mapInPandas tokenize+tf           (C1-C2, Arrow kernels)
      -> groupBy(term).count()             (exact df; map-side partial agg
                                            makes this shuffle ~|vocab|)
      -> hot terms (df > threshold) get a doc-RANGE salt (C11): ranges are
         disjoint and ordered, so salted groups emit non-overlapping,
         chunk-aligned blocks needing no re-merge
      -> repartition(P, term, _salt) + sortWithinPartitions(term, doc_id)
      -> mapInPandas block builder         (C3-C6: cut at <=block_size AND
                                            chunk boundaries; delta + FOR)
      -> write partitionBy(bucket)         (A4: shard writer)
      -> per-segment manifest row          (C12-C13: metrics + lineage)

Resume: segments with a manifest row are skipped; doc_id assignment is a
deterministic function of the input (docids.py), so a resumed build is
logically identical to an uninterrupted one (tested, SURVEY.md §5.7).
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.storagelevel import StorageLevel

from parser_indexer_spark.analyze import TOKENIZE_TF_SCHEMA, tokenize_tf_batches
from parser_indexer_spark.codec import delta_encode, for_encode
from parser_indexer_spark.config import EngineConfig
from parser_indexer_spark.docids import assign_doc_ids
from parser_indexer_spark.manifest import (
    IndexPaths, completed_segments, now, read_json, write_json,
)

POSTINGS_SCHEMA = (
    "term string, bucket int, chunk long, first_doc_id long, "
    "last_doc_id long, num_docs int, max_tf int, min_dl int, sum_tf long, "
    "docs_enc binary, tfs_enc binary, dls_enc binary"
)
POSTINGS_COLS = [c.split(" ")[0] for c in POSTINGS_SCHEMA.split(", ")]


def term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic term -> partition bucket (query-time pruning, D2)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def make_block_builder(cfg: EngineConfig):
    """mapInPandas stage: sorted (term, doc_id, tf, dl) rows -> posting-block
    rows. Input partition MUST be sorted by (term, doc_id); term runs may span
    Arrow batches (carry buffer). Blocks never cross a chunk boundary so all
    terms' blocks align on the same doc-range grid (enables the one-shuffle
    AND intersection, D4)."""
    bs, cbits, nb = cfg.block_size, cfg.chunk_bits, cfg.n_buckets

    def emit_run(term: str, d: np.ndarray, t: np.ndarray, l: np.ndarray, out: list):
        bucket = term_bucket(term, nb)
        chunks = d >> cbits
        seg_change = np.flatnonzero(np.diff(chunks)) + 1
        seg_starts = np.concatenate(([0], seg_change))
        seg_ends = np.concatenate((seg_change, [d.size]))
        for s, e in zip(seg_starts.tolist(), seg_ends.tolist()):
            for b0 in range(s, e, bs):
                b1 = min(b0 + bs, e)
                dd, tt, ll = d[b0:b1], t[b0:b1], l[b0:b1]
                first = int(dd[0])
                out.append((
                    term, bucket, first >> cbits, first, int(dd[-1]),
                    b1 - b0, int(tt.max()), int(ll.min()), int(tt.sum()),
                    for_encode(delta_encode(dd, first)),
                    for_encode(tt.astype(np.uint64)),
                    for_encode(ll.astype(np.uint64)),
                ))

    def builder(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cterm: Optional[str] = None
        cd: list = []
        ct: list = []
        cl: list = []
        for pdf in batches:
            if pdf.empty:
                continue
            out: list = []
            terms = pdf["term"].to_numpy()
            d = pdf["doc_id"].to_numpy(dtype=np.int64)
            t = pdf["tf"].to_numpy(dtype=np.int64)
            l = pdf["dl"].to_numpy(dtype=np.int64)
            change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
            starts = np.concatenate(([0], change)).tolist()
            ends = np.concatenate((change, [len(terms)])).tolist()
            for i, (s, e) in enumerate(zip(starts, ends)):
                term = terms[s]
                is_last = i == len(starts) - 1
                if cterm is not None and term == cterm:
                    cd.append(d[s:e]); ct.append(t[s:e]); cl.append(l[s:e])
                    if not is_last:
                        emit_run(cterm, np.concatenate(cd),
                                 np.concatenate(ct), np.concatenate(cl), out)
                        cterm, cd, ct, cl = None, [], [], []
                else:
                    if cterm is not None:
                        emit_run(cterm, np.concatenate(cd),
                                 np.concatenate(ct), np.concatenate(cl), out)
                        cterm, cd, ct, cl = None, [], [], []
                    if is_last:
                        cterm, cd, ct, cl = term, [d[s:e]], [t[s:e]], [l[s:e]]
                    else:
                        emit_run(term, d[s:e], t[s:e], l[s:e], out)
            if out:
                yield pd.DataFrame(out, columns=POSTINGS_COLS)
        if cterm is not None:
            out = []
            emit_run(cterm, np.concatenate(cd), np.concatenate(ct),
                     np.concatenate(cl), out)
            yield pd.DataFrame(out, columns=POSTINGS_COLS)

    return builder


# ------------------------------------------------------------- the build ---

def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    cfg: EngineConfig = EngineConfig(),
    segments: int = 1,
    input_desc: str = "",
    resume: bool = True,
    doc_id_col: Optional[str] = None,
    _fail_after_segments: Optional[int] = None,  # fault injection (tests)
) -> dict:
    """Build (or resume) a full index at ``out_dir``; returns the manifest.

    ``transcripts`` must have a ``text`` column plus EITHER unique
    (conv_id, turn_idx) — dense doc_ids get assigned by that total order
    (BASELINE.json:15) — OR ``doc_id_col`` naming an existing unique
    non-negative int64 id (e.g. testdata ``documents.doc_id``), used as-is
    (delta encoding only needs ascending ids; density just compresses best).
    """
    p = IndexPaths(out_dir)
    t0 = now()

    # Small inputs (bench scale) arrive in fewer scan partitions than cores;
    # widen once so every downstream stage parallelizes. At real scale the
    # scan already has >= build_partitions splits and this no-ops. Count
    # first: on a raw parquet scan Spark answers count() from footer
    # metadata, so it is ~free before the repartition but a full shuffle
    # execution after it.
    n_input = transcripts.count()
    if transcripts.rdd.getNumPartitions() < cfg.build_partitions:
        transcripts = transcripts.repartition(cfg.build_partitions)

    # ---- phase A: doc store (stored fields) + dense doc_ids -------------
    import os
    if resume and os.path.exists(p.docs_marker):
        docs_meta = read_json(p.docs_marker)
        n_docs = docs_meta["n_docs"]
    else:
        if doc_id_col is not None:
            ids = transcripts
            if doc_id_col != "doc_id":
                ids = ids.withColumnRenamed(doc_id_col, "doc_id")
            ids = ids.withColumn("doc_id", F.col("doc_id").cast("long"))
            ids = ids.persist(StorageLevel.MEMORY_AND_DISK)
            agg = ids.agg(F.count("*"), F.max("doc_id"),
                          F.countDistinct("doc_id")).first()
            n_docs, max_id, n_distinct = agg[0], (agg[1] or 0), agg[2]
            if n_distinct != n_docs:
                raise ValueError("doc_id column is not unique")
        else:
            ids = assign_doc_ids(transcripts, partitions=cfg.build_partitions,
                                 n_rows=n_input)
            ids = ids.persist(StorageLevel.MEMORY_AND_DISK)
            # internally-assigned ids are dense 0..n_input-1 by construction
            n_docs, max_id = n_input, max(0, n_input - 1)
        seg_expr = F.least(F.lit(segments - 1),
                           (F.col("doc_id") * segments / F.lit(max(1, max_id + 1)))
                           .cast("long"))
        (ids.withColumn("seg", seg_expr)
            .write.mode("overwrite").partitionBy("seg").parquet(p.docs))
        ids.unpersist()
        docs_meta = {
            "n_docs": n_docs,
            "max_doc_id": int(max_id),
            "segments": segments,
            "input": input_desc,
            "analyzer_version": cfg.analyzer_version,
            "wall_sec": now() - t0,
        }
        write_json(p.docs_marker, docs_meta)

    seg_count = docs_meta["segments"]

    # ---- phase B: per-segment inverted-index build (resumable) ----------
    done = set(completed_segments(out_dir)) if resume else set()
    built_this_run = 0
    for seg in range(seg_count):
        if seg in done:
            continue
        _build_segment(spark, p, seg, cfg, docs_meta)
        built_this_run += 1
        if _fail_after_segments is not None and built_this_run >= _fail_after_segments:
            raise RuntimeError(
                f"injected failure after {built_this_run} segments (test)")

    # ---- phase C: dictionary + stats + atomic manifest commit -----------
    return finalize_index(spark, out_dir, cfg, docs_meta, seg_count,
                          input_desc, t0)


def finalize_index(spark: SparkSession, out_dir: str, cfg: EngineConfig,
                   docs_meta: dict, seg_count: int, input_desc: str,
                   t0: float) -> dict:
    """Phase C (C7/C9/C12): dict + stats from the committed segments, then
    the manifest written LAST = the atomic snapshot commit."""
    p = IndexPaths(out_dir)
    seg_rows = [read_json(p.segment_manifest(s)) for s in range(seg_count)]
    post = read_postings(spark, out_dir, segs=list(range(seg_count)))
    (post.groupBy("term")
         .agg(F.sum("num_docs").alias("df"), F.sum("sum_tf").alias("cf"),
              F.first("bucket").alias("bucket"))
         .write.mode("overwrite").partitionBy("bucket").parquet(p.dict))
    # totals from the (tiny) dict + the per-segment manifests — no second
    # full pass over the postings
    tot = spark.read.parquet(p.dict).agg(
        F.count("*").alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.sum("cf").alias("sum_dl"),
    ).first()
    stats = {
        "n_docs": docs_meta["n_docs"],
        "sum_dl": int(tot["sum_dl"] or 0),
        "avg_dl": (int(tot["sum_dl"] or 0) / max(1, docs_meta["n_docs"])),
        "n_terms": int(tot["n_terms"] or 0),
        "n_postings": int(tot["n_postings"] or 0),
        "n_blocks": int(sum(s["n_blocks"] for s in seg_rows)),
    }
    write_json(p.stats, stats)
    manifest = {
        "format": "parser-indexer-spark/v1",
        "config": cfg.to_dict(),
        "input": input_desc,
        "n_segments": seg_count,
        "stats": stats,
        "segments": seg_rows,
        "wall_sec_total": now() - t0,
    }
    write_json(p.manifest, manifest)  # LAST write = commit (C12)
    return manifest


def invert_and_write_segment(spark: SparkSession, p: IndexPaths, seg: int,
                             cfg: EngineConfig, tf: DataFrame,
                             doc_range: tuple[int, int]) -> int:
    """Core inversion (C3-C6, C11): tf rows -> salted term shuffle ->
    sorted block build -> bucket-partitioned write. Returns n_hot_terms.
    Shared by the fresh build and the merge/compaction job (C10)."""
    lo, hi = doc_range
    span = max(1, hi - lo + 1)
    # skew census: exact df via map-side-combinable agg (shuffle ~|vocab|)
    hot_rows = (tf.groupBy("term").count()
                .where(F.col("count") > cfg.salt_df_threshold)
                .select("term").collect())
    hot = [r["term"] for r in hot_rows]
    if hot:
        hot_df = spark.createDataFrame([(t,) for t in hot], "term string") \
                      .withColumn("_hot", F.lit(True))
        tf2 = tf.join(F.broadcast(hot_df), "term", "left")
        salt = F.when(
            F.col("_hot").isNotNull(),
            ((F.col("doc_id") - F.lit(lo)) * cfg.n_salts / F.lit(span))
            .cast("int"),
        ).otherwise(F.lit(0))
    else:
        tf2 = tf
        salt = F.lit(0)
    blocks = (
        tf2.withColumn("_salt", salt)
           .repartition(cfg.build_partitions, "term", "_salt")
           .sortWithinPartitions("term", "doc_id")
           .select("term", "doc_id", "tf", "dl")
           .mapInPandas(make_block_builder(cfg), POSTINGS_SCHEMA)
    )
    (blocks.write.mode("overwrite").partitionBy("bucket")
           .parquet(p.postings_seg(seg)))
    return len(hot)


def write_segment_manifest(spark: SparkSession, p: IndexPaths, seg: int,
                           cfg: EngineConfig, n_hot: int, t0: float) -> None:
    """Per-segment metrics + lineage (C13). One job: per-bucket agg (terms
    never cross buckets — bucket = hash(term) — so bucket metrics are
    additive to segment totals driver-side)."""
    seg_post = spark.read.parquet(p.postings_seg(seg))
    rows = (seg_post.groupBy("bucket").agg(
        F.count("*").alias("n_blocks"),
        F.sum("num_docs").alias("n_postings"),
        F.sum("sum_tf").alias("sum_tf"),
        F.countDistinct("term").alias("n_terms"),
        F.min("first_doc_id").alias("doc_lo"),
        F.max("last_doc_id").alias("doc_hi"),
    ).collect())
    per_bucket = {
        str(r["bucket"]): {"n_blocks": r["n_blocks"],
                           "n_postings": int(r["n_postings"]),
                           "n_terms": r["n_terms"],
                           "sum_tf": int(r["sum_tf"])}
        for r in rows
    }
    write_json(p.segment_manifest(seg), {
        "seg": seg,
        "n_blocks": int(sum(r["n_blocks"] for r in rows)),
        "n_postings": int(sum(r["n_postings"] for r in rows)),
        "sum_tf": int(sum(r["sum_tf"] for r in rows)),
        "n_terms": int(sum(r["n_terms"] for r in rows)),
        "doc_lo": int(min((r["doc_lo"] for r in rows), default=0)),
        "doc_hi": int(max((r["doc_hi"] for r in rows), default=0)),
        "n_hot_terms_salted": n_hot,
        "per_bucket": per_bucket,
        "analyzer_version": cfg.analyzer_version,
        "codec_version": cfg.codec_version,
        "wall_sec": now() - t0,
    })


def _build_segment(spark: SparkSession, p: IndexPaths, seg: int,
                   cfg: EngineConfig, docs_meta: dict) -> None:
    t0 = now()
    docs_seg = (spark.read.parquet(p.docs)
                .where(F.col("seg") == seg)
                .select("doc_id", "text"))
    if docs_seg.rdd.getNumPartitions() < cfg.build_partitions:
        docs_seg = docs_seg.repartition(cfg.build_partitions)
    tf = docs_seg.mapInPandas(tokenize_tf_batches, TOKENIZE_TF_SCHEMA)
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # salt doc-range bounds from phase-A metadata (no extra scan);
        # approximate bounds are fine — they only spread the salt ranges
        max_id = int(docs_meta.get("max_doc_id", docs_meta["n_docs"] - 1))
        s_count = int(docs_meta["segments"])
        lo = seg * (max_id + 1) // s_count
        hi = (seg + 1) * (max_id + 1) // s_count - 1 if seg < s_count - 1 else max_id
        n_hot = invert_and_write_segment(spark, p, seg, cfg, tf, (lo, hi))
    finally:
        tf.unpersist()
    write_segment_manifest(spark, p, seg, cfg, n_hot, t0)


# ---------------------------------------------------------------- readers ---

def read_postings(spark: SparkSession, root: str,
                  segs: Optional[list[int]] = None) -> DataFrame:
    p = IndexPaths(root)
    if segs is None:
        from parser_indexer_spark.manifest import load_manifest
        segs = [s["seg"] for s in load_manifest(root)["segments"]]
    paths = [p.postings_seg(s) for s in segs]
    return (spark.read.option("basePath", p.postings).parquet(*paths))


def read_docs(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(IndexPaths(root).docs)


def read_dict(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(IndexPaths(root).dict)
