"""Distributed segment merge / compaction (C10) — SURVEY.md §2.C10.

Reference analogue: Lucene's background ``TieredMergePolicy`` merges
segments by k-way docID-ordered postings merge [public: Lucene merging].
Engine analogue: a Spark job that reads every committed segment's posting
blocks, decodes them back to (term, doc_id, tf, dl) rows (one fused Arrow
stage), and re-runs the standard inversion (salted term shuffle + sorted
block rebuild) into a single new segment. Because doc_ids are globally
unique across segments, the merge is a pure re-layout: the logical index is
unchanged (tested via per-term posting hashes in tests/test_merge.py), but
under-full chunk-boundary blocks from many small segments compact into full
``block_size`` runs — the same win Lucene gets from merging.

The merged index is written to a NEW root and committed atomically via its
own manifest, so readers never observe a half-merged state (Iceberg-snapshot
semantics on the Parquet fallback, SURVEY.md §7 M8).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parser_indexer_spark.build import (
    TOKENIZE_TF_SCHEMA, finalize_index, invert_and_write_segment,
    read_postings, write_segment_manifest,
)
from parser_indexer_spark.codec import (decode_blocks, delta_decode_blocks,
                                        varint_slices)
from parser_indexer_spark.config import EngineConfig
from parser_indexer_spark.deletes import deletes_path, read_tombstones
from parser_indexer_spark.manifest import CATALOG, IndexPaths, now


def _decode_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Posting blocks -> raw (doc_id, term, tf, dl, pos_gaps) rows,
    vectorized. Position payloads pass through as per-posting raw LEB128
    gap slices (same binary wire as the tokenize stage) — the re-inversion
    byte-joins them into new blocks without ever reconstructing absolute
    positions (gaps are within-doc, so they are layout-independent). Old
    FOR-coded position payloads are transcoded to varint here once.

    r6 (VERDICT r5 #4): batched — ONE decode_blocks call per Arrow batch
    per column (the same entry point the query path adopted in r5),
    segmented delta via delta_decode_blocks, and positions decoded as one
    concatenated LEB128 stream sliced back per posting. The per-block
    itertuples loop paid the fixed per-decode Python/numpy cost once per
    <= 128-posting block — the dominant recurring cost of the 100x
    background merge job."""
    for pdf in batches:
        if pdf.empty:
            continue
        ns = pdf["num_docs"].to_numpy(np.int64)
        n_tot = int(ns.sum())
        if n_tot == 0:
            continue
        gaps = decode_blocks(pdf["docs_enc"].to_numpy(), ns)
        d = delta_decode_blocks(
            gaps, ns, pdf["first_doc_id"].to_numpy(np.int64))
        t = decode_blocks(pdf["tfs_enc"].to_numpy(), ns)
        l = decode_blocks(pdf["dls_enc"].to_numpy(), ns)
        terms = np.repeat(pdf["term"].to_numpy(), ns)
        pos_bufs = pdf["pos_enc"].to_numpy()
        has_pos = np.array([p is not None for p in pos_bufs], dtype=bool)
        pgs = np.empty(n_tot, dtype=object)       # None-initialized
        if has_pos.any():
            tf_i64 = t.astype(np.int64, copy=False)
            block_starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            npos_blk = np.add.reduceat(tf_i64, block_starts)
            sel = np.flatnonzero(has_pos)
            gaps_flat = decode_blocks([pos_bufs[i] for i in sel],
                                      npos_blk[sel])
            post_sel = np.repeat(has_pos, ns)
            tf_sel = tf_i64[post_sel]
            starts_post = np.concatenate(([0], np.cumsum(tf_sel)[:-1]))
            slices = varint_slices(gaps_flat, starts_post)
            sl_arr = np.empty(len(slices), dtype=object)
            sl_arr[:] = slices
            pgs[post_sel] = sl_arr
        yield pd.DataFrame({
            "doc_id": d,
            "term": terms,
            "tf": t.astype(np.int32),
            "dl": l.astype(np.int32),
            "pos_gaps": pgs,
        })


def _with_pos_col(blocks: DataFrame) -> DataFrame:
    """Back-compat shim (ADVICE r3): posting parquet written before the
    positional format has no pos_enc column at all; add it as a null
    binary literal so _decode_blocks (and the re-inversion) treat the old
    segments exactly like a positions=False build."""
    if "pos_enc" not in blocks.columns:
        blocks = blocks.withColumn("pos_enc", F.lit(None).cast("binary"))
    return blocks


def _check_pos_cfg(cfg: EngineConfig, src_config: dict, what: str) -> None:
    """A merge/compaction re-inverts decoded postings: it can only CARRY
    positions, never create them. A cfg override with positions=True over
    a source that has none would reach block_pack's byte-join with
    pos_gaps=None rows (ADVICE r4) — fail fast with the real reason
    instead."""
    if cfg.positions and not src_config.get("positions"):
        raise ValueError(
            f"{what}: cfg.positions=True but the source index was built "
            "without positional payloads; positions cannot be synthesized "
            "from postings — rebuild from the raw input instead")


def merge_index(spark: SparkSession, src_root: str, dst_root: str,
                cfg: EngineConfig | None = None) -> dict:
    """Compact all of src_root's segments into a single-segment index at
    dst_root. Returns the new manifest."""
    t0 = now()
    src_manifest = CATALOG.load_snapshot(src_root)
    cfg = cfg or EngineConfig.from_dict(src_manifest["config"])
    _check_pos_cfg(cfg, src_manifest["config"], "merge_index")
    sp, dp = IndexPaths(src_root), IndexPaths(dst_root)

    tombstones = None
    dels = src_manifest.get("deletes")
    if dels and dels.get("n"):
        tombstones = read_tombstones(src_root, dels["gen"])
    if os.path.exists(dp.root):
        shutil.rmtree(dp.root)
    os.makedirs(dp.root)
    if tombstones is None:
        # doc store unchanged by a pure merge — re-link it (local fs copy;
        # on a real deployment this is an Iceberg metadata-only operation)
        shutil.copytree(sp.docs, dp.docs)
        docs_meta = CATALOG.read_meta(dp.docs_marker)
        docs_meta["segments"] = 1
        CATALOG.write_meta(dp.docs_marker, docs_meta)
        del_df = None
    else:
        # purge pass [public: Lucene merge dropping liveDocs-deleted docs]:
        # tombstoned rows leave the doc store, the postings (below), the
        # stats (n_docs here; df/sum_dl via the re-inversion), and the
        # tombstone set itself — the merged index is the rebuilt-equivalent
        del_df = spark.createDataFrame(
            pd.DataFrame({"doc_id": tombstones}), "doc_id long")
        docs = CATALOG.read_table(spark, sp.docs) \
                      .join(F.broadcast(del_df), "doc_id", "left_anti")
        CATALOG.write_table(docs, dp.docs, partition_by="seg")
        docs_meta = CATALOG.read_meta(sp.docs_marker)
        # ADVICE r5 (low): count the rows that actually survived instead
        # of trusting the tombstone count — a bogus id in the tombstone
        # set must not understate n_docs (idf/avg_dl for every query).
        # Footer-metadata count over the just-written table: ~free.
        docs_meta["n_docs"] = CATALOG.read_table(spark, dp.docs).count()
        docs_meta["segments"] = 1
        CATALOG.write_meta(dp.docs_marker, docs_meta)

    blocks = _with_pos_col(read_postings(spark, src_root))
    tf = blocks.select("term", "num_docs", "first_doc_id",
                       "docs_enc", "tfs_enc", "dls_enc", "pos_enc") \
               .mapInPandas(_decode_blocks, TOKENIZE_TF_SCHEMA)
    if del_df is not None:
        tf = tf.join(F.broadcast(del_df), "doc_id", "left_anti")
    lo = min(s["doc_lo"] for s in src_manifest["segments"])
    hi = max(s["doc_hi"] for s in src_manifest["segments"])
    ts0 = now()
    from pyspark.storagelevel import StorageLevel
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)  # census+invert+impacts
    try:
        inv = invert_and_write_segment(spark, dp, 0, cfg, tf, (lo, hi))
        write_segment_manifest(spark, dp, 0, cfg, inv, ts0)
    finally:
        tf.unpersist()
    manifest = finalize_index(spark, dst_root, cfg, docs_meta, 1,
                              input_desc=f"merge of {src_root} "
                                         f"({src_manifest['n_segments']} segments)",
                              t0=t0)
    return manifest


# ------------------------------------------------- tiered merge policy ---

def select_merges(root: str, ratio: float = 2.0, min_run: int = 2,
                  max_run: int = 8) -> list[list[int]]:
    """Tiered merge selection [public: Lucene TieredMergePolicy]: group
    size-sorted live segments into runs where every member is within
    ``ratio`` of the run's smallest segment (by n_postings), runs capped at
    ``max_run``. Only size-similar segments merge, so total merge I/O over
    an index's lifetime amortizes to O(n log n) instead of the O(n^2) that
    always-full recompaction (merge_index) costs under streaming appends.
    Returns a list of segment-id lists, each a candidate compaction."""
    man = CATALOG.load_snapshot(root)
    rows = sorted(man["segments"], key=lambda s: (s["n_postings"], s["seg"]))
    runs: list[list[int]] = []
    cur: list[dict] = []
    for s in rows:
        if cur and s["n_postings"] <= ratio * max(1, cur[0]["n_postings"]) \
                and len(cur) < max_run:
            cur.append(s)
        else:
            if len(cur) >= min_run:
                runs.append([x["seg"] for x in cur])
            cur = [s]
    if len(cur) >= min_run:
        runs.append([x["seg"] for x in cur])
    return runs


def compact_segments(spark: SparkSession, root: str, segs: list[int],
                     cfg: EngineConfig | None = None) -> dict:
    """Compact ONLY ``segs`` (a select_merges run) into one new segment,
    IN PLACE: decode just those segments' blocks, re-invert into segment id
    max+1, recommit the manifest over the surviving segment set, then drop
    the merged segments' files. Untouched segments are never read — their
    posting files, per-segment dicts, and manifest rows are reused as-is
    (asserted by tests/test_merge.py's mtime check).

    Crash safety: the new segment is written and its manifest row committed
    BEFORE the snapshot recommit (a replay overwrites it idempotently), and
    old segment dirs are removed only AFTER the new _manifest.json no
    longer references them — readers always see a consistent snapshot."""
    t0 = now()
    man = CATALOG.load_snapshot(root)
    cfg = cfg or EngineConfig.from_dict(man["config"])
    _check_pos_cfg(cfg, man["config"], "compact_segments")
    p = IndexPaths(root)
    live = {s["seg"]: s for s in man["segments"]}
    segs = sorted(segs)
    if len(segs) < 2 or any(s not in live for s in segs):
        raise ValueError(f"compaction run {segs} not within live segments "
                         f"{sorted(live)}")
    meta = CATALOG.read_meta(p.docs_marker)
    new_seg = max(max(live), int(meta["segments"]) - 1) + 1

    blocks = _with_pos_col(read_postings(spark, root, segs=segs))
    tf = blocks.select("term", "num_docs", "first_doc_id",
                       "docs_enc", "tfs_enc", "dls_enc", "pos_enc") \
               .mapInPandas(_decode_blocks, TOKENIZE_TF_SCHEMA)
    lo = min(live[s]["doc_lo"] for s in segs)
    hi = max(live[s]["doc_hi"] for s in segs)
    # partial purge [public: Lucene liveDocs drop at merge]: tombstones
    # inside the merged segments' doc ranges leave postings + doc store
    # here; tombstones of untouched segments stay live in a new generation
    purged = remaining = None
    dels = man.get("deletes")
    if dels and dels.get("n"):
        ts = read_tombstones(root, dels["gen"])
        in_range = np.zeros(ts.size, dtype=bool)
        for sg in segs:
            in_range |= (ts >= live[sg]["doc_lo"]) & \
                        (ts <= live[sg]["doc_hi"])
        purged, remaining = ts[in_range], ts[~in_range]
        n_removed = 0
        if purged.size:
            del_df = spark.createDataFrame(
                pd.DataFrame({"doc_id": purged}), "doc_id long")
            tf = tf.join(F.broadcast(del_df), "doc_id", "left_anti")
            # doc-store rows of purged ids: rewrite ONLY the doc-store
            # partitions that contain them (dynamic partition overwrite —
            # untouched partitions keep their files). ADVICE r5 (low):
            # count the rows actually removed in the same semi-join pass —
            # a bogus tombstone id must not understate n_docs.
            docs = CATALOG.read_table(spark, p.docs)
            hit_rows = (docs.join(F.broadcast(del_df), "doc_id",
                                  "left_semi")
                        .groupBy("seg").count().collect())
            hit = [r["seg"] for r in hit_rows]
            n_removed = int(sum(r["count"] for r in hit_rows))
            if hit:
                CATALOG.write_table(
                    docs.where(F.col("seg").isin(hit))
                        .join(F.broadcast(del_df), "doc_id", "left_anti"),
                    p.docs, partition_by="seg", dynamic=True)
    from pyspark.storagelevel import StorageLevel
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)  # census+invert+impacts
    try:
        inv = invert_and_write_segment(spark, p, new_seg, cfg, tf, (lo, hi))
        write_segment_manifest(spark, p, new_seg, cfg, inv, t0)
    finally:
        tf.unpersist()

    # allocation watermark: future appends start above the compacted id
    meta["segments"] = new_seg + 1
    deletes_left = None
    if purged is not None and purged.size:
        meta["n_docs"] = int(meta["n_docs"]) - n_removed
    if remaining is not None and remaining.size:
        gen = int(dels["gen"]) + 1
        CATALOG.write_table(
            spark.createDataFrame(pd.DataFrame({"doc_id": remaining}),
                                  "doc_id long"),
            deletes_path(root, gen))
        deletes_left = {"gen": gen, "n": int(remaining.size)}
    CATALOG.write_meta(p.docs_marker, meta)
    survivors = [s for s in live if s not in set(segs)] + [new_seg]
    manifest = finalize_index(
        spark, root, cfg, meta, survivors,
        input_desc=f"tiered compaction of segs {segs} -> {new_seg}", t0=t0,
        deletes=deletes_left)
    for s in segs:  # only after the commit stopped referencing them
        shutil.rmtree(p.postings_seg(s), ignore_errors=True)
        shutil.rmtree(p.dict_seg(s), ignore_errors=True)
        shutil.rmtree(p.impacts_seg(s), ignore_errors=True)
        os.remove(p.segment_manifest(s))
    if dels and dels.get("n"):
        # ADVICE r5 (low): the superseded tombstone generation is no
        # longer referenced by the committed manifest — drop it
        shutil.rmtree(deletes_path(root, int(dels["gen"])),
                      ignore_errors=True)
    return manifest
