"""Multimodal (binary) column handling — training-data pipeline extension.

The reference pipeline parses documents with Tika, which also accepts
image/audio containers but only extracts their *metadata*, never decodes
pixels/samples [public: Tika parsers]. A 100-TB training-data engine needs
real multimodal plumbing: opaque ``binary`` payload columns + typed
metadata, with decode / feature-extract / resize / frame-sample stages as
Arrow-vectorized stages over ``mapInPandas``.

Design for scale (the part that is REAL and tested here):
  * payloads live in a ``BinaryType`` column next to typed metadata — never
    exploded into rows, never collected to the driver;
  * every media stage is an iterator ``mapInPandas`` (one Arrow crossing,
    batch-at-a-time memory) keyed so downstream joins stay co-partitioned
    on ``doc_id``;
  * feature outputs are fixed-width ``array<float>`` columns that feed the
    ANN operators (relops.ann_cosine*) unchanged.

The actual image/audio codecs (PIL/libsndfile/ffmpeg) are NOT in this
container, so ``decode_media`` is a clearly-marked STUB: with
``fake=True`` (default here) it produces a deterministic byte-derived
surrogate signal with the same shapes the real decoder would emit; with
``fake=False`` it raises NotImplementedError at the import-gate. The
Spark-side plumbing — schema, batching, UDF signatures, partitioning — is
real and covered by tests/test_multimodal.py; swapping in a real decoder
changes only the numpy body of ``_decode_one_batch``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MODALITIES = ("image", "audio", "video")

MEDIA_SCHEMA = ("doc_id long, modality string, data binary, "
                "width int, height int, sample_rate int, n_frames int")

FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, modality string, features array<float>"

BYTESTATS_SCHEMA = ("doc_id long, n_bytes int, h_am int, h_nz int, "
                    "h_digit int, h_other int")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from ``documents``:
    payload = the document's UTF-8 bytes standing in for an encoded
    image/audio/video container (no external data — TESTDATA.md rule),
    modality round-robins on doc_id, typed metadata is a pure function of
    n_chars. At production scale this is simply ``spark.read`` of a table
    with a real binary column; everything downstream is identical."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return d.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        (F.col("n_chars") % 64 + 8).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 8).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("n_chars") % 16 + 1).cast("int").alias("n_frames"),
    )


# ------------------------------------------------------------ decode stub ---

def _decode_one_batch(pdf: pd.DataFrame, fake: bool) -> list[np.ndarray]:
    """STUB decode: real codecs are not installed in this container.
    fake=True emits a deterministic float32 signal per payload (the raw
    bytes scaled to [0,1]) shaped like the metadata says — same length
    contract a real decoder would satisfy. Replace this body with
    PIL.Image.open / soundfile.read / av frame iteration in production."""
    if not fake:
        raise NotImplementedError(
            "real media decoding needs PIL/soundfile/av, which are not "
            "available in this environment; pass fake=True for the "
            "deterministic byte-surrogate decoder")
    out = []
    for data, w, h, nf, modality in zip(
            pdf["data"], pdf["width"], pdf["height"], pdf["n_frames"],
            pdf["modality"]):
        raw = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.float32)
        if modality == "image":
            size = int(w) * int(h)
        elif modality == "video":
            size = int(w) * int(h) * int(nf)
        else:
            size = max(1, raw.size)
        sig = np.resize(raw, size) / 255.0  # deterministic tile/truncate
        out.append(sig)
    return out


def extract_features(media: DataFrame, fake: bool = True,
                     dim: int = FEATURE_DIM) -> DataFrame:
    """decode -> fixed-width feature vector (mean of `dim` equal slices of
    the decoded signal), one Arrow crossing, batch-at-a-time memory. The
    output array<float> plugs straight into the ANN operators."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for sig in _decode_one_batch(pdf, fake):
                sig = np.resize(sig, max(dim, sig.size))
                cut = (sig.size // dim) * dim
                feats.append(sig[:cut].reshape(dim, -1).mean(axis=1)
                             .astype(np.float32))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "modality": pdf["modality"],
                "features": feats,
            })

    return media.mapInPandas(stage, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every: int = 2,
                 fake: bool = True) -> DataFrame:
    """Video frame-sampling: keep every ``every``-th frame of the decoded
    clip; non-video rows pass through unsampled. Emits one row per KEPT
    frame (doc_id, frame_idx, frame array<float>) — the explode happens
    python-side within the batch, so the binary payload is decoded once."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "video"]
            if pdf.empty:
                continue
            ids, idxs, frames = [], [], []
            for doc_id, w, h, nf, sig in zip(
                    pdf["doc_id"], pdf["width"], pdf["height"],
                    pdf["n_frames"], _decode_one_batch(pdf, fake)):
                fsz = int(w) * int(h)
                for fi in range(0, int(nf), every):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(sig[fi * fsz:(fi + 1) * fsz])
            yield pd.DataFrame({"doc_id": np.array(ids, np.int64),
                                "frame_idx": np.array(idxs, np.int32),
                                "frame": frames})

    return media.mapInPandas(stage, "doc_id long, frame_idx int, "
                                    "frame array<float>")


def resize_image(media: DataFrame, out_w: int = 8, out_h: int = 8,
                 fake: bool = True) -> DataFrame:
    """Image resize via vectorized nearest-neighbour index math (a real
    deployment swaps in PIL's Lanczos inside the same stage)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "image"]
            if pdf.empty:
                continue
            out = []
            for w, h, sig in zip(pdf["width"], pdf["height"],
                                 _decode_one_batch(pdf, fake)):
                img = sig.reshape(int(h), int(w))
                yi = (np.arange(out_h) * int(h) // out_h)
                xi = (np.arange(out_w) * int(w) // out_w)
                out.append(img[np.ix_(yi, xi)].ravel())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "pixels": out,
            })

    return media.mapInPandas(stage, "doc_id long, pixels array<float>")


# --------------------------------------------- SQL-verifiable byte stats ---

def media_byte_stats(media: DataFrame) -> DataFrame:
    """Byte-class histogram over the raw BINARY payload (n_bytes + counts
    of [a-m], [n-z], [0-9], other) — vectorized np.frombuffer, one pass.
    Cross-engine verifiable: for ASCII payloads the byte classes equal the
    char classes DuckDB can count with regexp_replace (oracle entry
    ``media_features`` in __spark_entry__)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            blobs = [np.frombuffer(bytes(b), dtype=np.uint8)
                     for b in pdf["data"]]
            lens = np.array([b.size for b in blobs], dtype=np.int64)
            cat = np.concatenate(blobs) if blobs else np.empty(0, np.uint8)
            bounds = np.concatenate(([0], np.cumsum(lens)))
            am = (cat >= 0x61) & (cat <= 0x6D)
            nz = (cat >= 0x6E) & (cat <= 0x7A)
            dg = (cat >= 0x30) & (cat <= 0x39)
            # per-blob class counts via cumsum-at-boundaries (vectorized)
            cm = np.concatenate(([0], np.cumsum(am)))
            cn = np.concatenate(([0], np.cumsum(nz)))
            cd = np.concatenate(([0], np.cumsum(dg)))
            h_am = cm[bounds[1:]] - cm[bounds[:-1]]
            h_nz = cn[bounds[1:]] - cn[bounds[:-1]]
            h_dg = cd[bounds[1:]] - cd[bounds[:-1]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_bytes": lens.astype(np.int32),
                "h_am": h_am.astype(np.int32),
                "h_nz": h_nz.astype(np.int32),
                "h_digit": h_dg.astype(np.int32),
                "h_other": (lens - h_am - h_nz - h_dg).astype(np.int32),
            })

    from parser_indexer_spark.relops import _rr
    # r6: parallelism floor — the synthetic media table derives from the
    # single-row-group documents scan, so the (vectorized) stage otherwise
    # runs on one task at bench scale
    return _rr(media.select("doc_id", "data")) \
        .mapInPandas(stage, BYTESTATS_SCHEMA)
