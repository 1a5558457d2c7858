"""Multimodal binary-column plumbing tests: schema, batching, decode stub,
feature extraction, frame sampling, resize, byte-stats vs local recompute.
The decode itself is a documented stub (no media libs in this container);
everything Spark-side — binary column flow, Arrow batches, UDF signatures,
output schemas — is real and exercised here."""

import numpy as np
import pandas as pd
import pytest

from parser_indexer_spark import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.media_table(spark, sf_dir)


def test_media_table_shape(spark, sf_dir, media):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = media.collect()
    assert len(rows) == docs.count()
    assert set(media.columns) == {"doc_id", "modality", "data", "width",
                                  "height", "sample_rate", "n_frames"}
    r = {x["doc_id"]: x for x in rows}
    src = {x["doc_id"]: x["text"] for x in docs.collect()}
    for doc_id, row in r.items():
        assert bytes(row["data"]) == src[doc_id].encode("utf-8")
        assert row["modality"] == mm.MODALITIES[doc_id % 3]


def test_decode_stub_gates_real_path(media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)


def test_extract_features(media):
    feats = mm.extract_features(media).collect()
    assert len(feats) == media.count()
    for r in feats[:20]:
        v = np.array(r["features"], dtype=np.float32)
        assert v.shape == (mm.FEATURE_DIM,)
        assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()


def test_extract_features_deterministic_vs_local(media):
    """Spark pipeline output equals a driver-side numpy recompute."""
    got = {r["doc_id"]: np.array(r["features"], np.float32)
           for r in mm.extract_features(media).collect()}
    pdf = media.limit(50).toPandas()
    local = mm._decode_one_batch(pdf, fake=True)
    for (_, row), sig in zip(pdf.iterrows(), local):
        sig = np.resize(sig, max(mm.FEATURE_DIM, sig.size))
        cut = (sig.size // mm.FEATURE_DIM) * mm.FEATURE_DIM
        exp = sig[:cut].reshape(mm.FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
        np.testing.assert_array_equal(got[row["doc_id"]], exp)


def test_frame_sample(media):
    vids = {r["doc_id"]: r for r in
            media.where("modality = 'video'").collect()}
    frames = mm.frame_sample(media, every=2).collect()
    assert frames and all(r["doc_id"] in vids for r in frames)
    per_doc = pd.DataFrame([(r["doc_id"], r["frame_idx"]) for r in frames],
                           columns=["doc_id", "frame_idx"])
    for doc_id, g in per_doc.groupby("doc_id"):
        nf = vids[doc_id]["n_frames"]
        assert sorted(g["frame_idx"]) == list(range(0, nf, 2))
    for r in frames[:10]:
        v = vids[r["doc_id"]]
        assert len(r["frame"]) == v["width"] * v["height"]


def test_resize_image(media):
    out = mm.resize_image(media, out_w=8, out_h=8).collect()
    n_img = media.where("modality = 'image'").count()
    assert len(out) == n_img
    for r in out[:10]:
        assert len(r["pixels"]) == 64


def test_media_byte_stats_vs_local(spark, sf_dir, media):
    got = {r["doc_id"]: r.asDict() for r in
           mm.media_byte_stats(media).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in docs:
        b = d["text"].encode("utf-8")
        exp = {
            "n_bytes": len(b),
            "h_am": sum(0x61 <= c <= 0x6D for c in b),
            "h_nz": sum(0x6E <= c <= 0x7A for c in b),
            "h_digit": sum(0x30 <= c <= 0x39 for c in b),
        }
        exp["h_other"] = exp["n_bytes"] - exp["h_am"] - exp["h_nz"] - exp["h_digit"]
        g = got[d["doc_id"]]
        assert {k: g[k] for k in exp} == exp
