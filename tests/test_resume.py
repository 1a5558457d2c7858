"""§5.7 resume + §5.8 determinism tests.

Resume: kill the build after b of B segments, resume, and assert the final
index is logically identical (per-term posting hash) to an uninterrupted
build. Determinism: different build parallelism => identical logical index.
"""

import glob
import hashlib

import numpy as np
import pandas as pd
import pytest

from parser_indexer_spark import codec
from parser_indexer_spark.build import build_index
from parser_indexer_spark.config import EngineConfig
from parser_indexer_spark.manifest import load_manifest
from parser_indexer_spark.search import Index
from parser_indexer_spark.transcripts import synthesize_pandas

CFG = EngineConfig(n_buckets=4, build_partitions=6, salt_df_threshold=300,
                   n_salts=3, chunk_bits=8)


def _logical_index_hash(index_dir: str) -> dict:
    """term -> sha1 over the decoded (doc_id, tf) postings — independent of
    block layout, segmentation, and file arrangement."""
    import pyarrow.parquet as pq
    files = glob.glob(f"{index_dir}/postings/seg=*/bucket=*/*.parquet")
    t = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    out = {}
    for term, g in t.groupby("term"):
        ds, ts = [], []
        for r in g.itertuples():
            ds.append(codec.delta_decode(codec.decode(r.docs_enc, r.num_docs),
                                         r.first_doc_id))
            ts.append(codec.decode(r.tfs_enc, r.num_docs).astype(np.int64))
        d = np.concatenate(ds)
        tf = np.concatenate(ts)
        order = np.argsort(d)
        h = hashlib.sha1(d[order].tobytes() + tf[order].tobytes()).hexdigest()
        out[term] = h
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(synthesize_pandas(1200)).cache()


def test_resume_after_failure(spark, corpus, tmp_path):
    a = str(tmp_path / "uninterrupted")
    b = str(tmp_path / "resumed")
    build_index(spark, corpus, a, CFG, segments=4)

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, b, CFG, segments=4, _fail_after_segments=2)
    # no commit yet: manifest absent
    with pytest.raises(FileNotFoundError):
        load_manifest(b)
    m = build_index(spark, corpus, b, CFG, segments=4, resume=True)
    assert m["n_segments"] == 4
    assert _logical_index_hash(a) == _logical_index_hash(b)
    # stats identical too
    ma = load_manifest(a)
    assert ma["stats"] == m["stats"]


def test_determinism_across_build_parallelism(spark, corpus, tmp_path):
    a = str(tmp_path / "p3")
    b = str(tmp_path / "p13")
    cfg_a = EngineConfig(n_buckets=4, build_partitions=3, salt_df_threshold=300,
                         n_salts=3, chunk_bits=8)
    cfg_b = EngineConfig(n_buckets=4, build_partitions=13, salt_df_threshold=300,
                         n_salts=3, chunk_bits=8)
    build_index(spark, corpus, a, cfg_a, segments=1)
    build_index(spark, corpus, b, cfg_b, segments=3)
    assert _logical_index_hash(a) == _logical_index_hash(b)
    ia, ib = Index(spark, a), Index(spark, b)
    for q, mode in [("spark join", "OR"), ("spark join", "AND"), ("w0005", "OR")]:
        ra = [(r.doc_id, r.score) for r in ia.search(q, k=10, mode=mode).collect()]
        rb = [(r.doc_id, r.score) for r in ib.search(q, k=10, mode=mode).collect()]
        assert ra == rb
