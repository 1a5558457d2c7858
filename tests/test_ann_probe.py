"""Materialized-ANN multi-probe (VERDICT r4 #8) [public: Lv et al. 2007
multi-probe LSH]: Hamming-1 probing must be a candidate-set SUPERSET of
the exact-bucket path (recall can only rise), keep the plan partition-
pruned, and leave returned cosines exact."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from parser_indexer_spark import ann


@pytest.fixture(scope="module")
def ann_setup(spark, tmp_path_factory):
    emb = (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
           .select("vec_id", "embedding"))
    out = str(tmp_path_factory.mktemp("annp") / "annidx")
    ann.build_ann_index(spark, emb, out, n_tables=8, n_planes=3)
    return emb, out


def _brute_topk(emb, qid, k):
    pdf = emb.toPandas()
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = M[list(ids).index(qid)]
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))
    return [int(ids[i]) for i in order if ids[i] != qid][:k]


def test_probe_recall_never_below_exact_bucket(spark, ann_setup):
    emb, out = ann_setup
    hits_exact = hits_probe = 0
    n_q = 8
    for qid in range(n_q):
        truth = set(_brute_topk(emb, qid, 10))
        base = {r.vec_id for r in
                ann.ann_query(spark, emb, out, qid, k=10).collect()}
        probed = {r.vec_id for r in
                  ann.ann_query(spark, emb, out, qid, k=10,
                                probe_hamming1=True).collect()}
        hits_exact += len(base & truth)
        hits_probe += len(probed & truth)
    r_exact = hits_exact / (10 * n_q)
    r_probe = hits_probe / (10 * n_q)
    assert r_probe >= r_exact, (r_probe, r_exact)
    assert r_probe >= 0.9, r_probe


def test_probe_candidates_superset_and_scores_exact(spark, ann_setup):
    emb, out = ann_setup
    base = {(r.vec_id, r.cosine) for r in
            ann.ann_query(spark, emb, out, 3, k=50).collect()}
    probed = {(r.vec_id, r.cosine) for r in
              ann.ann_query(spark, emb, out, 3, k=10 ** 6,
                            probe_hamming1=True).collect()}
    # every exact-bucket hit survives probing with an identical cosine
    assert base <= probed


def test_probe_plan_stays_partition_pruned(spark, ann_setup):
    emb, out = ann_setup
    import os
    meta = ann.CATALOG.read_meta(os.path.join(out, "_ann_meta.json"))
    q = (spark.read.parquet(os.path.join(out, "vectors"))
         .where(F.col("vec_id") == 0).first())
    cond = None
    for t in range(meta["n_tables"]):
        bs = [int(q[f"b{t}"])] + [int(q[f"b{t}"]) ^ (1 << i)
                                  for i in range(meta["n_planes"])]
        c = (F.col("t") == t) & (F.col("b").isin(bs))
        cond = c if cond is None else (cond | c)
    plan = (spark.read.parquet(os.path.join(out, "buckets")).where(cond)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    # the scan lists only (t, b) partition predicates — no full-table scan
    assert "PartitionFilters: []" not in plan
