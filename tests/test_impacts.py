"""Impact sidecar (head-term early exit + theta seeding) — VERDICT r3 #1.

Public basis: Lucene 8 per-block impacts / Anh & Moffat 2006 impact
ordering; MaxScore essential lists Turtle & Flood 1995. Contract under
test: the sidecar fast path and the MaxScore block skipping NEVER change a
result — only how much gets decoded.
"""

import numpy as np
import pytest

from parser_indexer_spark.build import build_index
from parser_indexer_spark.config import EngineConfig
from parser_indexer_spark.manifest import CATALOG, IndexPaths
from parser_indexer_spark.oracle import OracleIndex
from parser_indexer_spark.search import Index

IMP_TURNS = 4000
IMP_CFG = EngineConfig(n_buckets=8, build_partitions=8,
                       salt_df_threshold=1000, n_salts=4, chunk_bits=9,
                       impact_df_threshold=50, impact_top=32)


@pytest.fixture(scope="module")
def imp_corpus():
    from parser_indexer_spark.transcripts import synthesize_pandas
    pdf = synthesize_pandas(IMP_TURNS)
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def imp_index(spark, imp_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("impidx") / "imp")
    df = spark.createDataFrame(imp_corpus.sample(frac=1.0, random_state=3))
    build_index(spark, df, out, IMP_CFG, segments=1, input_desc="imp")
    return out


@pytest.fixture(scope="module")
def imp_engine(spark, imp_index):
    return Index(spark, imp_index)


@pytest.fixture(scope="module")
def imp_oracle(imp_corpus):
    return OracleIndex(range(len(imp_corpus)), imp_corpus["text"].tolist())


def head_term(engine):
    """A term guaranteed sidecar-covered (df above the threshold)."""
    t = "spark"
    assert engine.term_stats([t])[t] > IMP_CFG.impact_df_threshold
    return t


def test_sidecar_written_with_bounds(spark, imp_engine, imp_index):
    man = imp_engine.manifest
    n_imp = man["segments"][0]["n_impact_terms"]
    assert n_imp > 0
    rows = imp_engine._impacts_df.toPandas()
    bounds = rows[rows["doc_id"] < 0]
    # every impact term has bound rows (incl. the tf=0 coverage marker)
    assert bounds["term"].nunique() == n_imp
    assert (bounds.groupby(["term", "seg"])["tf"].min() == 0).all()
    # every sidecar is capped at impact_top candidates per (term, seg)
    per = rows[rows["doc_id"] >= 0].groupby(["term", "seg"]).size()
    assert int(per.max()) <= IMP_CFG.impact_top
    # skyline rows carry one min-dl per distinct excluded tf
    t = per.idxmax()[0]
    bt = bounds[bounds["term"] == t]
    assert bt["tf"].is_unique
    assert (bt["dl"] >= 1).all()


def test_fast_path_taken_and_rank_identical(imp_engine, imp_oracle,
                                            monkeypatch):
    t = head_term(imp_engine)
    # the single-head-term query must be answered WITHOUT the distributed
    # scan: poison _search_terms and expect no call
    called = {}
    orig = imp_engine._search_terms

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(imp_engine, "_search_terms", spy)
    got = [(r.doc_id, r.score) for r in imp_engine.search(t, k=10).collect()]
    assert "yes" not in called, "sidecar fast path was not taken"
    exp = imp_oracle.search(t, k=10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for g, e in zip(got, exp):
        assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_fast_path_matches_full_scan_many_terms(imp_engine):
    rows = imp_engine._impacts_df.toPandas()
    terms = rows[rows["doc_id"] >= 0]["term"].drop_duplicates().tolist()[:8]
    for t in terms:
        fast = [(r.doc_id, r.score)
                for r in imp_engine.search(t, k=5).collect()]
        dfs = imp_engine.term_stats([t])
        from parser_indexer_spark.search import bm25_idf
        idf = {t: bm25_idf(imp_engine.stats["n_docs"], dfs[t])}
        slow = [(r.doc_id, r.score) for r in imp_engine._search_terms(
            [t], dfs, idf, imp_engine.stats["avg_dl"], k=5, mode="OR",
            doc_filter=None, prune=False, score_partitions=None,
            after=None, seed_theta=False).collect()]
        assert fast == slow, t


def test_fallback_when_k_exceeds_sidecar(imp_engine, imp_oracle):
    t = head_term(imp_engine)
    k = IMP_CFG.impact_top + 10      # cannot be answered from the sidecar
    got = [r.doc_id for r in imp_engine.search(t, k=k).collect()]
    exp = [d for d, _ in imp_oracle.search(t, k=k)]
    assert got == exp


def test_fallback_under_doc_filter(imp_engine, imp_corpus, imp_oracle):
    t = head_term(imp_engine)
    got = [r.doc_id for r in
           imp_engine.search(t, k=10, doc_filter="role = 'user'").collect()]
    allowed = set(imp_corpus.index[imp_corpus["role"] == "user"])
    exp = [d for d, _ in imp_oracle.search(t, k=10 ** 9) if d in allowed][:10]
    assert got == exp


def test_no_separation_falls_back(spark, tmp_path):
    """Uniform corpus: every posting has identical (tf, dl), so the k-th
    sidecar score can never STRICTLY beat the rest bound — the fast path
    must return None and the full scan must still answer correctly."""
    import pandas as pd
    n = 300
    pdf = pd.DataFrame({
        "conv_id": [f"c{i:04d}" for i in range(n)],
        "turn_idx": [0] * n,
        "role": ["user"] * n,
        "text": ["alpha beta gamma"] * n,
        "tool": [""] * n,
        "ts": pd.Timestamp("2026-01-01"),
    })
    out = str(tmp_path / "uniform")
    cfg = EngineConfig(n_buckets=4, build_partitions=4, chunk_bits=6,
                       impact_df_threshold=20, impact_top=16)
    build_index(spark, spark.createDataFrame(pdf), out, cfg, segments=1)
    ix = Index(spark, out)
    dfs = ix.term_stats(["alpha"])
    assert dfs["alpha"] == n
    from parser_indexer_spark.search import bm25_idf
    idf_a = bm25_idf(n, n)
    assert ix._impact_topk_single("alpha", idf_a, n, 10) is None
    got = [r.doc_id for r in ix.search("alpha", k=10).collect()]
    assert got == list(range(10))    # tie-break by doc_id ascending


def test_multi_segment_coverage_gap_falls_back(spark, imp_corpus, tmp_path):
    """Append a batch too small to re-cross the impact threshold: the term
    now has UNCOVERED postings in the new segment, so the fast path must
    detect the gap via the per-segment dicts and fall back — and the
    fallback must see the appended docs."""
    from parser_indexer_spark.incremental import append_segment
    out = str(tmp_path / "cov")
    head = imp_corpus.iloc[:2000]
    build_index(spark, spark.createDataFrame(head), out, IMP_CFG, segments=1)
    tail = imp_corpus.iloc[2000:2050].copy()
    tail["text"] = "spark " + tail["text"]
    append_segment(spark, out, spark.createDataFrame(tail), IMP_CFG)
    ix = Index(spark, out)
    assert len(ix.manifest["segments"]) == 2
    # term present in seg 1 but below threshold there
    segs = ix._segs_containing("spark")
    assert 1 in segs
    assert ix._impact_topk_single(
        "spark", 1.0, ix.term_stats(["spark"])["spark"], 10) is None
    got = [r.doc_id for r in ix.search("spark", k=2100).collect()]
    # every appended doc contains 'spark' and must be found
    assert set(range(2000, 2050)).issubset(set(got))


def test_theta0_seed_lossless(imp_engine):
    """Multi-term queries: the sidecar theta0 seed must not change any
    result vs the unpruned exhaustive scan."""
    for q, mode in [("spark join", "OR"), ("spark join", "AND"),
                    ("hash agg scan", "OR"), ("window sort spark", "AND")]:
        terms = sorted(set(q.split()))
        dfs = imp_engine.term_stats(terms)
        live = [t for t in terms if dfs[t] > 0]
        if live:
            from parser_indexer_spark.search import bm25_idf
            idf = {t: bm25_idf(imp_engine.stats["n_docs"], dfs[t])
                   for t in live}
            th = imp_engine._impact_theta0(live, idf,
                                           imp_engine.stats["avg_dl"],
                                           10, mode)
            assert th >= 0.0
        a = [(r.doc_id, r.score) for r in
             imp_engine.search(q, k=10, mode=mode, prune=True).collect()]
        b = [(r.doc_id, r.score) for r in
             imp_engine.search(q, k=10, mode=mode, prune=False).collect()]
        assert a == b, (q, mode)


def test_theta0_is_positive_for_head_pair(imp_engine):
    """The seed actually fires for a two-head-term query (both terms have
    sidecars), giving the scorer a hot theta before any chunk is read."""
    from parser_indexer_spark.search import bm25_idf
    terms = sorted(["spark", "join"])
    dfs = imp_engine.term_stats(terms)
    idf = {t: bm25_idf(imp_engine.stats["n_docs"], dfs[t]) for t in terms}
    th_or = imp_engine._impact_theta0(terms, idf,
                                      imp_engine.stats["avg_dl"], 10, "OR")
    th_and = imp_engine._impact_theta0(terms, idf,
                                       imp_engine.stats["avg_dl"], 10, "AND")
    assert th_or > 0.0
    assert th_and >= 0.0


def test_compaction_rewrites_sidecars(spark, imp_corpus, tmp_path):
    """Tiered compaction of two sidecar-bearing segments produces a new
    segment whose sidecar covers the union (fast path stays available)."""
    from parser_indexer_spark.merge import compact_segments
    out = str(tmp_path / "cmp")
    build_index(spark, spark.createDataFrame(imp_corpus), out, IMP_CFG,
                segments=2)
    man = compact_segments(spark, out, [0, 1])
    assert len(man["segments"]) == 1
    new_seg = man["segments"][0]
    assert new_seg["n_impact_terms"] > 0
    ix = Index(spark, out)
    t = "spark"
    assert ix._impact_topk_single(
        t, 1.0, ix.term_stats([t])[t], 5) is not None
