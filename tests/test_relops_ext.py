"""Round-2 relational extensions: keyset deep pagination continuity,
percentile facets, approx_count_distinct sanity band, 64-bit SimHash with
Hamming-band near-dup probing."""

import pyspark.sql.functions as F
import pytest

from parser_indexer_spark import relops


def test_keyset_pagination_continuity(spark, sf_dir):
    """page1 + page2 == rows 1..40 of the full ordering, no overlap — the
    keyset predicate reproduces OFFSET semantics without the offset scan."""
    o = relops.T(spark, sf_dir, "orders")
    full = (o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
             .select("o_orderkey", "o_totalprice").limit(40).collect())
    p1 = relops.topk_orders(spark, sf_dir).collect()
    p2 = relops.topk_orders_page2(spark, sf_dir).collect()
    got = [(r["o_orderkey"], r["o_totalprice"]) for r in p1 + p2]
    exp = [(r["o_orderkey"], r["o_totalprice"]) for r in full]
    assert got == exp
    assert len({g[0] for g in got}) == len(got)  # no overlap


def test_approx_count_distinct_band(spark, sf_dir):
    """D10 approx facets: HLL estimate within 10% of exact per group (Spark
    default rsd=5%), and the exact leg matches countDistinct."""
    e = relops.T(spark, sf_dir, "events")
    rows = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact"),
                  F.approx_count_distinct("user_id").alias("approx"))
             .collect())
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.10 * r["exact"]), \
            f"{r['event_type']}: approx {r['approx']} vs exact {r['exact']}"


def test_simhash64_bands_range(spark, sf_dir):
    rows = relops.simhash64(spark, sf_dir).collect()
    docs = relops.T(spark, sf_dir, "documents")
    n_nonempty = docs.where(
        F.size(F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                        lambda x: x != "")) > 0).count()
    assert len(rows) == n_nonempty
    for r in rows[:50]:
        for j in range(4):
            assert 0 <= r[f"sh{j}"] <= 0xFFFF


SIM_DOCS = [
    (0, "spark join filter window merge sort hash agg shuffle partition "
        "broadcast index query scan table column row group order limit "
        "select count distinct union except stream batch schema vector"),
    (1, "spark join filter window merge sort hash agg shuffle partition "
        "broadcast index query scan table column row group order limit "
        "select count distinct union except stream batch schema tensor"),
    (2, "a totally unrelated document about cooking pasta with tomato "
        "sauce basil garlic olive oil and fresh parmesan cheese served "
        "with red wine on a sunny terrace in the late summer evening"),
]


def test_simhash_hamming_band_probe(spark):
    """One-token mutations keep most majority bits, so the 4x16-bit band
    probe pairs them; the unrelated doc pairs with neither. Deterministic
    (md5), so this pins exact behavior, not a probability."""
    d = spark.createDataFrame(SIM_DOCS, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in relops.simhash_band_candidates(d).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


LANG_SENTS = [
    (0, "the quick brown fox jumps over the lazy dog and the cat is "
        "sleeping in the warm sun for hours", "en"),
    (1, "el gobierno de la nación anunció que los estudiantes están "
        "contentos con la situación de la educación", "es"),
    (2, "der schnelle braune fuchs springt über den faulen hund und die "
        "katze schläft in der warmen sonne", "de"),
    (3, "le gouvernement de la france annonce que les étudiants sont "
        "contents de la situation des écoles", "fr"),
    (4, "les travaux pour voir les oiseaux près des châteaux français "
        "étaient connus de tous les habitants du pays", "fr"),
    (5, "los niños estaban jugando en el parque cuando empezó a llover y "
        "corrieron hacia la casa de sus abuelos", "es"),
    (6, "die kinder spielten im park als es anfing zu regnen und sie "
        "liefen schnell nach hause zu ihren eltern", "de"),
    (7, "machine learning systems require large amounts of training data "
        "for the models to generalize effectively", "en"),
]


def test_lang_trigram_classifies_real_sentences(spark):
    d = spark.createDataFrame([(i, t) for i, t, _ in LANG_SENTS],
                              "doc_id long, text string")
    got = {r["doc_id"]: r["lang_id"]
           for r in relops.lang_trigram_df(d).collect()}
    for i, _, lang in LANG_SENTS:
        assert got[i] == lang, f"doc {i}: {got[i]} != {lang}"


def test_zscore_grouped_properties(spark, sf_dir):
    """Per-group mean(z) ~ 0 and std(z) ~ 1 (the grouped-map contract)."""
    import pandas as pd
    pdf = relops.zscore_grouped(spark, sf_dir).toPandas()
    docs = relops.T(spark, sf_dir, "documents").count()
    assert len(pdf) == docs
    for _, g in pdf.groupby("source"):
        if len(g) > 2 and g["z_chars"].abs().sum() > 0:
            assert abs(g["z_chars"].mean()) < 1e-2
            assert abs(g["z_chars"].std(ddof=1) - 1.0) < 1e-2


def test_simhash64_identical_docs_identical_bands(spark):
    d = spark.createDataFrame(
        [(0, SIM_DOCS[0][1]), (1, SIM_DOCS[0][1])], "doc_id long, text string")
    a, b = sorted(relops.simhash64_df(d).collect(), key=lambda r: r["doc_id"])
    assert [a[f"sh{j}"] for j in range(4)] == [b[f"sh{j}"] for j in range(4)]


def test_ann_multi_table_recall(spark, sf_dir):
    """L-table LSH ANN must recover >= 0.9 of the exact top-10 (VERDICT r2
    #8): independent tables make a miss require disagreement in EVERY
    table. Single-table and multi-probe variants are strictly weaker
    candidate generators, so multi-table recall must dominate single."""
    from parser_indexer_spark import relops

    exact = [r.vec_id for r in relops.ann_cosine(spark, sf_dir).collect()][:10]
    multi = [r.vec_id for r in
             relops.ann_cosine_lsh_multi(spark, sf_dir).collect()]
    single = [r.vec_id for r in
              relops.ann_cosine_lsh(spark, sf_dir).collect()]
    recall_multi = len(set(exact) & set(multi)) / len(exact)
    recall_single = len(set(exact) & set(single)) / len(exact)
    assert recall_multi >= 0.9
    assert recall_multi >= recall_single
