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


def test_simhash64_identical_docs_identical_bands(spark):
    d = spark.createDataFrame(
        [(0, SIM_DOCS[0][1]), (1, SIM_DOCS[0][1])], "doc_id long, text string")
    a, b = sorted(relops.simhash64_df(d).collect(), key=lambda r: r["doc_id"])
    assert [a[f"sh{j}"] for j in range(4)] == [b[f"sh{j}"] for j in range(4)]
