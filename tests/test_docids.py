"""M2 tests — doc_ids are dense, start at 0, and are order-isomorphic to the
(conv_id, turn_idx) total order (SURVEY.md §7 M2)."""

import pyspark.sql.functions as F

from parser_indexer_spark.docids import assign_doc_ids
from parser_indexer_spark.transcripts import synthesize_pandas


def _make_df(spark, n=2000):
    return spark.createDataFrame(synthesize_pandas(n))


def test_doc_ids_dense_and_ordered(spark):
    df = _make_df(spark)
    n = df.count()
    out = assign_doc_ids(df, partitions=7).cache()
    try:
        assert out.count() == n
        ids = out.agg(F.min("doc_id"), F.max("doc_id"),
                      F.countDistinct("doc_id")).first()
        assert ids == (0, n - 1, n)
        # order isomorphism: doc_id ascending == (conv_id, turn_idx) ascending
        rows = (out.select("conv_id", "turn_idx", "doc_id")
                   .orderBy("doc_id").collect())
        keys = [(r.conv_id, r.turn_idx) for r in rows]
        assert keys == sorted(keys)
    finally:
        out.unpersist()


def test_doc_ids_stable_across_partition_counts(spark):
    df = _make_df(spark, 1500)
    a = {(r.conv_id, r.turn_idx): r.doc_id
         for r in assign_doc_ids(df, partitions=3).collect()}
    b = {(r.conv_id, r.turn_idx): r.doc_id
         for r in assign_doc_ids(df, partitions=13).collect()}
    assert a == b


def test_more_partitions_than_rows(spark):
    df = _make_df(spark, 20).limit(5)
    out = assign_doc_ids(df, partitions=16).collect()
    assert sorted(r.doc_id for r in out) == [0, 1, 2, 3, 4]
