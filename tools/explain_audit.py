"""Physical-plan audit (SURVEY.md §4) — regenerates PLANS.md.

Verifies, with `.explain("formatted")` output, that the layout delivers what
§4 promises: bucket PartitionFilters + term PushedFilters on the query path,
column pruning on the build scan, broadcast joins where hinted, and
whole-stage codegen everywhere outside the three Arrow stages.

Run: python tools/explain_audit.py  (needs a built t_tiny-style index; it
builds a small one under /tmp if absent).
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parser_indexer_spark.session import get_spark  # noqa: E402


def cap_explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import shutil

    import pyspark.sql.functions as F

    from parser_indexer_spark import relops
    from parser_indexer_spark.build import build_index, read_postings
    from parser_indexer_spark.config import EngineConfig
    from parser_indexer_spark.search import Index
    from parser_indexer_spark.transcripts import synthesize_pandas

    spark = get_spark(app="explain", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    idx = "/tmp/explain_audit_index_r4"   # r4: impact sidecars included
    if not os.path.exists(f"{idx}/_manifest.json"):
        shutil.rmtree(idx, ignore_errors=True)
        df = spark.createDataFrame(synthesize_pandas(2000))
        build_index(spark, df, idx,
                    EngineConfig(n_buckets=8, build_partitions=8,
                                 salt_df_threshold=500, chunk_bits=9,
                                 impact_df_threshold=200),
                    segments=2)

    ix = Index(spark, idx)
    sections = []

    # 1. query-path postings scan: bucket partition pruning + term pushdown
    from parser_indexer_spark.build import term_bucket
    terms = ["spark", "join"]
    buckets = sorted({term_bucket(t, ix.cfg.n_buckets) for t in terms})
    scan = (read_postings(spark, idx)
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms))
            .select("term", "chunk", "first_doc_id", "num_docs",
                    "max_tf", "min_dl", "docs_enc", "tfs_enc", "dls_enc"))
    sections.append(("Query-path postings scan (D2): expect PartitionFilters "
                     "on bucket + PushedFilters on term + pruned ReadSchema",
                     cap_explain(scan)))

    # 2. full search plan (one chunk shuffle + Arrow scorer + TakeOrdered)
    sections.append(("Full top-k search plan (D3-D8)",
                     cap_explain(ix.search("spark join", k=10, mode="AND"))))

    # 3. build scan column pruning: only (doc_id, text) read from docs
    from parser_indexer_spark.analyze import TOKENIZE_TF_SCHEMA, tokenize_tf_batches
    docs_scan = (spark.read.parquet(f"{idx}/docs")
                 .where(F.col("seg") == 0).select("doc_id", "text")
                 .mapInPandas(tokenize_tf_batches, TOKENIZE_TF_SCHEMA))
    sections.append(("Build tokenize scan (C1-C2): expect ReadSchema = "
                     "doc_id,text only + seg PartitionFilters",
                     cap_explain(docs_scan)))

    # 4. broadcast join on the relational path
    sections.append(("join_broadcast (E): expect BroadcastHashJoin",
                     cap_explain(relops.join_broadcast(spark, "/root/testdata/sf0.001"))))
    sections.append(("join_sortmerge (E): expect SortMergeJoin despite small side",
                     cap_explain(relops.join_sortmerge(spark, "/root/testdata/sf0.001"))))
    sections.append(("project_filter (E): expect PushedFilters on lang/n_chars",
                     cap_explain(relops.project_filter(spark, "/root/testdata/sf0.001"))))

    # 5. filtered search: broadcast-into-scorer path must NOT semi-join
    filtered = ix.search("spark join", k=10, doc_filter="role = 'assistant'")
    sections.append(("Filtered top-k search (D9): allowed set broadcast into "
                     "the scorer — expect NO LeftSemi join, same "
                     "TakeOrderedAndProject shape as the unfiltered plan",
                     cap_explain(filtered)))

    # 6. LSH near-dup: candidates via equi-joins only — never a cartesian
    ndp = relops.dedup_near_pairs(spark, "/root/testdata/sf0.001")
    sections.append(("dedup_near_pairs (LSH): expect hash/sort-merge "
                     "equi-joins on band+bh and doc ids; NO "
                     "CartesianProduct / BroadcastNestedLoopJoin",
                     cap_explain(ndp)))

    # 7. phrase query: same one-shuffle chunk plan, pos_enc in ReadSchema
    sections.append(("Phrase top-k plan (D15): same pruned scan + single "
                     "chunk exchange as search(); ReadSchema additionally "
                     "carries pos_enc (positional payload)",
                     cap_explain(ix.phrase("spark join", k=10))))

    # 8. r4: multi-table ANN — ONE embeddings scan with an OR predicate
    # (the r3 16-way union was the heaviest bench query; VERDICT r3 #5)
    sections.append(("ann_cosine_lsh_multi (r4): expect exactly ONE "
                     "embeddings parquet scan (OR-of-band-equalities "
                     "predicate), no Union of 16 scans, no distinct "
                     "shuffle before the re-rank",
                     cap_explain(relops.ann_cosine_lsh_multi(
                         spark, "/root/testdata/sf0.001"))))

    # 9. r4: materialized ANN index — partition-pruned bucket read
    from parser_indexer_spark import ann as annmod
    ann_dir = "/tmp/explain_audit_ann"
    if not os.path.exists(f"{ann_dir}/_ann_meta.json"):
        shutil.rmtree(ann_dir, ignore_errors=True)
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        annmod.build_ann_index(spark, emb, ann_dir)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sections.append(("ann_index_lookup (r4): expect PartitionFilters on "
                     "(t, b) of the materialized bucket table + broadcast "
                     "semi-join of the candidate ids into embeddings",
                     cap_explain(annmod.ann_query(spark, emb, ann_dir))))

    # 10. r4: impact-sidecar read — bucket partition pruning + term pushdown
    if ix._impacts_df is not None:
        imp_scan = (ix._impacts_df
                    .where(F.col("bucket").isin(buckets))
                    .where(F.col("term").isin(terms)))
        sections.append(("Impact sidecar read (D17): expect PartitionFilters "
                         "on bucket + PushedFilters on term",
                         cap_explain(imp_scan)))

    # 11. r5: facet over search results — full-match scorer feeding a
    # left-semi join into the doc store and ONE aggregate; nothing sorts
    sections.append(("search_facets (D23, r5): expect the mapInPandas "
                     "scorer -> left-semi join into the docs scan -> one "
                     "partial+final HashAggregate; NO TakeOrderedAndProject,"
                     " NO global Sort (the full-match-set path)",
                     cap_explain(ix.search_facets("spark join",
                                                  ["role", "tool"]))))

    # 12. r6: language ID as ONE Arrow/numpy kernel pass — no Generate,
    # no join, no aggregate (the r5 explode+join plan became a single
    # MapInPandas; scores bit-identical, tests/test_r06_optim.py)
    sections.append(("lang_trigram (r6 kernel): expect Scan -> (optional "
                     "RoundRobin Exchange) -> ONE MapInPandas — no "
                     "Generate, no join, no aggregate",
                     cap_explain(relops.lang_trigram(
                         spark, "/root/testdata/sf0.001"))))

    # 13. r6: minhash signatures — same single-kernel shape (was explode
    # + groupBy with 4 md5 aggregates)
    sections.append(("minhash_signature (r6 kernel): expect Scan -> "
                     "RoundRobin Exchange -> ONE MapInPandas — no "
                     "Generate, no HashAggregate",
                     cap_explain(relops.minhash_signature(
                         spark, "/root/testdata/sf0.001"))))

    out = ["# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
           "", "Checks SURVEY.md §4's free-vs-custom claims against the real "
           "Catalyst output. Regenerate after plan-affecting changes.", ""]
    for title, body in sections:
        out += [f"## {title}", "", "```", body.rstrip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")

    # quick grep-style assertions so CI can catch regressions
    text = "\n".join(s[1] for s in sections)
    assert "PartitionFilters" in text
    assert "PushedFilters" in text
    assert "BroadcastHashJoin" in sections[3][1]
    assert "SortMergeJoin" in sections[4][1]
    assert "LeftSemi" not in sections[6][1]
    assert "CartesianProduct" not in sections[7][1]
    assert "BroadcastNestedLoopJoin" not in sections[7][1]
    # r4: the multi-table ANN plan must contain exactly ONE embeddings
    # scan — explain("formatted") prints each physical scan twice (tree
    # node + detail section), so one scan == two string occurrences
    assert sections[9][1].count("Scan parquet") == 2, \
        "ann_cosine_lsh_multi should scan embeddings exactly once"
    assert "Union" not in sections[9][1]
    print("plan assertions OK")


if __name__ == "__main__":
    main()
