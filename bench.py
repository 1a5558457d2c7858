"""Benchmark harness — prints ONE JSON line (driver contract).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

  1. cold build of the inverted index over testdata documents (A-C path)
  2. headline BM25 queries + per-query wall times
  3. relational operator suite (SURVEY.md §2.E)
  4. transcripts micro-build (synthetic, FIXTURES.md §1) -> turns/sec
  5. fixture-query latency sample -> p95

The N-vs-4N scaling evidence (BASELINE.md protocol) is produced by
tools/bench_scaling.py (two subprocesses at local[8] / local[32]); this
per-round bench stays single-config so the driver's number is comparable
round over round.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "200000"))


def main() -> None:
    from parser_indexer_spark.build import build_index
    from parser_indexer_spark.config import EngineConfig
    from parser_indexer_spark.search import Index
    from parser_indexer_spark.session import get_spark
    from parser_indexer_spark.transcripts import synthesize_spark
    from parser_indexer_spark import relops

    spark = get_spark(app="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    t_all = time.perf_counter()

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 4)
        return out

    # 1. cold documents index build
    idx_dir = "/tmp/bench_docs_index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = EngineConfig(n_buckets=8, build_partitions=CPUS,
                       salt_df_threshold=100_000, chunk_bits=12)
    timed("build_documents_index",
          lambda: build_index(spark, docs, idx_dir, cfg, segments=1,
                              doc_id_col="doc_id"))
    ix = Index(spark, idx_dir)

    # positional-payload cost isolation (r3): same build without pos_enc
    from dataclasses import replace as _cfgreplace
    nopos_dir = "/tmp/bench_docs_index_nopos"
    shutil.rmtree(nopos_dir, ignore_errors=True)
    timed("build_documents_index_nopos",
          lambda: build_index(spark, docs, nopos_dir,
                              _cfgreplace(cfg, positions=False), segments=1,
                              doc_id_col="doc_id"))

    # 2. headline BM25 queries
    for name, (q, mode) in {
        "q_bm25_or": ("spark join", "OR"),
        "q_bm25_and": ("hash agg scan", "AND"),
        "q_bm25_head": ("the", "OR"),
        "q_bm25_rare": ("vector window dup", "OR"),
    }.items():
        timed(name, lambda q=q, mode=mode: ix.search(q, k=10, mode=mode).collect())
    # filtered query (broadcast-into-scorer path) + deep-paging cursor
    timed("q_bm25_filtered",
          lambda: ix.search("spark join", k=10,
                            doc_filter="lang = 'en'").collect())
    p1 = ix.search("spark join", k=10).collect()
    cur = (p1[-1]["score"], p1[-1]["doc_id"])
    timed("q_bm25_page2",
          lambda: ix.search("spark join", k=10, after=cur).collect())
    # positional path (D-phrase, r3)
    timed("q_phrase",
          lambda: ix.phrase("spark join", k=10).collect())
    timed("q_phrase_slop",
          lambda: ix.phrase("filter window", k=10, slop=2).collect())
    # round-5 Boolean/expansion surface via the query-string router
    # (D1/D19/D20): MUST_NOT exclusion, mixed MUST+SHOULD, prefix, fuzzy
    timed("q_bm25_not",
          lambda: ix.query("spark join -scan", k=10).collect())
    timed("q_bm25_must",
          lambda: ix.query("+spark join scan", k=10).collect())
    timed("q_prefix", lambda: ix.query("spar*", k=10).collect())
    timed("q_fuzzy", lambda: ix.query("spar~1", k=10).collect())
    timed("q_regexp", lambda: ix.query("/s[pc]a[rn].*/", k=10).collect())
    # full-match-set faceting + export (Solr facet.field / facet.range /
    # /export analogues, r5); export is counted, not collected — the
    # match set belongs on the executors, not the bench driver
    timed("q_facets",
          lambda: ix.search_facets("spark join", ["lang", "source"]).collect())
    timed("q_facet_range",
          lambda: ix.search_facet_range("spark join", "n_chars",
                                        0, 4000, 250).collect())
    timed("q_export",
          lambda: ix.export_matches("spark join", columns=("lang",)).count())
    timed("q_collapse",
          lambda: ix.search_collapse("spark join", "source", k=10).collect())
    timed("q_facet_stats",
          lambda: ix.search_facet_stats("spark join", "n_chars").collect())
    timed("q_sort_by",
          lambda: ix.search_sort_by("spark join", "n_chars", k=10).collect())

    # 3. relational suite
    for name in ["project_filter", "join_broadcast", "join_sortmerge",
                 "join_semi", "agg_stats", "facet_count", "facet_percentile",
                 "cube_lang_source", "window_rank", "window_lag_frame",
                 "topk_orders", "topk_orders_page2", "str_tokens",
                 "array_explode_tf", "json_extract", "dedup_exact",
                 "minhash_signature", "dedup_near_pairs", "simhash64",
                 "lang_trigram", "zscore_grouped", "ann_cosine",
                 "ann_cosine_lsh", "ann_cosine_lsh_multi"]:
        fn = getattr(relops, name)
        timed(name, lambda fn=fn: fn(spark, SF_DIR).collect())
    from parser_indexer_spark import multimodal as mm
    timed("media_features",
          lambda: mm.media_byte_stats(mm.media_table(spark, SF_DIR)).collect())

    # 4. transcripts micro-build throughput (corpus materialized first so
    # the build times the build, not repeated synthesis per action)
    tr_dir = "/tmp/bench_transcripts_index"
    tr_src = f"/tmp/bench_transcripts_src_{BENCH_TURNS}"
    shutil.rmtree(tr_dir, ignore_errors=True)
    if not os.path.exists(f"{tr_src}/_SUCCESS"):
        synthesize_spark(spark, BENCH_TURNS, partitions=CPUS) \
            .write.mode("overwrite").parquet(tr_src)
    tdf = spark.read.parquet(tr_src)
    tcfg = EngineConfig(n_buckets=16, build_partitions=CPUS,
                        salt_df_threshold=20_000, n_salts=8, chunk_bits=14)
    m = timed("build_transcripts_index",
              lambda: build_index(spark, tdf, tr_dir, tcfg, segments=1,
                                  input_desc=f"synthetic {BENCH_TURNS}"))
    n_turns = m["stats"]["n_docs"]
    turns_per_sec = n_turns / times["build_transcripts_index"]

    # 5. fixture-query latency p95 on the transcripts index
    tix = Index(spark, tr_dir)
    fixture_queries = [("spark", "OR"), ("join", "OR"), ("w1999", "OR"),
                       ("spark join", "OR"), ("spark join", "AND"),
                       ("hash agg", "AND"), ("sort merge w0042", "OR"),
                       ("window partition order", "AND"),
                       ("SPARK, Join!", "OR"), ("w0000 w0100 w0500", "OR")]
    lat = []
    for rep in range(2):
        for q, mode in fixture_queries:
            t0 = time.perf_counter()
            tix.search(q, k=10, mode=mode).collect()
            lat.append(time.perf_counter() - t0)
    lat.sort()
    p95 = lat[int(0.95 * (len(lat) - 1))]
    times["query_p95"] = round(p95, 4)

    total = round(time.perf_counter() - t_all, 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "bench_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extra": {
            "cpus": CPUS,
            "bench_turns": n_turns,
            "index_build_turns_per_sec": round(turns_per_sec, 1),
            "query_p95_sec": round(p95, 4),
            "transcripts_index_stats": m["stats"],
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
