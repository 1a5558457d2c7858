"""spark-submit entry point (north rule: `run via spark-submit --py-files`).

Usage (cluster):
    zip -r engine.zip parser_indexer_spark
    spark-submit --py-files engine.zip -m parser_indexer_spark.cli build \
        --input <parquet-or-table> --out <index-dir> [--segments N] ...
    spark-submit --py-files engine.zip -m parser_indexer_spark.cli search \
        --index <index-dir> --query "spark join" [--k 10] [--mode OR]
    spark-submit --py-files engine.zip -m parser_indexer_spark.cli merge \
        --src <index-dir> --dst <index-dir>

Locally the same module runs with plain `python -m parser_indexer_spark.cli`
(the session helper creates a local[N] master when none is configured).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="parser_indexer_spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True, help="parquet path of transcripts")
    b.add_argument("--out", required=True)
    b.add_argument("--segments", type=int, default=1)
    b.add_argument("--doc-id-col", default=None)
    b.add_argument("--buckets", type=int, default=16)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--salt-threshold", type=int, default=100_000)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--stopwords", default=None,
                   help="comma-separated stopword list (analyzer option)")
    b.add_argument("--codec", choices=["for", "varint"], default="for")

    s = sub.add_parser("search", help="top-k BM25 query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--mode", choices=["OR", "AND"], default="OR")
    s.add_argument("--filter", default=None)
    s.add_argument("--after", default=None,
                   help="deep-paging cursor 'score,doc_id' (from the last "
                        "hit of the previous page)")

    m = sub.add_parser("merge", help="compact segments (C10)")
    m.add_argument("--src", required=True)
    m.add_argument("--dst", required=True)

    args = ap.parse_args(argv)

    from parser_indexer_spark.session import get_spark
    spark = get_spark(app=f"pis-{args.cmd}", master=args.master)

    if args.cmd == "build":
        from parser_indexer_spark.build import build_index
        from parser_indexer_spark.config import EngineConfig
        cfg = EngineConfig(n_buckets=args.buckets,
                           build_partitions=args.partitions,
                           salt_df_threshold=args.salt_threshold,
                           codec=args.codec,
                           stopwords=tuple(args.stopwords.split(","))
                           if args.stopwords else ())
        df = spark.read.parquet(args.input)
        t0 = time.perf_counter()
        manifest = build_index(spark, df, args.out, cfg,
                               segments=args.segments,
                               input_desc=args.input,
                               resume=not args.no_resume,
                               doc_id_col=args.doc_id_col)
        wall = time.perf_counter() - t0
        print(json.dumps({"built": args.out, "wall_sec": round(wall, 3),
                          "stats": manifest["stats"],
                          "turns_per_sec": round(manifest["stats"]["n_docs"] / wall, 1)}))
    elif args.cmd == "search":
        from parser_indexer_spark.search import Index
        ix = Index(spark, args.index)
        after = None
        if args.after:
            s_str, d_str = args.after.split(",")
            after = (float(s_str), int(d_str))
        t0 = time.perf_counter()
        rows = ix.search(args.query, k=args.k, mode=args.mode,
                         doc_filter=args.filter, after=after).collect()
        out = {
            "query": args.query, "mode": args.mode,
            "wall_sec": round(time.perf_counter() - t0, 4),
            "results": [[r.doc_id, r.score] for r in rows],
        }
        if rows:  # cursor for the next page (cursorMark analogue)
            out["next_after"] = f"{rows[-1].score!r},{rows[-1].doc_id}"
        print(json.dumps(out))
    elif args.cmd == "merge":
        from parser_indexer_spark.merge import merge_index
        manifest = merge_index(spark, args.src, args.dst)
        print(json.dumps({"merged": args.dst, "stats": manifest["stats"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
