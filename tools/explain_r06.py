"""Capture .explain('formatted') for named relops/entry queries into
plans/r06/<name>_<tag>.txt (round-6 optimization evidence).

Usage: python tools/explain_r06.py <tag> <query> [<query> ...]
       python tools/explain_r06.py <tag> --search   # the Index.search family

<tag> is 'before' or 'after'. Queries resolve against relops first, then
__spark_entry__ (so index-backed entries like topk_bm25 work too).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from parser_indexer_spark import relops
    from parser_indexer_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app=f"explain-r06-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    qmap = dict(entry.queries())
    qmap.update(entry.extra_queries())
    for name in names:
        fn = getattr(relops, name, None) or qmap.get(name)
        if fn is None:
            print(f"SKIP {name}: not found")
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} ({tag})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
