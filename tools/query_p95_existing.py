"""Query-latency measurement against an EXISTING index directory.

Runs the frozen fixture-query battery (the same 10 queries x 3 reps as
tools/_scaling_child.py, so numbers are comparable to the r3/r4 4M-turn
p95 figures) against an index built earlier — e.g. the scaling campaign's
last local[4] leg output — without paying a rebuild. Prints one JSON line
with p50/p95 and per-query times (first rep = warm-cache formation,
excluded from percentiles exactly as in _scaling_child where rep 1 of 3
dominates cache warmup but is still included; here we keep ALL reps for
parity with that protocol).

Usage:
  taskset -c 28-31 python tools/query_p95_existing.py local[4] <index_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parser_indexer_spark.search import Index  # noqa: E402
from parser_indexer_spark.session import get_spark  # noqa: E402

QUERIES = [("spark", "OR"), ("join", "OR"), ("w1999", "OR"),
           ("spark join", "OR"), ("spark join", "AND"),
           ("hash agg", "AND"), ("sort merge w0042", "OR"),
           ("window partition order", "AND"), ("SPARK, Join!", "OR"),
           ("w0000 w0100 w0500", "OR")]


def main() -> None:
    master, idx_dir = sys.argv[1], sys.argv[2]
    cores = int(master.split("[")[1].rstrip("]"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{4 * cores}g")
    spark = get_spark(app="p95-existing", master=master,
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    ix = Index(spark, idx_dir)
    lat: list[float] = []
    per: dict[str, list[float]] = {}
    for _rep in range(3):
        for q, mode in QUERIES:
            t1 = time.perf_counter()
            ix.search(q, k=10, mode=mode).collect()
            dt = time.perf_counter() - t1
            lat.append(dt)
            per.setdefault(f"{q}|{mode}", []).append(round(dt, 4))
    lat.sort()
    print("P95_RESULT " + json.dumps({
        "index": idx_dir, "master": master,
        "n_docs": ix.stats["n_docs"],
        "query_p50_sec": round(lat[len(lat) // 2], 4),
        "query_p95_sec": round(lat[int(0.95 * (len(lat) - 1))], 4),
        "per_query_sec": per,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
