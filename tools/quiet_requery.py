"""Quiet-window re-measure of named bench queries (VERDICT r4 #5).

The r4 bench recorded simhash64 at 17.3 s (x5.2 vs r3 on unchanged code)
during a campaign window where the host's own pure-numpy control lost
23-37 % absolute throughput — host or engine could not be adjudicated
from that one run.  This tool re-times a small set of suite queries under
bench.py's exact protocol (same session config, same sf dir, local[32],
.collect() wall time) BRACKETED by the pure-numpy host control so the
measurement certifies its own window: controls within 5 % of each other
=> the host was steady while the numbers were taken.

Usage: python tools/quiet_requery.py [query ...]   (default: the r4
anomaly set + two untouched in-suite controls)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = ["project_filter", "ann_cosine", "simhash64", "lang_trigram"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    from tools.host_control import run as control
    from parser_indexer_spark import relops
    from parser_indexer_spark.session import get_spark

    ctl_pre = control([0], dur=20.0)
    spark = get_spark(app="requery", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in names:
        fn = getattr(relops, name)
        samples = []
        for _rep in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {"reps_sec": samples, "min_sec": min(samples)}
    spark.stop()
    ctl_post = control([0], dur=20.0)
    print("REQUERY_RESULT " + json.dumps({
        "sf_dir": SF_DIR,
        "ctl_pre_it_s": round(ctl_pre, 2),
        "ctl_post_it_s": round(ctl_post, 2),
        "window_steady": abs(ctl_post / ctl_pre - 1.0) <= 0.05,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
