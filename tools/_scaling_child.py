"""Child process for tools/bench_scaling.py — one parallelism level.
Usage: python tools/_scaling_child.py <master> <cores> <input> <out>"""

import json
import shutil
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parser_indexer_spark.session import get_spark  # noqa: E402
from parser_indexer_spark.build import build_index  # noqa: E402
from parser_indexer_spark.config import EngineConfig  # noqa: E402
from parser_indexer_spark.search import Index  # noqa: E402


def main() -> None:
    master, cores, input_path, out_dir = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
    # heap scales with cores at a FIXED per-core rate (4 GiB/core): a real
    # 4N-executor cluster brings 4x the aggregate memory, and an unequal
    # per-core rate (e.g. 8g for both runs = 4 GiB/core at N vs 1 GiB/core
    # at 4N) makes the 4N run measure GC pressure, not the engine —
    # measured r2: it doubled cpu_us/turn at 8 cores.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{4 * cores}g")
    # partitioning is a property of the JOB, not the cluster: both cluster
    # sizes run the IDENTICAL plan (same build/shuffle partition counts),
    # only the executor count differs — exactly how a real N vs 4N cluster
    # comparison is run. Width default = 4 waves on the LARGER cluster.
    parts = int(os.environ.get("SCALING_PARTITIONS", "16"))
    spark = get_spark(app="scaling-" + master, master=master,
                      shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(input_path)
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = EngineConfig(n_buckets=32, build_partitions=parts,
                       salt_df_threshold=50_000, n_salts=16, chunk_bits=17,
                       # positional payloads are the r3 default; the A/B
                       # toggle isolates their build cost from host drift
                       positions=os.environ.get("SCALING_POSITIONS",
                                                "1") != "0",
                       # impact sidecars are the r4 default (head-term
                       # early exit); SCALING_IMPACTS=0 disables via an
                       # unreachable df threshold to isolate their cost
                       impact_df_threshold=(
                           1 << 40
                           if os.environ.get("SCALING_IMPACTS") == "0"
                           else 4096))

    # untimed warmup build (~200k turns): JVM JIT + codegen caches + python
    # worker pools are steady-state on a real long-running cluster; without
    # it the shorter 4N run pays the same one-time cost over 3x less work,
    # understating true scaling
    warm_dir = out_dir + "_warmup"
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, df.limit(200_000), warm_dir, cfg, segments=1,
                input_desc="warmup")
    shutil.rmtree(warm_dir, ignore_errors=True)
    import glob
    import resource

    def cpu_now() -> float:
        """CPU seconds of this process TREE (live JVM + python workers via
        /proc, since rusage(CHILDREN) only counts reaped children) plus
        reaped-children rusage. Steal-immune scaling metric."""
        procs = {}
        for st in glob.glob("/proc/[0-9]*/stat"):
            try:
                head, tail = open(st).read().rsplit(")", 1)
                pid_i = int(head.split(" ")[0])
                f = tail.split()
                procs[pid_i] = (int(f[1]), int(f[11]) + int(f[12]))
            except Exception:
                pass
        desc = {os.getpid()}
        changed = True
        while changed:
            changed = False
            for p, (pp, _) in procs.items():
                if pp in desc and p not in desc:
                    desc.add(p)
                    changed = True
        hz = os.sysconf("SC_CLK_TCK")
        live = sum(procs[p][1] for p in desc if p in procs) / hz
        b = resource.getrusage(resource.RUSAGE_CHILDREN)
        return live + b.ru_utime + b.ru_stime

    t0 = time.perf_counter()
    c0 = cpu_now()
    manifest = build_index(spark, df, out_dir, cfg, segments=1,
                           input_desc=input_path)
    wall = time.perf_counter() - t0
    # cpu covers the in-process JVM (local mode) + reaped Python workers
    cpu = cpu_now() - c0
    res = {"master": master, "wall_sec": round(wall, 2),
           "cpu_sec": round(cpu, 1),
           "n_turns": manifest["stats"]["n_docs"],
           "turns_per_sec": round(manifest["stats"]["n_docs"] / wall, 1),
           "cpu_us_per_turn": round(cpu * 1e6 / manifest["stats"]["n_docs"], 1),
           "stats": manifest["stats"],
           "conf": {"shuffle_partitions": max(8, 2 * cores),
                    "build_partitions": 2 * cores,
                    "arrow_max_records_per_batch": 65536}}
    if os.environ.get("SCALING_SKIP_QUERIES"):
        print("CHILD_RESULT " + json.dumps(res))
        spark.stop()
        return
    queries = [("spark", "OR"), ("join", "OR"), ("w1999", "OR"),
               ("spark join", "OR"), ("spark join", "AND"),
               ("hash agg", "AND"), ("sort merge w0042", "OR"),
               ("window partition order", "AND"), ("SPARK, Join!", "OR"),
               ("w0000 w0100 w0500", "OR")]
    ix = Index(spark, out_dir)
    lat = []
    for _rep in range(3):
        for q, mode in queries:
            t1 = time.perf_counter()
            ix.search(q, k=10, mode=mode).collect()
            lat.append(time.perf_counter() - t1)
    lat.sort()
    res["query_p50_sec"] = round(lat[len(lat) // 2], 4)
    res["query_p95_sec"] = round(lat[int(0.95 * (len(lat) - 1))], 4)
    print("CHILD_RESULT " + json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
