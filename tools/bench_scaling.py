"""N vs 4N scaling evidence (BASELINE.md protocol; BASELINE.json:2,14).

A real N vs 4N executor cluster is unavailable in the sandbox; per the
driver's instruction the SAME job runs at two parallelism levels on the SAME
input and we report throughput at both plus efficiency:

    python tools/bench_scaling.py [--turns 4000000] [--n 2]

Parallelism levels: N=2 cores vs 4N=8 cores by default, each child
CPU-affinity-confined with taskset. Why not local[8] vs local[32]: the
sandbox's 32 vCPUs are hypervisor-overcommitted — /proc/stat steal advanced
~118 CPU-seconds during a 16-second 32-process spin test, and per-process
throughput halves beyond ~8-12 workers — so a 32-thread run measures steal,
not the engine. 2-vs-8 confined cores stay inside the machine's REAL
capacity while preserving the contractual 4x factor.

Orchestration: (1) generate the synthetic transcript corpus once to parquet
(seed=42, FIXTURES.md §1); (2) run the index build in a FRESH taskset-
confined subprocess at local[N], then local[4N] (separate JVMs — no warm-
cache bleed; heap scales with cores like real executors); (3) run the
fixture query set at local[4N] for p95 latency; (4) write
BENCH_SCALING.json and print a summary to paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def run_child(master: str, cores: int, input_path: str, out_dir: str) -> dict:
    """Run one parallelism level in a fresh process, CPU-affinity-confined to
    exactly `cores` CPUs (taskset): in unconfined local[N] the N task threads
    plus N Python workers spread over ALL host cores, so the small
    'cluster' overdelivers and understates scaling efficiency. Confinement
    models real N-core executors."""
    child = os.path.join(ROOT, "tools", "_scaling_child.py")
    cmd = [sys.executable, child, master, str(cores), input_path, out_dir]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child {master} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--n", type=int, default=2,
                    help="N cores; the second run uses 4N")
    ap.add_argument("--workdir", default="/tmp/bench_scaling")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    input_path = os.path.join(args.workdir, f"transcripts_{args.turns}")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        sys.path.insert(0, ROOT)
        from parser_indexer_spark.session import get_spark
        from parser_indexer_spark.transcripts import synthesize_spark
        spark = get_spark(app="gen", master="local[32]", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        shutil.rmtree(input_path, ignore_errors=True)
        synthesize_spark(spark, args.turns, partitions=64) \
            .write.mode("overwrite").parquet(input_path)
        spark.stop()
        print(f"generated {input_path}")

    n, n4 = args.n, 4 * args.n
    os.environ["SCALING_SKIP_QUERIES"] = "1"
    rn = run_child(f"local[{n}]", n, input_path,
                   os.path.join(args.workdir, f"idx{n}"))
    print(json.dumps(rn, indent=1))
    os.environ.pop("SCALING_SKIP_QUERIES", None)
    r4n = run_child(f"local[{n4}]", n4, input_path,
                    os.path.join(args.workdir, f"idx{n4}"))
    print(json.dumps(r4n, indent=1))

    eff = (r4n["turns_per_sec"] / rn["turns_per_sec"]) / 4.0
    summary = {
        "protocol": f"same job, same input, taskset-confined local[{n}] vs "
                    f"local[{n4}] (N vs 4N stand-in per driver instruction; "
                    "see module docstring for why 32 vCPUs are unusable)",
        "n_turns": rn["n_turns"],
        "n_cores": rn,
        "n4_cores": r4n,
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("n_turns", "scaling_efficiency_n_to_4n", "pass")}))


if __name__ == "__main__":
    main()
