"""N vs 4N scaling evidence (BASELINE.md protocol; BASELINE.json:2,14).

A real N vs 4N executor cluster is unavailable in the sandbox; per the
driver's instruction the SAME job runs at two parallelism levels on the SAME
input and we report throughput at both plus efficiency:

    python tools/bench_scaling.py [--turns 1000000]

Orchestration: (1) generate the synthetic transcript corpus once to parquet
(seed=42, FIXTURES.md §1); (2) run the index build in a FRESH subprocess at
local[8], then local[32] (separate JVMs — no warm-cache bleed); (3) run the
fixture query set at local[32] for p95 latency; (4) write
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
    ap.add_argument("--turns", type=int, default=1_000_000)
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

    r8 = run_child("local[8]", 8, input_path, os.path.join(args.workdir, "idx8"))
    print(json.dumps(r8, indent=1))
    r32 = run_child("local[32]", 32, input_path, os.path.join(args.workdir, "idx32"))
    print(json.dumps(r32, indent=1))

    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0
    summary = {
        "protocol": "same job, same input, local[8] vs local[32] "
                    "(N vs 4N stand-in per driver instruction)",
        "n_turns": r8["n_turns"],
        "local8": r8,
        "local32": r32,
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
