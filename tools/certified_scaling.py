"""Certified-pair N-vs-4N scaling campaign (VERDICT r4 "Next round" #1).

Rounds 3 and 4 both measured wall-clock scaling efficiency below the 0.8
contract bar (0.781, 0.766) while the steal-immune CPU-time metric cleared
it (0.850, 0.862) and the host's own pure-numpy control demonstrably
drifted 23-37 % absolute mid-campaign.  The adjudication protocol from the
r4 verdict: bracket EVERY interleaved N/4N pair with a short pure-numpy
mini-control (the same kernel mix as tools/host_control.py) and accept a
pair into the median only when the brackets sit within ``--tol`` (default
5 %) of the campaign-start baseline.  Collect until ``--target`` certified
pairs exist or the ``--budget-min`` wall budget runs out; either outcome —
a certified wall median, or a record showing quiet pairs were not
obtainable — ends the three-round ambiguity.

Three brackets per pair (pre / mid / post) so a noise burst INSIDE a leg,
not just between pairs, voids the pair.  Leg order alternates per pair
(N-first on even pairs, 4N-first on odd) to kill any order bias.  State is
appended to ``certified_pairs.jsonl`` after every pair and the assembled
``BENCH_SCALING.json`` is rewritten incrementally, so an interrupted
campaign still leaves usable evidence.

Cores: the campaign is taskset-pinned to a dedicated high block (default
28-31) so development work on the same box can be pinned to 0-27 and never
touches the measured cores; the brackets certify that nothing else did
either.

Attempt 2 (r5): attempt 1 certified 0/8 pairs because the campaign-start
baseline (22.63 it/s, median of 5) was itself sampled in a steal window —
later controls read up to 29.4 it/s and failed the +-5 % band for being
FASTER than the anchor, which is backwards: hypervisor steal only ever
SLOWS the control, so the host's steal-free speed is the MAX control ever
observed, and "provably quiet" means the brackets sit within tol BELOW
that max.  The anchor is now max(campaign-start samples, --anchor-floor),
where the floor defaults to 29.42 — the max control across attempt 1's 29
samples (BENCH_SCALING_CERT.json pair_records) — and certification is
one-sided: ctl >= (1 - tol) * anchor.

Usage: nohup python tools/certified_scaling.py > /tmp/cert_scaling.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def mini_control(cores: list[int], dur: float = 60.0) -> float:
    """1-process pure-numpy control on the campaign's first core: absolute
    iterations/sec of the engine-kernel-shaped workload (sort + delta +
    varint width math).  Drift in this number = the host changed speed."""
    from tools.host_control import run
    return run([cores[0]], dur=dur)


def run_child(master: str, cores: list[int], input_path: str,
              out_dir: str) -> dict:
    child = os.path.join(ROOT, "tools", "_scaling_child.py")
    cmd = [sys.executable, child, master, str(len(cores)), input_path,
           out_dir]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", ",".join(str(c) for c in cores)] + cmd
    env = dict(os.environ, SCALING_SKIP_QUERIES="1")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                          env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child {master} failed:\n{proc.stdout[-2000:]}\n"
                       f"{proc.stderr[-4000:]}")


def assemble(state: dict, out_path: str) -> dict:
    pairs = state["pairs"]
    cert = [p for p in pairs if p["certified"]]

    def eff(p):
        return round(p["r4n"]["turns_per_sec"] / p["rn"]["turns_per_sec"]
                     / 4.0, 3)

    def ceff(p):
        return round(p["rn"]["cpu_us_per_turn"] / p["r4n"]["cpu_us_per_turn"],
                     3)

    # secondary certification: the pair's own three brackets agree with
    # EACH OTHER within tol — the condition that actually validates the
    # within-pair ratio even when the host's absolute speed has drifted
    # away from the campaign-start baseline between pairs
    stable = [p for p in pairs if p.get("self_stable")]
    wall_cert = sorted(eff(p) for p in cert)
    wall_all = sorted(eff(p) for p in pairs)
    wall_stable = sorted(eff(p) for p in stable)
    cpu_all = sorted(ceff(p) for p in pairs)
    cpu_cert = sorted(ceff(p) for p in cert)
    summary = {
        "protocol": (
            "certified-pair protocol (r4 verdict #1): IDENTICAL job, plan "
            "(16 build/shuffle partitions at both sizes) and input "
            f"({state['n_turns']:,}-turn seed-42 synthetic transcripts, the "
            "same corpus as r3/r4); taskset-confined local[1] vs local[4] "
            f"on dedicated cores {state['cores']} (N vs 4N per driver "
            "instruction), heap 4 GiB/core, untimed 200k-turn warmup per "
            "child, leg order alternated per pair; EVERY pair bracketed by "
            "three 20 s pure-numpy mini-controls (pre/mid/post) and "
            "accepted as CERTIFIED only when all three sit within "
            f"{state['tol']:.0%} BELOW the steal-free anchor "
            f"({state['baseline_it_s']:.2f} it/s = max control ever "
            "observed; hypervisor steal only slows the control, so "
            "ctl >= (1-tol)*anchor means the host was provably quiet "
            "during the pair)"),
        "baseline_it_s": state["baseline_it_s"],
        "tolerance": state["tol"],
        "n_turns": state["n_turns"],
        "attempted_pairs": len(pairs),
        "certified_pairs": len(cert),
        "pair_records": pairs,
        "self_stable_pairs": len(stable),
        "wall_eff_certified": wall_cert,
        "wall_eff_all": wall_all,
        "wall_eff_self_stable": wall_stable,
        "cpu_eff_certified": cpu_cert,
        "cpu_eff_all": cpu_all,
        "wall_eff_certified_median":
            round(statistics.median(wall_cert), 3) if wall_cert else None,
        "wall_eff_all_median":
            round(statistics.median(wall_all), 3) if wall_all else None,
        "wall_eff_self_stable_median":
            round(statistics.median(wall_stable), 3) if wall_stable else None,
        "cpu_eff_certified_median":
            round(statistics.median(cpu_cert), 3) if cpu_cert else None,
        "cpu_eff_all_median":
            round(statistics.median(cpu_all), 3) if cpu_all else None,
        "median_turns_per_sec_certified": {
            "local[1]": round(statistics.median(
                p["rn"]["turns_per_sec"] for p in cert), 1) if cert else None,
            "local[4]": round(statistics.median(
                p["r4n"]["turns_per_sec"] for p in cert), 1) if cert else None,
        },
        "target": 0.8,
    }
    if wall_cert:
        summary["wall_pass_certified"] = summary[
            "wall_eff_certified_median"] >= 0.8
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--target", type=int, default=9)
    ap.add_argument("--max-attempts", type=int, default=12)
    ap.add_argument("--budget-min", type=float, default=195.0)
    ap.add_argument("--tol", type=float, default=0.05)
    ap.add_argument("--anchor-floor", type=float, default=29.42,
                    help="lower bound on the steal-free anchor: the max "
                         "control observed across attempt 1 (see module "
                         "docstring)")
    ap.add_argument("--core-base", type=int, default=28)
    ap.add_argument("--workdir", default="/tmp/bench_scaling")
    ap.add_argument("--state", default="/tmp/cert_state.json")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "BENCH_SCALING_CERT.json"))
    args = ap.parse_args()

    cores4 = list(range(args.core_base, args.core_base + 4))
    input_path = os.path.join(args.workdir, f"transcripts_{args.turns}")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        from parser_indexer_spark.session import get_spark
        from parser_indexer_spark.transcripts import synthesize_spark
        spark = get_spark(app="gen", master="local[16]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        synthesize_spark(spark, args.turns, partitions=64) \
            .write.mode("overwrite").parquet(input_path)
        spark.stop()
        print(f"generated {input_path}", flush=True)

    t_start = time.time()
    if os.path.exists(args.state):
        # resume: keep prior pairs (an interrupted campaign's evidence) and
        # the prior anchor rule; re-anchor only upward if a faster control
        # has since been observed
        state = json.load(open(args.state))
        base_samples = [mini_control(cores4) for _ in range(2)]
        baseline = max(state["baseline_it_s"], max(base_samples),
                       args.anchor_floor)
        state["baseline_it_s"] = round(baseline, 2)
        state.setdefault("baseline_samples", []).extend(
            round(b, 2) for b in base_samples)
        print(f"resumed {args.state}: {len(state['pairs'])} prior pairs, "
              f"anchor {baseline:.2f}", flush=True)
    else:
        print("campaign-start baseline: 5 controls...", flush=True)
        base_samples = [mini_control(cores4) for _ in range(5)]
        baseline = max(max(base_samples), args.anchor_floor)
        print(f"anchor {baseline:.2f} it/s = max(samples {base_samples}, "
              f"floor {args.anchor_floor})", flush=True)
        state = {"baseline_it_s": round(baseline, 2), "tol": args.tol,
                 "n_turns": args.turns, "cores": cores4,
                 "anchor_rule": "max(start samples, attempt-1 max control); "
                                "one-sided: ctl >= (1-tol)*anchor",
                 "baseline_samples": [round(b, 2) for b in base_samples],
                 "pairs": []}

    def ok(v: float) -> bool:
        return v >= (1.0 - args.tol) * baseline

    attempt = len(state["pairs"])
    while (sum(p["certified"] for p in state["pairs"]) < args.target
           and attempt < args.max_attempts
           and (time.time() - t_start) / 60 < args.budget_min):
        attempt += 1
        order = ["n", "4n"] if attempt % 2 == 1 else ["4n", "n"]
        rec: dict = {"attempt": attempt, "order": order}
        pre = mini_control(cores4)
        rec["ctl_pre"] = round(pre, 2)
        legs = {}
        for which in order:
            if which == "n":
                legs["rn"] = run_child("local[1]", cores4[:1], input_path,
                                       os.path.join(args.workdir, "idxc1"))
            else:
                legs["r4n"] = run_child("local[4]", cores4, input_path,
                                        os.path.join(args.workdir, "idxc4"))
            if "ctl_mid" not in rec:
                rec["ctl_mid"] = round(mini_control(cores4), 2)
        post = mini_control(cores4)
        rec["ctl_post"] = round(post, 2)
        rec["rn"] = {k: legs["rn"][k] for k in
                     ("wall_sec", "turns_per_sec", "cpu_sec",
                      "cpu_us_per_turn")}
        rec["r4n"] = {k: legs["r4n"][k] for k in
                      ("wall_sec", "turns_per_sec", "cpu_sec",
                       "cpu_us_per_turn")}
        rec["certified"] = all(ok(rec[c]) for c in
                               ("ctl_pre", "ctl_mid", "ctl_post"))
        ctls = [rec["ctl_pre"], rec["ctl_mid"], rec["ctl_post"]]
        rec["self_stable"] = (max(ctls) / min(ctls) - 1.0) <= args.tol
        eff = rec["r4n"]["turns_per_sec"] / rec["rn"]["turns_per_sec"] / 4.0
        rec["wall_eff"] = round(eff, 3)
        state["pairs"].append(rec)
        with open(args.state, "w") as f:
            json.dump(state, f, indent=1)
        summary = assemble(state, args.out)
        print(f"pair {attempt}: eff={eff:.3f} certified={rec['certified']} "
              f"ctl=({rec['ctl_pre']},{rec['ctl_mid']},{rec['ctl_post']}) "
              f"vs base {baseline:.2f} | certified so far "
              f"{summary['certified_pairs']}/{args.target} "
              f"median={summary['wall_eff_certified_median']}", flush=True)

    print("DONE " + json.dumps({k: assemble(state, args.out)[k] for k in
                                ("attempted_pairs", "certified_pairs",
                                 "wall_eff_certified_median",
                                 "cpu_eff_certified_median")}), flush=True)


if __name__ == "__main__":
    main()
