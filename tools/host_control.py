"""Host-contention control (BASELINE.md protocol step 5): a fixed pure-numpy workload (sort + cumsum +
byte ops — the engine's kernel mix) run on 1 vs 4 taskset-pinned processes.
Measures the HOST's own per-process throughput degradation under
concurrency — the hardware ceiling any 1->4-core scaling is bounded by.
No Spark, no JVM, no shared state: ideal scaling would be per-process
rate ratio = 1.0."""
import multiprocessing as mp
import os, sys, time
import numpy as np

def work_iter(rng):
    a = rng.integers(0, 1 << 40, size=400_000).astype(np.uint64)
    b = np.sort(a)
    g = np.diff(b, prepend=b[0])
    nb = 1 + (g[:, None] >= (np.uint64(1) << (np.arange(1, 10, dtype=np.uint64) * np.uint64(7)))[None, :]).sum(axis=1)
    return int(nb.sum() + np.cumsum(g)[-1] % 7)

def child(core, dur, q):
    os.sched_setaffinity(0, {core})
    rng = np.random.default_rng(core + 1)
    t_end = time.perf_counter() + dur
    n = 0
    sink = 0
    while time.perf_counter() < t_end:
        sink ^= work_iter(rng)
        n += 1
    q.put((core, n))

def run(cores, dur=20.0):
    q = mp.Queue()
    ps = [mp.Process(target=child, args=(c, dur, q)) for c in cores]
    [p.start() for p in ps]
    [p.join() for p in ps]
    res = [q.get() for _ in cores]
    return sum(n for _, n in res) / len(cores) / dur  # iters/s per process

if __name__ == "__main__":
    pairs = []
    for rep in range(3):
        r1 = run([0])
        r4 = run([0, 1, 2, 3])
        pairs.append((r1, r4, r4 / r1))
        print(f"rep{rep}: 1proc {r1:.2f} it/s, 4proc {r4:.2f} it/s/proc, "
              f"per-proc ratio {r4/r1:.3f}", flush=True)
    med = sorted(p[2] for p in pairs)[1]
    print(f"HOST_CEILING per-process throughput ratio (1->4 busy cores): {med:.3f}")
