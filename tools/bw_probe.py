"""Memory-bandwidth scaling probe (STREAM-triad-style), companion to the
pure-ALU probe in BENCH.md §2.

The 4->16-core scaling readings (0.45-0.63 across thread and executor
topologies) are attributed to the shared memory controller, not the
dataflow. The ALU probe (register-bound work, 0.938 per-thread retention
at 16 processes) rules out CPU capacity; this probe measures the other
end: per-process numpy triad (a = b + s*c) over arrays far larger than
LLC, N concurrent processes, aggregate GB/s. If aggregate bandwidth stops
growing between 4 and 16 processes, the box's memory controller — a
resource discrete cluster hosts do NOT share across executors — is the
named serial component.

Usage: python tools/bw_probe.py [sizes...]   (default 1 4 16)
Prints one JSON line: {"1": GBps, "4": GBps, "16": GBps, ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ARRAY_MB = 256          # 3 arrays x 256 MB >> any LLC
REPS = 6                # triad sweeps per process (first is warm-up)


def _triad(q):
    import numpy as np
    n = ARRAY_MB * 1024 * 1024 // 8
    a = np.zeros(n)
    b = np.random.default_rng(0).random(n)
    c = np.random.default_rng(1).random(n)
    best = 0.0
    for rep in range(REPS):
        t0 = time.perf_counter()
        np.add(b, 3.0 * c, out=a)       # 2 reads + 1 write, 24 B/elem
        dt = time.perf_counter() - t0
        if rep:                          # skip cold first sweep
            best = max(best, 24e-9 * n / dt)
    q.put(best)


def measure(nproc: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_triad, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(rates), 2)


def main():
    counts = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    out = {}
    for n in counts:
        out[str(n)] = measure(n)
    print(json.dumps({"unit": "GB/s aggregate (triad, 24B/elem)",
                      "array_mb": ARRAY_MB, **out}))


if __name__ == "__main__":
    main()
