"""Raw-CPU scaling ceiling for the current host window: pure-Python integer
work under multiprocessing at 1/4/8/32 workers — zero coordination, zero
shuffle, zero memory traffic beyond L1. Whatever efficiency THIS shows is the
ceiling any Spark job can reach in the same window; run it adjacent to
tools/scaling_runs.py so BASELINE.md can report engine efficiency relative to
the hardware's own, not just the absolute ratio (the 32 vCPUs are SMT threads
over ~16 physical cores on a shared virtualized host, and neighbor-tenant
memory-bandwidth contention moves the ceiling run to run).

Usage: python tools/burn.py [n_per_worker]   # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    return acc


def timed(workers: int, n: int) -> float:
    # Same TOTAL work at every level (weak scaling would hide contention):
    # `workers` processes each burn n iterations, so ideal time is constant
    # 1-worker-time and efficiency = t1 / tN.
    t0 = time.time()
    with mp.Pool(workers) as pool:
        pool.map(_burn, [n] * workers, chunksize=1)
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    _burn(n // 10)  # warm the interpreter
    out: dict = {"n_per_worker": n, "secs": {}, "pairs": {}}
    for w in (1, 4, 8, 32):
        out["secs"][w] = round(timed(w, n), 2)
    s = out["secs"]
    for lo, hi in ((1, 4), (8, 32)):
        # each worker does the same n regardless of level ⇒ perfect scaling
        # keeps wall time flat; efficiency = t_lo / t_hi (<=1).
        out["pairs"][f"{lo}:{hi}"] = round(s[lo] / s[hi], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
