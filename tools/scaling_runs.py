"""Record the north-rule scaling evidence: the frontier-throughput job at two
parallelism levels (N and 4N cores), medians over interleaved repetitions.

Each run is a fresh Spark session (fresh JVM) executing
``bench.bench_frontier`` (warmup pass + timed steady-state pass). Runs are
interleaved N,4N,N,4N,... so host-capacity drift (shared virtualized host)
hits both configs equally.

Usage:
    SPARK_GRAFT_DRIVER_MEM=24g python tools/scaling_runs.py [n_urls] [reps]
    SPARK_GRAFT_PAIRS=1:4,8:32   # N:4N core pairs (default both)
Prints one JSON line with per-run seconds, medians, floors, and efficiency.
Floors matter on this host: capacity noise is strictly additive (identical
jobs vary up to 2.4x minutes apart), so per-config minima over interleaved
runs estimate true machine capability; medians are reported alongside.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, json
sys.path.insert(0, {repo!r})
from facebook_page_scrapy_spark.session import get_spark
import bench
spark = get_spark("scaling", cores={cores}, shuffle_partitions={cores},
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
spark.range(10).count()
r = bench.bench_frontier(spark, n_urls={n})
print("RESULT " + json.dumps(r))
spark.stop()
"""


def one_run(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO, cores=cores, n=n)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in out.stdout.replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run failed (cores={cores}): {out.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pairs = [
        tuple(int(x) for x in p.split(":"))
        for p in os.environ.get("SPARK_GRAFT_PAIRS", "1:4,8:32").split(",")
    ]
    results: dict = {"n_urls": n, "reps": reps, "pairs": []}
    for lo, hi in pairs:
        lo_secs, hi_secs = [], []
        for _ in range(reps):
            lo_secs.append(one_run(lo, n)["sec"])
            hi_secs.append(one_run(hi, n)["sec"])
            print(f"  interim [{lo}:{hi}] lo={lo_secs} hi={hi_secs}",
                  file=sys.stderr, flush=True)
        lo_med, hi_med = statistics.median(lo_secs), statistics.median(hi_secs)
        lo_floor, hi_floor = min(lo_secs), min(hi_secs)
        results["pairs"].append({
            "n_cores": lo, "n4_cores": hi,
            "runs_sec_n": lo_secs, "runs_sec_4n": hi_secs,
            "median_sec_n": lo_med, "median_sec_4n": hi_med,
            "floor_sec_n": lo_floor, "floor_sec_4n": hi_floor,
            "urls_per_sec_n": round(n / lo_med, 1),
            "urls_per_sec_4n": round(n / hi_med, 1),
            "urls_per_sec_n_floor": round(n / lo_floor, 1),
            "urls_per_sec_4n_floor": round(n / hi_floor, 1),
            "speedup_median": round(lo_med / hi_med, 3),
            "efficiency_median": round(lo_med / hi_med / (hi / lo), 3),
            "speedup_floor": round(lo_floor / hi_floor, 3),
            "efficiency_floor": round(lo_floor / hi_floor / (hi / lo), 3),
        })
        print(json.dumps(results["pairs"][-1]), file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
