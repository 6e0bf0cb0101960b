"""Controlled experiment: why does the N (1-executor) sample sometimes
run ~25 s and sometimes ~33 s, while 4N samples cluster tightly?

Hypothesis (BENCH.md §3d): on this single box the 4N configuration's
executors share one memory system, so each core sees a loaded memory
hierarchy; the N configuration runs on an otherwise-idle box and its 2
cores enjoy the whole LLC/membus. On a real fleet BOTH levels run with
only their own 2-core executor per node, so the honest apples-to-apples
per-core conditions are "neighbors busy" for both or "idle" for both.

This probe runs the SAME N encode job (1 executor x 2 cores pinned to
cores 0,1; spark-submit --py-files, identical input) in two interleaved
box states:

  idle:  nothing else running (the usual N measurement)
  busy:  6 spinner processes taskset-pinned to cores 2-7, each
         streaming over a 128 MB numpy array (emulating the memory
         traffic the other three 4N executors generate)

If wall(busy) ~= the typical-N band (and 3x the per-core-fair share of
the best 4N wall), the N/4N efficiency gap is box sharing, not engine
coordination — the quantity the north rule actually cares about.

Usage: python scripts/noisy_neighbor_probe.py [--pairs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cluster_bench import (  # noqa: E402
    REPO, build_zip, sh, start_cluster, stop_cluster, submit,
)

SPINNER_CODE = r"""
import numpy as np, sys
a = np.arange(16 * 1024 * 1024, dtype=np.float64)  # 128 MB
s = 0.0
while True:
    s += float(a.sum())          # stream 128 MB through the membus
    a[::4096] = s                # dirty pages so it can't cache-resident
"""


def start_spinners() -> list[subprocess.Popen]:
    procs = []
    for core in range(2, 8):
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(core), sys.executable, "-c",
             SPINNER_CODE],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    time.sleep(2)  # let the arrays fault in before the timed job
    return procs


def stop_spinners(procs: list[subprocess.Popen]) -> None:
    for p in procs:
        p.kill()
    for p in procs:
        p.wait()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--rowgroups", type=int, default=256)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    workdir = "/tmp/cs_cluster"
    os.makedirs(workdir, exist_ok=True)
    zip_path = build_zip(os.path.join(workdir, "columnstore_spark.zip"))
    stop_cluster(workdir)
    start_cluster(workdir)
    walls: dict[str, list[float]] = {"idle": [], "busy": []}
    try:
        reuse = os.path.exists("/tmp/cs_cluster/bucketed_input")
        for _ in range(args.pairs):
            for state in ("idle", "busy"):
                spinners = start_spinners() if state == "busy" else []
                try:
                    r = submit(zip_path, 2, args.sf_dir, args.replicate,
                               args.rowgroups, prebucketed=True,
                               reuse_bucketed=reuse, buckets=args.buckets,
                               direct_scan=True)
                    reuse = True
                    walls[state].append(r["wall_s"])
                finally:
                    stop_spinners(spinners)
    finally:
        stop_cluster(workdir)

    result = {
        "N_idle_walls": walls["idle"],
        "N_busy_walls": walls["busy"],
        "idle_best": min(walls["idle"]),
        "busy_best": min(walls["busy"]),
        "busy_over_idle": round(min(walls["busy"]) / min(walls["idle"]),
                                3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
