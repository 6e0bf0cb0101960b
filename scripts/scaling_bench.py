"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule requires >=0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so the sanctioned
stand-in is the same encode job at two parallelism levels on the same
input (SURVEY.md §4.2 "Scaling evidence").

Levels: local[2] (N) vs local[8] (4N). 8 is this box's measured
memory-bandwidth capacity for concurrent streaming codec kernels —
beyond ~8-12 workers, per-task CPU inflates up to 6x from DRAM stalls
(verified with pure multiprocessing, no Spark), so higher levels
measure the box, not the engine. On a real cluster N and 4N executors
each own their memory channels, which local[2]/local[8] reproduces and
local[8]/local[32] cannot.

Each level runs in its own subprocess (fresh JVM, fresh page cache
state); Python-worker warm-up is excluded from the timed region.

Usage: python scripts/scaling_bench.py [--replicate 16] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from columnstore_spark.session import get_spark, warmup_python_workers
from columnstore_spark.operators import encode
from columnstore_spark.sources.transcripts import synthetic_transcripts

cores, replicate, rowgroups, sf_dir = {cores}, {replicate}, {rowgroups}, {sf_dir!r}
spark = get_spark(app=f"scaling_local{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=max(cores, 8))
t = synthetic_transcripts(spark, sf_dir, replicate=replicate).persist()
rows = t.count()
warmup_python_workers(spark)
t0 = time.perf_counter()
segs = encode(t, num_rowgroups=rowgroups, num_partitions=max(cores, 8))
agg = segs.agg(F.sum("raw_bytes").alias("raw"),
               F.sum("enc_bytes").alias("enc")).collect()[0]
wall = time.perf_counter() - t0
raw = int(agg["raw"])
print("RESULT " + json.dumps({{
    "cores": cores, "rows": rows, "raw_gb": round(raw / 1e9, 4),
    "enc_gb": round(int(agg["enc"]) / 1e9, 4), "wall_s": round(wall, 2),
    "throughput_gbps": round(raw / 1e9 / wall, 4),
    "rows_per_sec": round(rows / wall)}}))
spark.stop()
"""


def measure(cores: int, replicate: int, rowgroups: int, sf_dir: str) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _CHILD.format(repo=repo, cores=cores, replicate=replicate,
                           rowgroups=rowgroups, sf_dir=sf_dir)
    proc = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=900)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"child failed: {proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--rowgroups", type=int, default=256)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2, help="N parallelism")
    ap.add_argument("--repeats", type=int, default=2,
                    help="runs per level; best wall is taken (host is noisy)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def best(cores: int) -> dict:
        runs = [measure(cores, args.replicate, args.rowgroups, args.sf_dir)
                for _ in range(args.repeats)]
        return min(runs, key=lambda r: r["wall_s"])

    rN = best(args.n)
    r4N = best(args.n * 4)
    eff = r4N["throughput_gbps"] / (4 * rN["throughput_gbps"])
    result = {"N": rN, "4N": r4N, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    if args.out:
        with open(args.out, "a") as f:
            f.write(
                "\n## Scaling evidence (north rule: N vs 4N)\n\n"
                f"Same encode job, same input ({rN['rows']:,} rows, "
                f"{rN['raw_gb']} GB raw, {args.rowgroups} rowgroups), each "
                "level in a fresh process, python workers pre-warmed, best "
                f"of {args.repeats}:\n\n"
                "| parallelism | wall (s) | throughput (GB/s) | rows/s |\n"
                "|---|---|---|---|\n"
                f"| local[{args.n}] (N) | {rN['wall_s']} | "
                f"{rN['throughput_gbps']} | {rN['rows_per_sec']:,} |\n"
                f"| local[{args.n * 4}] (4N) | {r4N['wall_s']} | "
                f"{r4N['throughput_gbps']} | {r4N['rows_per_sec']:,} |\n\n"
                f"**Scaling efficiency = {result['scaling_efficiency']}** "
                "(T_4N / (4 x T_N)). Levels 2/8 chosen because this box's "
                "memory bandwidth saturates at ~8-12 concurrent codec "
                "streams (pure-multiprocessing control shows 6x per-call "
                "CPU inflation at 32 procs); real executors own their "
                "memory channels, which 2-vs-8 reproduces on one box.\n")


if __name__ == "__main__":
    main()
