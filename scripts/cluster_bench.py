"""North-rule scaling evidence on a REAL multi-executor cluster.

Starts a Spark standalone cluster on this box — one master plus four
workers, each worker taskset-pinned to its own two dedicated cores (so
an executor's JVM, Python workers, and GC all live on those cores,
exactly like an executor on a cluster node owning its slot). The same
encode job ships via ``spark-submit --py-files columnstore_spark.zip``
and runs at two cluster sizes:

    N  executors: spark.cores.max=2  -> 1 executor  x 2 cores
    4N executors: spark.cores.max=8  -> 4 executors x 2 cores

Scaling efficiency = throughput_4N / (4 x throughput_N). This is the
sandbox stand-in the task brief sanctions for the north rule's
"N and 4N executors" criterion, and exercises the spark-submit
--py-files packaging path end to end.

Usage: python scripts/cluster_bench.py [--replicate 16] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zipfile

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_URL = "spark://127.0.0.1:7077"
# workers own cores 0..7 (2 each); master/driver live on high cores
WORKERS = [(1, "0,1"), (2, "2,3"), (3, "4,5"), (4, "6,7")]
DRIVER_CORES = "24-31"


def sh(cmd: list[str], env: dict | None = None, check: bool = True,
       timeout: int = 120) -> subprocess.CompletedProcess:
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, env=e, check=check, timeout=timeout,
                          capture_output=True, text=True)


def build_zip(path: str) -> str:
    pkg = os.path.join(REPO, "columnstore_spark")
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def start_cluster(workdir: str) -> None:
    env = {"SPARK_PID_DIR": workdir, "SPARK_LOG_DIR": workdir,
           "SPARK_NO_DAEMONIZE": ""}
    sh(["taskset", "-c", DRIVER_CORES,
        f"{SPARK_HOME}/sbin/start-master.sh",
        "--host", "127.0.0.1", "--port", "7077",
        "--webui-port", "8089"],
       env={"SPARK_PID_DIR": workdir, "SPARK_LOG_DIR": workdir,
            "SPARK_IDENT_STRING": "csmaster"})
    time.sleep(3)
    for idx, cores in WORKERS:
        sh(["taskset", "-c", cores,
            f"{SPARK_HOME}/sbin/start-worker.sh", MASTER_URL,
            "--cores", "2", "--memory", "6g",
            "--port", str(7200 + idx), "--webui-port", str(8190 + idx),
            "--work-dir", f"{workdir}/w{idx}"],
           env={"SPARK_PID_DIR": workdir, "SPARK_LOG_DIR": workdir,
                "SPARK_IDENT_STRING": f"csw{idx}"})
    time.sleep(4)


def stop_cluster(workdir: str) -> None:
    for idx, _ in WORKERS:
        sh([f"{SPARK_HOME}/sbin/stop-worker.sh"],
           env={"SPARK_PID_DIR": workdir,
                "SPARK_IDENT_STRING": f"csw{idx}"}, check=False)
    sh([f"{SPARK_HOME}/sbin/stop-master.sh"],
       env={"SPARK_PID_DIR": workdir, "SPARK_IDENT_STRING": "csmaster"},
       check=False)


def submit(zip_path: str, cores_max: int, sf_dir: str, replicate: int,
           rowgroups: int, prebucketed: bool = False,
           reuse_bucketed: bool = False, buckets: int = 16,
           direct_scan: bool = False) -> dict:
    cmd = ["taskset", "-c", DRIVER_CORES,
           f"{SPARK_HOME}/bin/spark-submit",
           "--master", MASTER_URL,
           "--deploy-mode", "client",
           "--py-files", zip_path,
           "--conf", f"spark.cores.max={cores_max}",
           "--conf", "spark.executor.cores=2",
           "--conf", "spark.executor.memory=4g",
           "--conf", "spark.locality.wait=0s",
           "--conf", "spark.sql.session.timeZone=UTC",
           os.path.join(REPO, "scripts", "cluster_encode_job.py"),
           sf_dir, str(replicate), str(rowgroups)]
    if prebucketed:
        cmd.append("--prebucketed")
    if direct_scan:
        cmd.append("--direct-scan")
    if reuse_bucketed:
        cmd.append("--reuse-bucketed")
    cmd.extend(["--buckets", str(buckets)])
    cmd.append("--stages")  # per-stage task counts to stderr (diagnosis)
    proc = sh(cmd, env={"PYSPARK_PYTHON": sys.executable}, check=False,
              timeout=900)
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[7:])
        elif line.startswith("STAGE "):
            print(f"[cores.max={cores_max}] {line}", file=sys.stderr)
    if result is not None:
        return result
    raise RuntimeError(
        f"submit failed (cores.max={cores_max}):\n{proc.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--rowgroups", type=int, default=256)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=16,
                    help="bucket-file count (bounds per-task working set)")
    ap.add_argument("--prebucketed", action="store_true",
                    help="bucketed-table layout: encode without exchange")
    ap.add_argument("--direct-scan", action="store_true",
                    help="worker-side parquet read (pyarrow), one task "
                         "per bucket file — skips the JVM columnar scan")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    workdir = "/tmp/cs_cluster"
    os.makedirs(workdir, exist_ok=True)
    zip_path = build_zip(os.path.join(workdir, "columnstore_spark.zip"))
    stop_cluster(workdir)  # clean any stale daemons
    start_cluster(workdir)
    try:
        # interleave the two cluster sizes (N,4N,N,4N,...) so a host
        # noise burst cannot sink every sample of one level — this box
        # shows multi-minute co-tenant bursts that best-of-k at one
        # level does not survive
        runs: dict[int, list[dict]] = {2: [], 8: []}
        reuse = False
        for _ in range(args.repeats):
            for cores in (2, 8):
                runs[cores].append(
                    submit(zip_path, cores, args.sf_dir, args.replicate,
                           args.rowgroups, args.prebucketed,
                           reuse_bucketed=reuse, buckets=args.buckets,
                           direct_scan=args.direct_scan))
                # bucketed input written once
                reuse = args.prebucketed or args.direct_scan
        rN = min(runs[2], key=lambda r: r["wall_s"])
        r4N = min(runs[8], key=lambda r: r["wall_s"])
    finally:
        stop_cluster(workdir)

    # from walls, not the JSON's rounded throughputs: identical input
    # means thr_4N/(4*thr_N) == wall_N/(4*wall_4N) exactly
    eff = rN["wall_s"] / (4 * r4N["wall_s"])
    result = {"N_1_executor": rN, "4N_4_executors": r4N,
              "scaling_efficiency": round(eff, 3),
              "all_runs": {
                  "N": [r["wall_s"] for r in runs[2]],
                  "4N": [r["wall_s"] for r in runs[8]]}}
    print(json.dumps(result))

    if args.out:
        with open(args.out, "a") as f:
            f.write(
                "\n## Scaling evidence — standalone cluster, N vs 4N "
                "executors (north rule)\n\n"
                "Spark standalone cluster on one box: 4 workers, each "
                "taskset-pinned to 2 dedicated cores (executor JVM + its "
                "Python workers own those cores). Same encode job shipped "
                "via `spark-submit --py-files columnstore_spark.zip`, "
                f"input {rN['rows']:,} rows / {rN['raw_gb']} GB raw, "
                f"{args.rowgroups} rowgroups, best of {args.repeats}:\n\n"
                "| cluster size | wall (s) | throughput (GB/s) | rows/s |\n"
                "|---|---|---|---|\n"
                f"| 1 executor x 2 cores (N) | {rN['wall_s']} | "
                f"{rN['throughput_gbps']} | {rN['rows_per_sec']:,} |\n"
                f"| 4 executors x 2 cores (4N) | {r4N['wall_s']} | "
                f"{r4N['throughput_gbps']} | {r4N['rows_per_sec']:,} |\n\n"
                f"**Scaling efficiency = {result['scaling_efficiency']}** "
                "(throughput_4N / (4 x throughput_N))\n")


if __name__ == "__main__":
    main()
