"""Driver program submitted to the standalone cluster via spark-submit.

Runs the encode stage over the deterministic synthetic transcript table
and prints one RESULT json line (consumed by cluster_bench.py). Session
comes from spark-submit's conf — no master override here.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir, replicate, rowgroups = (sys.argv[1], int(sys.argv[2]),
                                    int(sys.argv[3]))
    prebucketed = "--prebucketed" in sys.argv or "--direct-scan" in sys.argv
    buckets = 16
    if "--buckets" in sys.argv:
        buckets = int(sys.argv[sys.argv.index("--buckets") + 1])
    spark = (
        SparkSession.builder.appName("cluster_encode")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # never split a bucketed input file: a rowgroup must not span
        # two partitions (encode assume_partitioned contract)
        .config("spark.sql.files.maxPartitionBytes", "1g")
        # ...and never PACK two bucket files into one scan partition
        # either: bin-packing the small bucket files into 1-2 partitions
        # silently serializes the whole encode (measured: 4N ran at N's
        # speed, the round-1 "0.33-0.53 efficiency" artifact). An open
        # cost equal to maxPartitionBytes makes every file its own
        # partition (two padded files can never fit one bin) while
        # files below 1g are still never split.
        .config("spark.sql.files.openCostInBytes", str(1 << 30))
        .getOrCreate()
    )
    from columnstore_spark.operators import encode
    from columnstore_spark.operators.encode import default_rowgroup_expr
    from columnstore_spark.session import warmup_python_workers
    from columnstore_spark.sources.transcripts import synthetic_transcripts

    total_cores = int(spark.conf.get("spark.cores.max"))
    spark.conf.set("spark.sql.shuffle.partitions", str(max(total_cores, 8)))

    t = synthetic_transcripts(spark, sf_dir, replicate=replicate)
    rg_expr = default_rowgroup_expr(rowgroups)
    if prebucketed:
        # bucketed-table layout: ingest wrote parquet partitioned by the
        # salted rowgroup key, so encode is a shuffle-free columnar scan
        # -> mapInArrow map stage (the production shape: parquet/Iceberg
        # in, encoded warehouse out)
        bdir = "/tmp/cs_cluster/bucketed_input"
        import os as _os
        if not ("--reuse-bucketed" in sys.argv and _os.path.exists(
                f"{bdir}/_SUCCESS")):
            # bucket-file count bounds the per-task working set: each
            # task holds one bucket's rowgroups in flight, and streams
            # beyond ~100 MB working set thrash this host's memory
            # hierarchy when 8 run concurrently (BENCH.md §3d).
            # write_bucketed_layout sorts rows within each bucket file,
            # so the direct scan below can stream in presorted mode
            # (peak task memory = one rowgroup block)
            from columnstore_spark.operators.encode import (
                write_bucketed_layout,
            )
            write_bucketed_layout(
                t, bdir, num_rowgroups=rowgroups, num_buckets=buckets)
        t = spark.read.parquet(bdir).drop("__rg")
        rows = t.count()
    else:
        t = t.persist()
        rows = t.count()
    warmup_python_workers(spark)

    t0 = time.perf_counter()
    if "--direct-scan" in sys.argv:
        # worker-side parquet scan: one task per bucket file, pyarrow
        # reads the file in the Python worker (no JVM columnar scan,
        # no JVM->Python IPC of the raw data)
        import glob as _glob

        from columnstore_spark.operators.encode import encode_files
        paths = sorted(_glob.glob(f"{bdir}/*.parquet"))
        segs = encode_files(spark, paths, rowgroup_col="__rg",
                            presorted=True)
    else:
        # 2 partitions per core: second-wave tasks smooth stragglers
        segs = encode(t, rowgroup_expr=rg_expr, num_rowgroups=rowgroups,
                      num_partitions=max(2 * total_cores, 8),
                      assume_partitioned=prebucketed)
    agg = segs.agg(F.sum("raw_bytes").alias("raw"),
                   F.sum("enc_bytes").alias("enc")).collect()[0]
    wall = time.perf_counter() - t0
    raw = int(agg["raw"])
    print("RESULT " + json.dumps({
        "cores": total_cores, "rows": rows,
        "raw_gb": round(raw / 1e9, 4),
        "enc_gb": round(int(agg["enc"]) / 1e9, 4),
        "wall_s": round(wall, 2),
        "throughput_gbps": round(raw / 1e9 / wall, 4),
        "rows_per_sec": round(rows / wall),
    }))
    if "--stages" in sys.argv:
        import urllib.request
        base = spark.sparkContext.uiWebUrl
        app = json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications"))[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"))
        for s in sorted(stages, key=lambda s: -s["executorRunTime"])[:6]:
            print(f"STAGE id={s['stageId']} tasks={s['numCompleteTasks']} "
                  f"run={s['executorRunTime']/1000:.1f}s "
                  f"cpu={s['executorCpuTime']/1e9:.1f}s "
                  f"gc={s['jvmGcTime']/1000:.1f}s "
                  f"shufW={s['shuffleWriteBytes']>>20}MB "
                  f"shufR={s['shuffleReadBytes']>>20}MB "
                  f"fetchWait={s.get('shuffleFetchWaitTime',0)/1000:.1f}s "
                  f"writeTime={s.get('shuffleWriteTime',0)/1e9:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
