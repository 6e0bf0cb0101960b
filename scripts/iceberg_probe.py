"""Iceberg live-run probe (round-2 verdict #7).

Attempts to provision iceberg-spark-runtime via ``spark.jars.packages``
(Maven fetch) and, if the class loads, drives one encode_resumable
through the IcebergBackend end to end. Prints a single JSON report so
the outcome — success OR the exact failure mode — is committable
evidence rather than a silently-skipped test.

Run:  python scripts/iceberg_probe.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import traceback

ICEBERG_COORD = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def main() -> int:
    report: dict = {"coord": ICEBERG_COORD, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    t0 = time.perf_counter()
    try:
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.appName("iceberg_probe")
                 .master("local[4]")
                 .config("spark.jars.packages", ICEBERG_COORD)
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.sql.shuffle.partitions", "4")
                 .getOrCreate())
        report["session_up_sec"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        report["stage"] = "session_build (jar fetch)"
        report["error"] = f"{type(e).__name__}: {e}"
        report["trace_tail"] = traceback.format_exc().splitlines()[-3:]
        print(json.dumps(report))
        return 1

    try:
        from columnstore_spark.sources.storage import iceberg_available
        from columnstore_spark.sources.warehouse import Warehouse
        from columnstore_spark.sources.transcripts import load_transcripts

        report["iceberg_class_loaded"] = iceberg_available(spark)
        if not report["iceberg_class_loaded"]:
            report["stage"] = "classpath_check"
            report["error"] = ("SparkCatalog class not on classpath after "
                              "spark.jars.packages (fetch failed silently?)")
            print(json.dumps(report))
            return 1

        t = load_transcripts(spark, "/root/testdata/sf0.001")
        root = tempfile.mkdtemp(prefix="iceberg_probe_")
        wh = Warehouse(root, format="iceberg")
        res = wh.encode_resumable(t, num_rowgroups=4)
        back = wh.committed_segments(spark).count()
        report["stage"] = "done"
        report["storage"] = res["storage"]
        report["rowgroups"] = res["rowgroups_encoded"]
        report["committed_segment_rows"] = back
        print(json.dumps(report))
        return 0
    except Exception as e:
        report["stage"] = "iceberg_write"
        report["error"] = f"{type(e).__name__}: {e}"
        report["trace_tail"] = traceback.format_exc().splitlines()[-3:]
        print(json.dumps(report))
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
