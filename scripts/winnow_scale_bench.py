"""Measure the winnow-fingerprint row expansion at sf1-equivalent scale
(VERDICT r01 #8): text_metrics' one-hash winnowing explodes one row per
char-8-gram position, so the aggregate input is ~corpus-chars rows.
This is linear, map-side, whole-stage-codegen work — the same O(bytes)
any full-content fingerprint (md5 included) pays — but the row count is
the visible cost; this script pins it with a measured number.

Usage: python scripts/winnow_scale_bench.py [replicate]
Replicates sf0.1 documents `replicate`x (default 10 -> ~14.9M gram rows,
the sf1-equivalent corpus), runs the full text_metrics spine, prints one
JSON line {rows_in, gram_rows, seconds, rows_out}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from columnstore_spark.functions.dialect import SPARK  # noqa: E402
from columnstore_spark.functions.pipeline import text_metrics_sql  # noqa: E402
from columnstore_spark.session import get_spark, warmup_python_workers  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app="winnow_scale", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                   .alias("doc_id"), "text")
           .persist())
    rows_in = big.count()
    gram_rows = big.select(
        F.sum(F.greatest(F.length(F.trim("text")) - 7, F.lit(0)))
    ).collect()[0][0]
    big.createOrReplaceTempView("documents")
    warmup_python_workers(spark)

    t0 = time.perf_counter()
    out = spark.sql(text_metrics_sql(SPARK))
    out.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    rows_out = out.count()
    print(json.dumps({
        "rows_in": rows_in,
        "approx_gram_rows": int(gram_rows),
        "seconds": round(sec, 2),
        "rows_out": rows_out,
        "gram_rows_per_sec": round(gram_rows / sec),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
