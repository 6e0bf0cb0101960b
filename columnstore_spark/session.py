"""SparkSession factory with the engine's required configuration.

UTC session timezone (bit-identical timestamp round-trips and DuckDB
oracle parity), Arrow-batched pandas UDF transfer, AQE with skew-join
handling for the salted conv_id-range shuffle (SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def get_spark(app: str = "columnstore_spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 1 << 13) -> SparkSession:
    # 8k-row arrow batches: the JVM arrow writer streams to the Python
    # worker while it encodes (pipelining); 64k-row batches serialized
    # ~4x slower end-to-end on text-heavy rows (measured on bench.py)
    master = master or os.environ.get("SPARK_MASTER", None) or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # derive a shuffle default only from a local[N] master — any other
    # URL (spark://host:7077, local-cluster[2,1,1024]) must not have
    # its digits concatenated into a partition count
    m = re.fullmatch(r"local\[(\d+)\]", master)
    env = os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS")
    shuffle = shuffle_partitions or (int(env) if env else None) or \
        (int(m.group(1)) if m else None)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if shuffle is not None:
        # cluster masters without an explicit setting keep Spark's own
        # default (AQE coalesces the excess anyway)
        b = b.config("spark.sql.shuffle.partitions", str(shuffle))
    return b.getOrCreate()


def warmup_python_workers(spark: SparkSession) -> None:
    """Spawn + warm the persistent Python worker pool (imports paid once).

    Worker fork + numpy/pyarrow import is a one-time per-executor cost
    (~0.5s quiet, seconds under a 32-way cold-start stampede). On a real
    cluster at the north-rule scale it amortizes to nothing, so
    steady-state throughput measurements should exclude it — call this
    before the timed region (standard JVM/cluster warm-up practice).

    Also pre-faults a large allocator block per worker: on this VM the
    FIRST multi-MB numpy temporary costs 0.5-2 s in page faults
    (measured: 4M-element astype 728 ms first call, 3.5 ms after; a
    one-time glibc mmap->heap threshold bump + fault-in). One 8 MB
    touch at warm-up keeps those pages on the worker's heap, so the
    first real encode task doesn't pay the storm.
    """
    cores = spark.sparkContext.defaultParallelism

    def _touch(batches):
        import numpy as np

        import columnstore_spark.codecs.segment  # noqa: F401
        buf = np.empty(8_000_000, dtype=np.uint8)
        buf.fill(1)
        del buf
        yield from batches

    df = spark.range(cores * 4, numPartitions=cores * 4)
    df.mapInArrow(_touch, df.schema).count()
