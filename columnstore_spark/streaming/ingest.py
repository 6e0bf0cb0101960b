"""Structured Streaming ingest — the reference's delta-store lifecycle
as micro-batches.

Reference mapping: the delta store absorbs appends into an Open row
group and closes it at capacity
(`/root/reference/Outcompute.ColumnStore/DeltaRowGroup.cs:108-131`,
states Open->Closed->Solid `RowGroupState.cs:3-9`); compaction drains
closed groups (`DeltaStore.TryTakeClosed`, `DeltaStore.cs:63-84`). In
Spark terms each micro-batch IS a set of closed row groups: the stream
trigger is the close event, and `foreachBatch` -> warehouse encode is
the delta->solid compaction, committed through the same manifest
protocol (so a crashed batch re-encodes only its missing rowgroups on
restart — streaming checkpoint + manifest resume compose).

Rowgroup ids are namespaced per batch (`batch_id << 40`) so batches
append disjoint id ranges into one warehouse.

At scale: the input is a file/Kafka stream partitioned by arrival;
each batch shuffles once on the salted conv_id rowgroup key exactly
like the batch path — no per-row Python, no driver state beyond the
streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..codecs import chooser
from ..sources.warehouse import Warehouse

_BATCH_ID_SHIFT = 40  # rowgroup id namespace per micro-batch

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])


def encode_stream(spark: SparkSession, input_path: str, warehouse_root: str,
                  checkpoint: str, schema: T.StructType = TRANSCRIPT_SCHEMA,
                  num_rowgroups: int = 8,
                  rows_per_segment: int = 1_000_000,
                  mode: str = chooser.MODE_SIZE,
                  available_now: bool = True,
                  cluster_by: tuple[str, ...] = (),
                  cluster_bounds: dict | None = None,
                  cluster_bits: int = 16) -> StreamingQuery:
    """Stream transcript parquet files into encoded warehouse segments.

    `available_now=True` drains everything currently in `input_path`
    then stops (test/backfill mode); False runs continuously.

    `cluster_by` lays each micro-batch's rowgroups along a Z-order
    curve (`operators/zorder.py`). Streaming REQUIRES explicit
    `cluster_bounds` (col -> (lo, hi) in the double axis domain,
    timestamps in epoch micros): micro-batches must share one fixed
    grid — per-batch bounds would both cost an extra aggregate per
    trigger and make the layout drift with arrival order. Bounds are
    a retention-window property (e.g. the table's ts span), known in
    production ahead of time; values outside them clamp to edge cells
    (layout-only, never a correctness hazard).
    """
    if cluster_by:
        if not cluster_bounds:
            raise ValueError("streaming cluster_by requires explicit "
                             "cluster_bounds (one fixed grid across "
                             "micro-batches)")
        if set(cluster_bounds) != set(cluster_by):
            raise ValueError(
                "cluster_bounds keys must match cluster_by exactly "
                f"(bounds {sorted(cluster_bounds)} vs "
                f"cluster_by {sorted(cluster_by)})")
        if cluster_bits * len(cluster_by) > 63:
            raise ValueError(
                f"cluster_bits={cluster_bits} x {len(cluster_by)} dims "
                f"exceeds 63 curve bits (use cluster_bits<="
                f"{63 // len(cluster_by)})")
    # a batch's ids are `bucket * 2^20 + block` (default_rowgroup_expr)
    # below its `batch_id << 40` offset — num_rowgroups must keep them
    # inside the 2^40 namespace or batch 0 bleeds into batch 1 and the
    # resume anti-join silently skips data
    if num_rowgroups << 20 >= 1 << _BATCH_ID_SHIFT:
        raise ValueError(
            f"num_rowgroups={num_rowgroups} overflows the per-batch "
            f"rowgroup-id namespace (max {(1 << (_BATCH_ID_SHIFT - 20)) - 1})")
    wh = Warehouse(warehouse_root)
    stream = spark.readStream.schema(schema).parquet(input_path)

    def close_and_compact(batch_df, batch_id: int) -> None:
        # batch = closed row groups; encode is the delta->solid step
        rg = order = None
        if cluster_by:
            from ..operators.zorder import zorder_layout
            # dimension order on the curve = cluster_by order
            rg, order = zorder_layout(
                batch_df, {c: cluster_bounds[c] for c in cluster_by},
                num_rowgroups, cluster_bits)
        wh.encode_resumable(
            batch_df, num_rowgroups=num_rowgroups,
            rows_per_segment=rows_per_segment, mode=mode,
            run_id=f"stream-{batch_id:06d}",
            rowgroup_offset=batch_id << _BATCH_ID_SHIFT,
            rowgroup_expr=rg, order=order)

    writer = (stream.writeStream
              .foreachBatch(close_and_compact)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
