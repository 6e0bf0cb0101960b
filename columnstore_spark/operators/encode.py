"""Distributed encode stage — the reference's delta->solid compaction
(`ColumnStore.TryCompact`, stubbed at
`/root/reference/Outcompute.ColumnStore/ColumnStore.cs:92-99`; intended
behavior = generated `SolidRowGroupFactory.Create`,
`SolidRowGroupFactoryGenerator.cs:30-66`) re-expressed as one Spark
shuffle + embarrassingly parallel partition-local columnar encoding.

Plan shape (SURVEY.md §7.1):
    input -> [rowgroup_id assignment] -> groupBy(rowgroup_id)
          -> applyInPandas(encode rowgroup)  [Arrow-vectorized, no per-row
             Python] -> one output row per (rowgroup, column) with payload
             + exact stats — the segments table.

Skew handling: the rowgroup id both hash-buckets conversations AND splits
a single huge conversation at `rows_per_segment` turn blocks (salting),
so a zipf-head conversation cannot create a straggler partition.
"""

from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import CODEC_NAMES, chooser
from ..codecs.segment import encode_segment

ROWGROUP_COL = "__rowgroup_id"
_TURN_BLOCKS = 1 << 20  # max turn blocks per conversation bucket

SEGMENT_SCHEMA = T.StructType([
    T.StructField("rowgroup_id", T.LongType(), False),
    T.StructField("column", T.StringType(), False),
    T.StructField("col_idx", T.IntegerType(), False),
    T.StructField("codec", T.StringType(), False),
    T.StructField("codec_id", T.IntegerType(), False),
    T.StructField("logical_type", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("n_nulls", T.LongType(), False),
    T.StructField("n_distinct", T.LongType(), False),
    T.StructField("n_runs", T.LongType(), False),
    T.StructField("min_repr", T.StringType(), True),
    T.StructField("max_repr", T.StringType(), True),
    T.StructField("raw_bytes", T.LongType(), False),
    T.StructField("enc_bytes", T.LongType(), False),
    T.StructField("checksum", T.StringType(), False),
    T.StructField("encode_ms", T.DoubleType(), False),
])

_SPARK_TO_PA = {
    T.ByteType(): pa.int8(), T.ShortType(): pa.int16(),
    T.IntegerType(): pa.int32(), T.LongType(): pa.int64(),
    T.FloatType(): pa.float32(), T.DoubleType(): pa.float64(),
    T.BooleanType(): pa.bool_(), T.StringType(): pa.large_utf8(),
    T.BinaryType(): pa.large_binary(), T.TimestampType(): pa.timestamp("us"),
    T.TimestampNTZType(): pa.timestamp("us"),
}


def pa_type_for(spark_type: T.DataType) -> pa.DataType:
    try:
        return _SPARK_TO_PA[spark_type]
    except KeyError:
        raise TypeError(f"unsupported Spark type {spark_type}") from None


def default_rowgroup_expr(num_rowgroups: int,
                          rows_per_segment: int = 1_000_000) -> Column:
    """Salted, skew-aware rowgroup assignment (SURVEY.md §4.2).

    Hash-buckets conversations into `num_rowgroups` groups and splits any
    conversation longer than `rows_per_segment` turns into separate
    rowgroups — a zipf-head conversation can't produce a straggler.
    """
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(num_rowgroups))
    block = (F.col("turn_idx").cast("long") / F.lit(rows_per_segment)).cast("long")
    return bucket * _TURN_BLOCKS + block


def encode(df: DataFrame, rowgroup_expr: Column | None = None,
           num_rowgroups: int | None = None,
           rows_per_segment: int = 1_000_000,
           order: tuple[str, ...] = ("conv_id", "turn_idx"),
           mode: str = chooser.MODE_SIZE) -> DataFrame:
    """Encode `df` into the segments table (one row per rowgroup x column).

    One shuffle (groupBy rowgroup_id); everything else is partition-local
    and Arrow-vectorized. Result schema: SEGMENT_SCHEMA.
    """
    if rowgroup_expr is None:
        if num_rowgroups is None:
            n = df.count()
            num_rowgroups = max(1, -(-n // rows_per_segment))
        rowgroup_expr = default_rowgroup_expr(num_rowgroups, rows_per_segment)

    input_schema = df.schema
    order_cols = [c for c in order if c in df.columns]
    pa_types = {f.name: pa_type_for(f.dataType) for f in input_schema.fields}
    col_order = list(df.columns)

    def encode_rowgroup(pdf: pd.DataFrame) -> pd.DataFrame:
        rowgroup_id = int(pdf[ROWGROUP_COL].iloc[0])
        if order_cols:
            # stable sort: clusters runs per conversation (the compression-
            # order step, reference S7) while keeping (conv_id, turn_idx)
            # order restorable for the bit-identical verify
            pdf = pdf.sort_values(order_cols, kind="mergesort")
        rows = []
        for idx, name in enumerate(col_order):
            t0 = time.perf_counter()
            arr = pa.Array.from_pandas(pdf[name], type=pa_types[name])
            seg = encode_segment(arr, mode=mode)
            ms = (time.perf_counter() - t0) * 1000.0
            st = seg.stats
            rows.append((rowgroup_id, name, idx, CODEC_NAMES[seg.codec_id],
                         seg.codec_id, seg.logical, seg.payload, st.n_rows,
                         st.n_nulls, st.n_distinct, st.n_runs, st.min_repr,
                         st.max_repr, st.raw_bytes, len(seg.payload),
                         seg.checksum, ms))
        return pd.DataFrame(rows, columns=[f.name for f in SEGMENT_SCHEMA])

    return (
        df.withColumn(ROWGROUP_COL, rowgroup_expr.cast("long"))
        .groupBy(ROWGROUP_COL)
        .applyInPandas(encode_rowgroup, schema=SEGMENT_SCHEMA)
    )


def manifest_of(segments: DataFrame) -> DataFrame:
    """Metadata-only view of the segments table (the stats tree T1-T4,
    `ColumnStoreStats.cs:7-38`, flattened to rows)."""
    return segments.drop("payload")
