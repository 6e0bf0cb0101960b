"""Distributed decode stage — the bit-identical inverse of encode.

Reference analogue: solid row-group enumeration — one enumerator per
column segment advanced in lockstep to rebuild rows
(`/root/reference/Outcompute.ColumnStore.CodeGenerator/SolidRowGroupGenerator.cs:29-40`,
full-scan S5 `Segments/ColumnSegment.cs:163-188`). Here: group the
segments table by rowgroup, decode every column payload vectorized, and
emit the reassembled Arrow batch with the original schema.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..codecs.segment import decode_segment

_LOGICAL_TO_SPARK = {
    "int8": T.ByteType(), "int16": T.ShortType(), "int32": T.IntegerType(),
    "int64": T.LongType(), "float32": T.FloatType(), "float64": T.DoubleType(),
    "bool": T.BooleanType(), "string": T.StringType(), "binary": T.BinaryType(),
    "timestamp_s": T.TimestampType(), "timestamp_ms": T.TimestampType(),
    "timestamp_us": T.TimestampType(), "timestamp_ns": T.TimestampType(),
}


def schema_from_segments(segments: DataFrame) -> T.StructType:
    """Reconstruct the original Spark schema from segment metadata."""
    cols = (segments.select("column", "col_idx", "logical_type", "n_nulls")
            .groupBy("column", "col_idx", "logical_type")
            .max("n_nulls").collect())
    fields = sorted(cols, key=lambda r: r["col_idx"])
    return T.StructType([
        T.StructField(r["column"], _LOGICAL_TO_SPARK[r["logical_type"]],
                      bool(r["max(n_nulls)"] > 0) or True)
        for r in fields
    ])


def decode(segments: DataFrame, schema: T.StructType | None = None) -> DataFrame:
    """segments table -> DataFrame with the original schema.

    Row order inside each rowgroup is the encode order; global order is
    restored by the verifier's (conv_id, turn_idx) sort (SURVEY.md §3.2).
    """
    if schema is None:
        schema = schema_from_segments(segments)
    names = [f.name for f in schema.fields]

    def decode_rowgroup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("col_idx")
        arrays, out_names = [], []
        for row in pdf.itertuples(index=False):
            arr = decode_segment(row.payload, row.logical_type)
            arrays.append(arr)
            out_names.append(row.column)
        tbl = pa.Table.from_arrays(arrays, names=out_names).select(names)
        return tbl.to_pandas(types_mapper=None)

    return (
        segments.select("rowgroup_id", "column", "col_idx", "logical_type",
                        "payload")
        .groupBy("rowgroup_id")
        .applyInPandas(decode_rowgroup, schema=schema)
    )
