"""Arrow-side plumbing shared by the encode/decode stages.

Both stages run as ``mapInArrow`` over partitions that were hash-
partitioned and sorted by rowgroup id, so each rowgroup arrives as a
contiguous block of record batches. Streaming the group boundary
detection (instead of ``groupBy().applyInPandas``) keeps peak memory at
one rowgroup and — critically — never materializes per-row Python
objects: strings stay inside Arrow buffers end-to-end
(BASELINE.json input_hint: "no per-row Python").
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import types as T

try:
    from pyspark.sql.pandas.types import to_arrow_schema as _to_arrow_schema
except ImportError:  # pragma: no cover - older pyspark layouts
    _to_arrow_schema = None

_FALLBACK = {
    T.ByteType(): pa.int8(), T.ShortType(): pa.int16(),
    T.IntegerType(): pa.int32(), T.LongType(): pa.int64(),
    T.FloatType(): pa.float32(), T.DoubleType(): pa.float64(),
    T.BooleanType(): pa.bool_(), T.StringType(): pa.string(),
    T.BinaryType(): pa.binary(),
    T.TimestampType(): pa.timestamp("us", tz="UTC"),
    T.TimestampNTZType(): pa.timestamp("us"),
}


def _fallback_type(dt: T.DataType) -> pa.DataType:
    if isinstance(dt, T.ArrayType):
        return pa.list_(_fallback_type(dt.elementType))
    return _FALLBACK[dt]


def arrow_schema_for(schema: T.StructType) -> pa.Schema:
    """The Arrow schema Spark expects from a mapInArrow output batch."""
    if _to_arrow_schema is not None:
        return _to_arrow_schema(schema)
    return pa.schema([(f.name, _fallback_type(f.dataType))
                      for f in schema.fields])


def iter_groups(batches: Iterator[pa.RecordBatch],
                key: str) -> Iterator[tuple[int, pa.Table]]:
    """Yield (key_value, table) per contiguous key block.

    Input batches must be sorted by `key` within the partition (Spark's
    ``sortWithinPartitions`` upstream). Peak memory = one group.
    """
    import numpy as np

    pending: list[pa.RecordBatch] = []
    current: int | None = None
    for batch in batches:
        if batch.num_rows == 0:
            continue
        ids = batch.column(key).to_numpy(zero_copy_only=False)
        bounds = [0, *(np.flatnonzero(ids[1:] != ids[:-1]) + 1).tolist(),
                  len(ids)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            kid = int(ids[s])
            if current is None:
                current = kid
            if kid != current:
                yield current, pa.Table.from_batches(pending)
                pending = []
                current = kid
            pending.append(batch.slice(s, e - s))
    if pending:
        yield current, pa.Table.from_batches(pending)
