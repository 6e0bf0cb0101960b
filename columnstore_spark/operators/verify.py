"""Round-trip verification — decoded must equal source exactly under
stable (conv_id, turn_idx) order (north rule; the Spark analogue of the
reference's byte-identical serialization asserts,
`Outcompute.ColumnStore.Tests/DeltaRowGroupTests.cs:213,253`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def roundtrip_equal(source: DataFrame, decoded: DataFrame) -> dict:
    """Exact multiset equality (order-insensitive, duplicate-sensitive).

    Spark's exceptAll treats NaN = NaN and null = null in set ops, which
    is what bit-identical verification wants.
    """
    cols = source.columns
    s = source.persist()
    d = decoded.select(cols).persist()
    try:
        # both sides cached: four result jobs, one decode each side.
        # missing==0 and extra==0 already implies equal counts; the
        # counts are kept as report fields (cheap off the cache).
        missing = s.exceptAll(d).count()
        extra = d.exceptAll(s).count()
        n_source = s.count()
        n_decoded = d.count()
    finally:
        s.unpersist()
        d.unpersist()
    return {
        "equal": missing == 0 and extra == 0,
        "n_source": n_source,
        "n_decoded": n_decoded,
        "missing": missing,
        "extra": extra,
    }
