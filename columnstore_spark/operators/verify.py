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
    d = decoded.select(cols)
    missing = source.exceptAll(d).count()
    extra = d.exceptAll(source).count()
    n_source = source.count()
    n_decoded = d.count()
    return {
        "equal": missing == 0 and extra == 0 and n_source == n_decoded,
        "n_source": n_source,
        "n_decoded": n_decoded,
        "missing": missing,
        "extra": extra,
    }
