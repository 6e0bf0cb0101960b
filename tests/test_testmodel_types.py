"""Mixed-type round-trip mirroring the reference's TestModel
(`DeltaRowGroupTests.cs:256-263`: ``record struct TestModel(int Prop1,
string Prop2, decimal Prop3, double? Prop4, string? Prop5, bool)``) —
plus short/date columns from the reference's encoding specializations
(`Int16SequentialEncoding.cs`). Exact equality through the full
distributed encode -> decode path, nulls included."""

import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnstore_spark.operators import decode, encode

SCHEMA = T.StructType([
    T.StructField("prop1", T.IntegerType(), False),
    T.StructField("prop2", T.StringType(), False),
    T.StructField("prop3", T.DecimalType(18, 4), False),
    T.StructField("prop4", T.DoubleType(), True),
    T.StructField("prop5", T.StringType(), True),
    T.StructField("flag", T.BooleanType(), False),
    T.StructField("small", T.ShortType(), False),
    T.StructField("day", T.DateType(), False),
])


def _rows():
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(600):
        rows.append((
            i % 7,
            f"value_{i % 13:03d}",
            Decimal(i * 10_000 - 3_000_000).scaleb(-4),
            None if i % 5 == 0 else float(i) / 3.0,
            None if i % 3 == 0 else f"opt_{i % 4}",
            i % 2 == 0,
            (i % 100) - 50,
            d0 + datetime.timedelta(days=i % 30),
        ))
    return rows


def test_testmodel_roundtrip(spark):
    df = spark.createDataFrame(_rows(), SCHEMA).withColumn(
        "rid", F.monotonically_increasing_id())
    segs = encode(df, num_rowgroups=3, order=("rid",),
                  rowgroup_expr=F.pmod(F.col("prop1"), F.lit(3)))
    out = decode(segs)
    assert dict((f.name, f.dataType) for f in out.schema.fields) == \
        dict((f.name, f.dataType) for f in df.schema.fields)
    a = sorted(out.collect(), key=lambda r: r["rid"])
    b = sorted(df.collect(), key=lambda r: r["rid"])
    assert a == b


def test_decimal128_kernel_roundtrip():
    """p > 18 decimals: split-word codec, exact round-trip at the
    int128 extremes, nulls included."""
    import pyarrow as pa

    from columnstore_spark.codecs.segment import (
        CODEC_NAMES,
        decode_segment,
        encode_segment,
    )

    typ = pa.decimal128(38, 10)
    big = Decimal("100000000000000000.0000000000")
    values = [
        Decimal("12345678901234567890.0123456789"),
        Decimal("-1234567890123456789012345678.0000000001"),
        None,
        big, big, big,                       # run for the stats
        Decimal("0E-10"),
        # the unscaled-int128 extremes at p=38 (string-built: scaleb
        # would round through the 28-digit default decimal context)
        Decimal("9999999999999999999999999999.9999999999"),
        Decimal("-9999999999999999999999999999.9999999999"),
        None,
    ]
    arr = pa.array(values, type=typ)
    seg = encode_segment(arr)
    assert CODEC_NAMES[seg.codec_id] == "decimal_split"
    assert seg.stats.n_nulls == 2
    assert seg.stats.n_distinct == 6
    assert seg.stats.min_repr == str(-(10**38 - 1))
    assert seg.stats.max_repr == str(10**38 - 1)
    out = decode_segment(seg.payload, seg.logical)
    assert out.type == typ
    assert out.to_pylist() == values


def test_decimal128_hi_word_compresses_away():
    """Realistic wide decimals (small magnitudes at p=38) must not pay
    16 bytes/value: the sign-extension hi word is constant."""
    import pyarrow as pa

    from columnstore_spark.codecs.segment import encode_segment

    typ = pa.decimal128(38, 6)
    values = [Decimal(i).scaleb(-6) for i in range(2000)]
    seg = encode_segment(pa.array(values, type=typ))
    # delta/FoR on the lo word + constant hi word: way under raw 16 B/val
    assert len(seg.payload) < 2000 * 16 / 4


def test_decimal128_query_on_encoded():
    import pyarrow as pa

    from columnstore_spark.codecs.query import query_value, query_window
    from columnstore_spark.codecs.segment import encode_segment

    typ = pa.decimal128(38, 2)
    values = [Decimal("1.25") * i for i in range(40)]
    seg = encode_segment(pa.array(values, type=typ))
    assert query_value(seg.payload, seg.logical, Decimal("6.25")) == [(5, 1)]
    assert query_window(seg.payload, seg.logical, 7, 4).to_pylist() == \
        values[7:11]


def test_decimal128_p38_spark_roundtrip(spark):
    sch = T.StructType([
        T.StructField("k", T.IntegerType(), False),
        T.StructField("d", T.DecimalType(38, 10), True),
    ])
    # keep every operand within the 28-digit default decimal context
    # (and the p=38 unscaled cap): 3**57 has 28 digits
    rows = [(i,
             None if i % 7 == 0 else
             (Decimal(3**i) - Decimal(10**25)).scaleb(-10) * (-1) ** i)
            for i in range(58)]
    df = spark.createDataFrame(rows, sch)
    out = decode(encode(df, rowgroup_expr=F.pmod(F.col("k"), F.lit(2)),
                        order=("k",)))
    assert dict((f.name, f.dataType) for f in out.schema.fields) == \
        dict((f.name, f.dataType) for f in df.schema.fields)
    assert sorted(out.collect()) == sorted(df.collect())


def test_decimal_negative_and_null(spark):
    sch = T.StructType([
        T.StructField("k", T.IntegerType(), False),
        T.StructField("d", T.DecimalType(10, 2), True),
    ])
    rows = [(0, Decimal("-99999999.99")), (1, None),
            (2, Decimal("0.01")), (3, Decimal("99999999.99")), (4, None)]
    df = spark.createDataFrame(rows, sch)
    out = decode(encode(df, rowgroup_expr=F.lit(0), order=("k",)))
    assert sorted(out.collect()) == sorted(df.collect())
