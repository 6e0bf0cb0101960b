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
