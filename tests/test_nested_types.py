"""Nested-type columns (array/map/struct) through the Arrow-IPC body
codec — the reference's DefaultEncoding covers "complex types,
including heap based object graphs"
(`/root/reference/Outcompute.ColumnStore/Encodings/DefaultEncoding.cs:6-11`);
round-2 verdict #5: the engine must not reject the testdata's own
`embeddings` table (array<float>).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnstore_spark.operators import decode, encode
from columnstore_spark.sources.warehouse import Warehouse

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_embeddings_roundtrip_bit_identical(spark):
    """array<float> through encode/decode: every element bit-exact
    (IPC moves the raw child buffers; no float reformatting)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    segs = encode(emb, order=("vec_id",),
                  rowgroup_expr=F.pmod(F.col("vec_id"), F.lit(8)))
    got = {r["vec_id"]: (r["embedding"], r["label"])
           for r in decode(segs).collect()}
    want = {r["vec_id"]: (r["embedding"], r["label"])
            for r in emb.collect()}
    assert got == want  # exact float equality, all rows

    # the manifest records the codec and carries the DDL-bearing logical
    meta = (segs.select("column", "codec", "logical_type").distinct()
            .collect())
    by_col = {r["column"]: r for r in meta}
    assert by_col["embedding"]["codec"] == "arrow_ipc"
    assert by_col["embedding"]["logical_type"] == "nested:array<float>"


def test_embeddings_through_warehouse(spark, tmp_path):
    """The whole commit protocol accepts the nested column: encode ->
    manifest commit -> committed read-back, bit-identical."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    wh = Warehouse(str(tmp_path / "wh"))
    # warehouse rowgroups key on conv_id/turn_idx; adapt the frame
    df = emb.withColumnRenamed("vec_id", "turn_idx") \
            .withColumn("conv_id", F.lit("emb"))
    wh.encode_resumable(df, num_rowgroups=4)
    back = decode(wh.committed_segments(spark))
    got = {r["turn_idx"]: r["embedding"] for r in back.collect()}
    want = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert got == want


def test_struct_and_map_columns(spark):
    """struct + map + array-of-struct columns round-trip (nulls held in
    the IPC validity bitmaps, not the frame header)."""
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("meta", T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]), True),
        T.StructField("tags", T.MapType(T.StringType(), T.IntegerType()),
                      True),
        T.StructField("spans", T.ArrayType(T.StructType([
            T.StructField("s", T.IntegerType()),
            T.StructField("e", T.IntegerType()),
        ])), True),
    ])
    rows = [("c0", i,
             None if i % 5 == 0 else (i, f"m{i}"),
             {f"k{i % 3}": i},
             [(i, i + 1), (i + 2, i + 3)] if i % 2 else [])
            for i in range(100)]
    df = spark.createDataFrame(rows, schema)
    segs = encode(df, num_rowgroups=2)
    back = decode(segs)
    got = sorted([r.asDict(recursive=True) for r in back.collect()],
                 key=lambda r: r["turn_idx"])
    want = sorted([r.asDict(recursive=True) for r in df.collect()],
                  key=lambda r: r["turn_idx"])
    assert got == want


def test_facade_query_on_nested_column(spark, tmp_path):
    """query_by_value on an array column: pruning no-ops (no bounds for
    nested logicals) and the facade falls back to decode + Spark's own
    array equality instead of the Arrow probe kernels."""
    from columnstore_spark.store import TranscriptColumnStore

    rows = [(f"c{i}", i, [float(i % 3), 1.0]) for i in range(60)]
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])
    df = spark.createDataFrame(rows, schema)
    store = TranscriptColumnStore(spark, str(tmp_path / "ns"),
                                  num_rowgroups=2)
    store.add_range(df)
    store.close()
    got = store.query_by_value("vec", [2.0, 1.0]).count()
    assert got == df.where(F.col("vec") == F.array(F.lit(2.0),
                                                   F.lit(1.0))).count() > 0
