"""Top-k pushdown (`operators/topk.py`): manifest-bounds threshold
pruning must return exactly ORDER BY ... LIMIT k (non-null, with
deterministic tie-breaking), while provably-unneeded rowgroups never
decode."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnstore_spark.operators import encode, topk

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("v", T.LongType(), True),
    T.StructField("f", T.DoubleType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("d", T.DecimalType(10, 2), True),
    T.StructField("s", T.StringType(), True),
])


def _data(spark, n=400):
    base = dt.datetime(2025, 3, 1)
    rows = [(f"c{i:03d}",
             None if i % 17 == 0 else (i * 37) % 1000,
             None if i % 13 == 0 else float((i * 53) % 997) / 7,
             base + dt.timedelta(minutes=(i * 11) % 1400),
             Decimal((i * 29) % 500).scaleb(-2),
             f"s{(i * 7) % 100:03d}") for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def segs(spark):
    df = _data(spark)
    return (df, encode(df, rowgroup_expr=F.pmod(F.xxhash64("conv_id"),
                                                F.lit(8)),
                       order=("conv_id",)))


def _expected(df, col, k, desc=True):
    o = F.col(col).desc() if desc else F.col(col).asc()
    return [tuple(r) for r in df.where(F.col(col).isNotNull())
            .orderBy(o, F.col("conv_id").asc()).limit(k)
            .select("conv_id", col).collect()]


@pytest.mark.parametrize("col", ["v", "f", "ts", "d", "s"])
def test_topk_matches_sort_limit(spark, segs, col):
    df, s = segs
    for desc in (True, False):
        got = [tuple(r) for r in
               topk(s, col, 10, descending=desc,
                    columns=["conv_id", col],
                    tie_cols=("conv_id",)).collect()]
        assert got == _expected(df, col, 10, desc), (col, desc)


def test_topk_prunes_rowgroups(spark):
    """Rowgroup-aligned values: top-3 must read ~1 of 8 rowgroups.
    Proven by injecting a poison payload into a rowgroup the bounds
    exclude — the query must succeed without ever decoding it."""
    rows = [(f"c{i:03d}", i) for i in range(400)]
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.LongType(), True)])
    df = spark.createDataFrame(rows, sch)
    s = encode(df, rowgroup_expr=(F.col("v") / 50).cast("long"),
               order=("conv_id",))
    poisoned = s.withColumn(
        "payload",
        F.when((F.col("rowgroup_id") < 6) & (F.col("column") == "v"),
               F.lit(b"\xff broken")).otherwise(F.col("payload")))
    got = [r["v"] for r in topk(poisoned, "v", 3,
                                tie_cols=("conv_id",)).collect()]
    assert got == [399, 398, 397]
    # sanity: decoding a poisoned rowgroup does fail
    from columnstore_spark.operators import decode
    with pytest.raises(Exception):
        decode(poisoned.where(F.col("rowgroup_id") == 0)).collect()


def test_topk_k_exceeds_values_and_errors(spark, segs):
    df, s = segs
    got = [r["v"] for r in topk(s, "v", 10_000,
                                tie_cols=("conv_id",)).collect()]
    exp = [r["v"] for r in df.where(F.col("v").isNotNull())
           .orderBy(F.col("v").desc(), "conv_id").collect()]
    assert got == exp
    with pytest.raises(ValueError, match="positive"):
        topk(s, "v", 0)
    with pytest.raises(ValueError, match="no segments"):
        topk(s, "absent", 5)


def test_topk_facade(spark, tmp_path):
    import os

    from columnstore_spark.sources.transcripts import load_transcripts
    from columnstore_spark.store import TranscriptColumnStore
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    df = load_transcripts(spark, sf)
    store = TranscriptColumnStore(spark, str(tmp_path / "tk"))
    store.add_range(df)
    store.close()
    got = [tuple(r) for r in
           store.topk("ts", 5, columns=["conv_id", "turn_idx", "ts"],
                      tie_cols=("conv_id", "turn_idx")).collect()]
    exp = [tuple(r) for r in df.where(F.col("ts").isNotNull())
           .orderBy(F.col("ts").desc(), "conv_id", "turn_idx").limit(5)
           .select("conv_id", "turn_idx", "ts").collect()]
    assert got == exp


def test_topk_string_prunes_rowgroups(spark):
    """String top-k rides the ASCII-gated repr bounds: rowgroups whose
    max repr can't clear the threshold never decode (poison proof),
    and a rowgroup holding a truncated (>= 64-char) max stays
    unbounded — always decoded, never wrongly pruned."""
    long_tail = "k" + "x" * 80  # truncated repr, sorts between j and l
    rows = ([(f"c{i:03d}", f"{chr(97 + i // 40)}{i:03d}")  # a… j buckets
             for i in range(400)]
            + [(f"d{i:02d}", long_tail) for i in range(10)])
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("s", T.StringType(), True)])
    df = spark.createDataFrame(rows, sch)
    s = encode(df, rowgroup_expr=F.ascii(F.substring("s", 1, 1)) - 97,
               order=("conv_id",))
    poisoned = s.withColumn(
        "payload",
        F.when((F.col("rowgroup_id") < 6) & (F.col("column") == "s"),
               F.lit(b"\xff broken")).otherwise(F.col("payload")))
    got = [r["s"] for r in topk(poisoned, "s", 3,
                                tie_cols=("conv_id",)).collect()]
    exp = [r["s"] for r in df.orderBy(F.col("s").desc(), "conv_id")
           .limit(3).collect()]
    assert got == exp  # the truncated-long-tail rowgroup was decoded
    assert got[0] == long_tail  # …and its rows win the top slots
