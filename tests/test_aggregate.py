"""Manifest-only aggregate pushdown (`operators/aggregate.py`):
COUNT/MIN/MAX/SUM from per-segment stats with the unknown-beats-wrong
NULL contract — the store-wide rollup of the reference's typed stats
tree (`Sequences/Stats.cs:3`)."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnstore_spark.operators import encode
from columnstore_spark.operators.aggregate import aggregate_segments


def _rg():
    return F.pmod(F.xxhash64("conv_id"), F.lit(2))


def _agg(spark, rows, schema, **enc):
    df = spark.createDataFrame(rows, schema)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",), **enc)
    out = aggregate_segments(segs)
    return {r["col_name"]: r.asDict() for r in out.collect()}


SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("v", T.LongType(), True),
])


def test_int_counts_bounds_sum(spark):
    rows = [(f"c{i:03d}", (i * 7 - 50) if i % 3 else None)
            for i in range(40)]
    a = _agg(spark, rows, SCHEMA)["v"]
    vals = [v for _, v in rows if v is not None]
    assert a["n_rows"] == 40
    assert a["n_nulls"] == 40 - len(vals)
    assert a["n_values"] == len(vals)
    assert a["min_long"] == min(vals)
    assert a["max_long"] == max(vals)
    assert a["sum_dec"] == Decimal(sum(vals))
    assert a["min_str"] is None and a["min_dbl"] is None


def test_string_prefix_bounds(spark):
    long_min = "aa" + "x" * 100   # beyond the 64-char repr cap
    rows = [("c1", long_min), ("c2", "zz-top"), ("c3", None)]
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.StringType(), True)])
    a = _agg(spark, rows, sch)["v"]
    assert a["min_str"] == long_min[:64]   # truncation preserves order
    assert a["max_str"] == "zz-top"
    assert a["min_long"] is None and a["sum_dec"] is None


def test_nonascii_string_bounds_unknown(spark):
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.StringType(), True)])
    a = _agg(spark, [("c1", "café"), ("c2", "abc")], sch)["v"]
    # UTF-8-byte vs UTF-16 vs code-point orders can disagree: unknown
    assert a["min_str"] is None and a["max_str"] is None
    assert a["n_values"] == 2   # counts stay exact


def test_float_bounds_and_nan_poison(spark):
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.DoubleType(), True)])
    a = _agg(spark, [("c1", 1.5), ("c2", -2.25), ("c3", None)], sch)["v"]
    assert a["min_dbl"] == -2.25 and a["max_dbl"] == 1.5
    assert a["sum_dec"] is None   # float sums are order-dependent
    b = _agg(spark, [("c1", 1.5), ("c2", float("nan"))], sch)["v"]
    assert b["min_dbl"] is None and b["max_dbl"] is None
    assert b["n_values"] == 2


def test_timestamp_epoch_domain(spark):
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.TimestampType(), True)])
    t0 = dt.datetime(2024, 1, 1)
    rows = [("c%d" % i, t0 + dt.timedelta(seconds=i)) for i in range(5)]
    a = _agg(spark, rows, sch)["v"]
    e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert a["min_long"] == e0
    assert a["max_long"] == e0 + 4_000_000
    assert a["sum_dec"] == Decimal(5 * e0 + 10_000_000)


def test_decimal_unscaled_domain(spark):
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.DecimalType(10, 2), True)])
    rows = [("c1", Decimal("1.50")), ("c2", Decimal("-0.25")),
            ("c3", Decimal("100.00"))]
    a = _agg(spark, rows, sch)["v"]
    assert a["min_long"] == -25 and a["max_long"] == 10000
    assert a["sum_dec"] == Decimal(150 - 25 + 10000)


def test_decimal128_exact_wide_sum(spark):
    sch = T.StructType([T.StructField("conv_id", T.StringType(), False),
                        T.StructField("v", T.DecimalType(38, 0), True)])
    big = int("9" * 25)
    rows = [("c1", Decimal(big)), ("c2", Decimal(big)),
            ("c3", Decimal(-17))]
    a = _agg(spark, rows, sch)["v"]
    assert a["sum_dec"] == Decimal(2 * big - 17)
    # bounds exceed int64 -> unknown, never a wrapped number
    assert a["min_long"] is None and a["max_long"] is None


def test_back_compat_without_sum_column(spark):
    rows = [("c%d" % i, i) for i in range(10)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",)).drop("sum_repr")
    a = {r["col_name"]: r.asDict()
         for r in aggregate_segments(segs).collect()}["v"]
    assert a["sum_dec"] is None          # unknown, not an error
    assert a["min_long"] == 0 and a["max_long"] == 9


def test_all_null_column(spark):
    rows = [("c%d" % i, None) for i in range(6)]
    a = _agg(spark, rows, SCHEMA)["v"]
    assert a["n_values"] == 0 and a["n_nulls"] == 6
    assert a["min_long"] is None and a["sum_dec"] is None


# --------------------------------------------------------------------------
# group_count: encoded-domain GROUP BY
# --------------------------------------------------------------------------


def test_group_count_matches_spark(spark):
    from columnstore_spark.operators.aggregate import group_count
    rows = [(f"c{i:03d}", i % 5 if i % 7 else None) for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {r["value"]: r["cnt"] for r in group_count(segs, "v").collect()}
    exp = {r[0]: r[1] for r in df.groupBy("v").count().collect()}
    assert got == exp          # includes the NULL group
    assert None in got


def test_group_count_string_and_decimal(spark):
    from columnstore_spark.operators.aggregate import group_count
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.DecimalType(10, 2), True),
    ])
    rows = [(f"c{i:02d}", ["aa", "bb", None][i % 3],
             Decimal(i % 4).scaleb(-2)) for i in range(60)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    for col in ("s", "d"):
        got = {r["value"]: r["cnt"]
               for r in group_count(segs, col).collect()}
        exp = {r[0]: r[1] for r in df.groupBy(col).count().collect()}
        assert got == exp, col


def test_group_count_constant_column(spark):
    from columnstore_spark.operators.aggregate import group_count
    rows = [(f"c{i:02d}", 42) for i in range(30)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {r["value"]: r["cnt"] for r in group_count(segs, "v").collect()}
    assert got == {42: 30}


def test_group_count_unknown_column(spark):
    from columnstore_spark.operators.aggregate import group_count
    rows = [(f"c{i:02d}", i) for i in range(10)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    with pytest.raises(ValueError, match="no segments"):
        group_count(segs, "absent")


def test_value_counts_kernel_no_expansion_paths(spark):
    """The dict fast path must agree with a forced plain decode."""
    import pyarrow as pa
    from columnstore_spark.codecs import dictrle, plain
    from columnstore_spark.codecs.query import value_counts
    from columnstore_spark.codecs.segment import encode_segment
    arr = pa.array(["x"] * 5 + ["y"] * 3 + [None, "x", "z"])
    by_codec = {}
    for codec in (dictrle.CODEC_ID, plain.CODEC_ID):
        seg = encode_segment(arr, codec=codec)
        vals, counts, n_nulls = value_counts(seg.payload, seg.logical)
        by_codec[codec] = (sorted(zip(vals.to_pylist(),
                                      counts.tolist())), n_nulls)
    assert by_codec[dictrle.CODEC_ID] == by_codec[plain.CODEC_ID]
    assert by_codec[dictrle.CODEC_ID] == ([("x", 6), ("y", 3), ("z", 1)], 1)


# --------------------------------------------------------------------------
# group_agg: encoded-domain grouped aggregates
# --------------------------------------------------------------------------


def _spark_group_agg(df, group_col, agg_col):
    exp = df.groupBy(F.col(group_col).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(agg_col).alias("n_agg"),
        F.sum(agg_col).cast("long").alias("sum_agg"),
        F.min(agg_col).alias("min_agg"),
        F.max(agg_col).alias("max_agg"))
    return {r["value"]: (r["cnt"], r["n_agg"], r["sum_agg"],
                         r["min_agg"], r["max_agg"])
            for r in exp.collect()}


def test_group_agg_matches_spark_with_nulls(spark):
    """Nulls in BOTH columns: group nulls form one group, agg nulls
    count in cnt but not n_agg/sum/min/max."""
    from columnstore_spark.operators.aggregate import group_agg
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    rows = [(f"c{i:03d}",
             None if i % 11 == 0 else f"g{i % 4}",
             None if i % 7 == 0 else i * 3 - 100) for i in range(300)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    out = group_agg(segs, "g", "v")
    got = {r["value"]: (r["cnt"], r["n_agg"], r["sum_agg"],
                        r["min_agg"], r["max_agg"])
           for r in out.collect()}
    assert got == _spark_group_agg(df, "g", "v")
    assert None in got


def test_group_agg_temporal_and_float(spark):
    from columnstore_spark.operators.aggregate import group_agg
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.IntegerType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("f", T.DoubleType(), True),
    ])
    base = dt.datetime(2025, 1, 1)
    rows = [(f"c{i:02d}", i % 3,
             base + dt.timedelta(minutes=i) if i % 5 else None,
             dt.date(2025, 1, 1 + i % 27),
             float(i) * 0.5) for i in range(90)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    for col in ("ts", "d"):
        out = {r["value"]: (r["cnt"], r["n_agg"], r["min_agg"], r["max_agg"])
               for r in group_agg(segs, "g", col)
               .select("value", "cnt", "n_agg", "min_agg", "max_agg")
               .collect()}
        exp = {r["value"]: (r["cnt"], r["n_agg"], r["min_agg"], r["max_agg"])
               for r in df.groupBy(F.col("g").alias("value")).agg(
                   F.count(F.lit(1)).alias("cnt"),
                   F.count(col).alias("n_agg"),
                   F.min(col).alias("min_agg"),
                   F.max(col).alias("max_agg")).collect()}
        assert out == exp, col
    # float: min/max exact; sums compared exactly too (each value is a
    # dyadic rational, so float64 addition is exact here)
    out = {r["value"]: (r["sum_agg"], r["min_agg"], r["max_agg"])
           for r in group_agg(segs, "g", "f").collect()}
    exp = {r["g"]: (r["s"], r["lo"], r["hi"])
           for r in df.groupBy("g").agg(
               F.sum("f").alias("s"), F.min("f").alias("lo"),
               F.max("f").alias("hi")).collect()}
    assert out == exp


def test_group_agg_group_by_self_and_errors(spark):
    from columnstore_spark.operators.aggregate import group_agg
    rows = [(f"c{i:02d}", i % 4) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {r["value"]: (r["cnt"], r["sum_agg"])
           for r in group_agg(segs, "v", "v").collect()}
    assert got == {k: (10, 10 * k) for k in range(4)}
    with pytest.raises(ValueError, match="no segments"):
        group_agg(segs, "absent", "v")
    with pytest.raises(ValueError, match="unsupported agg"):
        group_agg(segs, "v", "conv_id")


def test_group_agg_where_pushdown(spark):
    """Equality predicate pushed into the encoded pass matches Spark's
    filter-then-groupBy, including a probe that matches nothing."""
    from columnstore_spark.operators.aggregate import group_agg
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.StringType(), True),
        T.StructField("w", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    rows = [(f"c{i:03d}", f"g{i % 3}",
             None if i % 13 == 0 else f"w{i % 5}",
             None if i % 7 == 0 else i) for i in range(260)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {r["value"]: (r["cnt"], r["n_agg"], r["sum_agg"],
                        r["min_agg"], r["max_agg"])
           for r in group_agg(segs, "g", "v", where=("w", "w2")).collect()}
    assert got == _spark_group_agg(df.where(F.col("w") == "w2"), "g", "v")
    assert group_agg(segs, "g", "v", where=("w", "nope")).count() == 0
    with pytest.raises(ValueError, match="non-null"):
        group_agg(segs, "g", "v", where=("w", None))


def test_group_agg_composite_key(spark):
    """Multi-column GROUP BY: mixed-radix combined codes match Spark's
    groupBy over both columns, nulls in either key included."""
    from columnstore_spark.operators.aggregate import group_agg
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("a", T.StringType(), True),
        T.StructField("b", T.IntegerType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    rows = [(f"c{i:03d}",
             None if i % 11 == 0 else f"a{i % 3}",
             None if i % 5 == 0 else i % 4,
             None if i % 7 == 0 else i) for i in range(330)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {(r["a"], r["b"]): (r["cnt"], r["n_agg"], r["sum_agg"],
                              r["min_agg"], r["max_agg"])
           for r in group_agg(segs, ["a", "b"], "v").collect()}
    exp = {(r["a"], r["b"]): (r["cnt"], r["n_agg"], r["sum_agg"],
                              r["lo"], r["hi"])
           for r in df.groupBy("a", "b").agg(
               F.count(F.lit(1)).alias("cnt"),
               F.count("v").alias("n_agg"),
               F.sum("v").alias("sum_agg"),
               F.min("v").alias("lo"), F.max("v").alias("hi")).collect()}
    assert got == exp
    # composite key + pushed predicate compose
    got_w = {(r["a"], r["b"]): r["cnt"]
             for r in group_agg(segs, ["a", "b"], "v",
                                where=("b", 2)).collect()}
    exp_w = {(r["a"], r["b"]): r["cnt"]
             for r in df.where(F.col("b") == 2).groupBy("a", "b")
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got_w == exp_w
    with pytest.raises(ValueError, match="collide"):
        group_agg(segs, ["a", "cnt"], "v")
    with pytest.raises(ValueError, match="at least one"):
        group_agg(segs, [], "v")


def test_count_matching(spark):
    from columnstore_spark.operators.aggregate import count_matching
    rows = [(f"c{i:03d}", None if i % 9 == 0 else i % 5)
            for i in range(180)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    for probe in (0, 3, 99):
        got = count_matching(segs, "v", probe).collect()[0]["cnt"]
        assert got == df.where(F.col("v") == probe).count(), probe
    with pytest.raises(ValueError, match="non-null"):
        count_matching(segs, "v", None)


def test_count_by_value_facade(spark, tmp_path):
    import os

    from columnstore_spark.sources.transcripts import load_transcripts
    from columnstore_spark.store import TranscriptColumnStore
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    t = load_transcripts(spark, sf)
    store = TranscriptColumnStore(spark, str(tmp_path / "cw"))
    store.add_range(t)
    store.close()
    exp = t.where(F.col("role") == "tool").count()
    assert store.count_by_value("role", "tool").collect()[0]["cnt"] == exp
    # coercion probe (string on int) falls back to decode-then-count
    exp3 = t.where(F.col("turn_idx") == 3).count()
    assert (store.count_by_value("turn_idx", "3")
            .collect()[0]["cnt"] == exp3)
    assert (store.count_by_value("turn_idx", 3)
            .collect()[0]["cnt"] == exp3)


def test_count_matching_fully_pruned_is_zero(spark):
    """An empty (fully-pruned) segment set legitimately counts 0 —
    never an error: pruning hands this operator empty inputs whenever
    the manifest proves nothing can match."""
    from columnstore_spark.operators.aggregate import count_matching
    rows = [(f"c{i:02d}", i) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    empty = segs.where(F.lit(False))
    assert count_matching(empty, "v", 1).collect()[0]["cnt"] == 0


def test_group_by_float_key_normalizes_like_spark(spark):
    """SQL groups -0.0 with 0.0 and all NaNs together. The encoded
    kernels factorize float BIT PATTERNS (bit-identical round-trip
    requirement), so the partials may carry -0.0/0.0/NaN-payload rows
    separately — the final Spark groupBy must merge them back to
    exactly Spark's own grouping."""
    import math

    from columnstore_spark.operators.aggregate import group_agg, group_count
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.DoubleType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    keys = [0.0, -0.0, float("nan"), 1.5, None]
    rows = [(f"c{i:02d}", keys[i % 5], i) for i in range(100)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))

    def norm(k):
        if k is None:
            return None
        return "nan" if math.isnan(k) else k + 0.0

    got = {norm(r["value"]): r["cnt"]
           for r in group_count(segs, "g").collect()}
    exp = {norm(r["g"]): r["count"]
           for r in df.groupBy("g").count().collect()}
    assert got == exp
    got_a = {norm(r["value"]): (r["cnt"], r["sum_agg"])
             for r in group_agg(segs, "g", "v").collect()}
    exp_a = {norm(r["g"]): (r["c"], r["s"])
             for r in df.groupBy("g").agg(
                 F.count(F.lit(1)).alias("c"),
                 F.sum("v").alias("s")).collect()}
    assert got_a == exp_a


def test_group_agg_stored_unit_timestamps(spark, tmp_path):
    """A timestamp_s column (Arrow-ingested; Spark can't create one)
    must come back as real instants: epoch ints in the STORED unit
    cast to timestamp(us) would reinterpret and land in 1970. Temporal
    sum_agg is NULL by contract (SQL defines no timestamp SUM and
    epoch sums overflow int64)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from columnstore_spark.operators import encode_files
    from columnstore_spark.operators.aggregate import group_agg

    base = 1_577_836_800  # 2020-01-01T00:00:00Z, seconds
    tbl = pa.table({
        "__rg": pa.array([0, 0, 0, 1, 1, 1], type=pa.int64()),
        "g": pa.array([0, 1, 0, 1, 0, 1], type=pa.int32()),
        "ts": pa.array([base + i * 60 for i in range(6)],
                       type=pa.timestamp("s")),
    })
    path = str(tmp_path / "ts_s.parquet")
    pq.write_table(tbl, path)
    segs = encode_files(spark, [path], presorted=True)

    out = {r["value"]: r for r in group_agg(segs, "g", "ts").collect()}
    exp_min = {0: base, 1: base + 60}
    exp_max = {0: base + 240, 1: base + 300}
    for g in (0, 1):
        got_min = int(out[g]["min_agg"]
                      .replace(tzinfo=dt.timezone.utc).timestamp())
        got_max = int(out[g]["max_agg"]
                      .replace(tzinfo=dt.timezone.utc).timestamp())
        assert got_min == exp_min[g], (g, out[g]["min_agg"])
        assert got_max == exp_max[g]
        assert out[g]["sum_agg"] is None
        assert out[g]["cnt"] == 3


def test_uint_columns_decode_and_aggregate(spark, tmp_path):
    """Arrow-ingested unsigned ints: decode widens losslessly (uint64
    above 2^63 -> decimal(20,0)); group/distinct aggregates work on
    the sub-64-bit uints and uint64 agg raises cleanly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from columnstore_spark.operators import decode, encode_files
    from columnstore_spark.operators.aggregate import (
        group_agg,
        group_count,
    )

    big = (1 << 63) + 5
    tbl = pa.table({
        "__rg": pa.array([0, 0, 1, 1], type=pa.int64()),
        "u32": pa.array([1, 2, 1, 4_000_000_000], type=pa.uint32()),
        "u64": pa.array([1, big, 2, 3], type=pa.uint64()),
    })
    path = str(tmp_path / "uints.parquet")
    pq.write_table(tbl, path)
    segs = encode_files(spark, [path], presorted=True)

    rows = decode(segs).orderBy("u64").collect()
    assert [int(r["u64"]) for r in rows] == [1, 2, 3, big]
    assert sorted(int(r["u32"]) for r in rows) == [1, 1, 2, 4_000_000_000]

    got = {int(r["value"]): r["cnt"]
           for r in group_count(segs, "u32").collect()}
    assert got == {1: 2, 2: 1, 4_000_000_000: 1}

    ga = {int(r["value"]): int(r["sum_agg"])
          for r in group_agg(segs, "u64", "u32").collect()
          if r["value"] is not None and int(r["value"]) < (1 << 62)}
    # rows pair (u32, u64) as (1,1), (2,big), (1,2), (4e9,3)
    assert ga == {1: 1, 2: 1, 3: 4_000_000_000}

    with _pytest.raises(Exception, match="unsupported agg column"):
        group_agg(segs, "u32", "u64").collect()


def test_facade_group_agg_fallback_rejects_uint64(spark, tmp_path):
    """Review fix: the facade's decode-fallback branch must reject the
    same agg types the operator path rejects (uint64 summed via
    .cast('long') silently NULLs values >= 2^63 — a wrong number).
    uint64 isn't reachable through facade ingest today, so pin the
    contract by forcing the fallback with a uint64 logical type."""
    import pytest as _pytest

    from columnstore_spark.sources.transcripts import load_transcripts
    from columnstore_spark.store import TranscriptColumnStore

    store = TranscriptColumnStore(spark, str(tmp_path / "u64f"),
                                  num_rowgroups=2)
    store.add_range(load_transcripts(spark, "/root/testdata/sf0.001"))
    store.close()

    orig = store._logical_type
    store._logical_type = (lambda m, c, _o=orig:
                           "uint64" if c == "turn_idx" else _o(m, c))
    # a float probe on the string role column is kernel-unsafe ->
    # fallback branch; the (forced) uint64 agg type must raise there
    with _pytest.raises(ValueError, match="unsupported agg column"):
        store.group_agg("role", "turn_idx", where=("turn_idx", 0.5))


def test_group_agg_float_nan_min_like_spark(spark):
    """Spark orders NaN ABOVE every double: MIN skips NaN unless the
    whole group is NaN, MAX returns NaN when the group holds one, SUM
    propagates. One rowgroup forces the kernel's reduceat partials to
    carry the semantics themselves (pre-fix np.minimum made
    min([1.0, NaN]) = NaN)."""
    import math

    from columnstore_spark.operators.aggregate import group_agg
    nan = float("nan")
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.IntegerType(), True),
        T.StructField("f", T.DoubleType(), True),
    ])
    rows = [("c0", 0, 1.0), ("c1", 0, nan), ("c2", 0, 2.0),
            ("c3", 1, nan), ("c4", 1, nan),
            ("c5", 2, 3.0), ("c6", 2, 4.0), ("c7", 2, None)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=F.lit(0), order=("conv_id",))
    got = {r["value"]: r for r in group_agg(segs, "g", "f").collect()}

    def same(a, b):
        if isinstance(a, float) and isinstance(b, float) \
                and math.isnan(a) and math.isnan(b):
            return True
        return a == b

    exp = df.groupBy(F.col("g").alias("value")).agg(
        F.count(F.lit(1)).alias("cnt"), F.count("f").alias("n_agg"),
        F.sum("f").alias("sum_agg"), F.min("f").alias("min_agg"),
        F.max("f").alias("max_agg")).collect()
    assert len(exp) == len(got) == 3
    for r in exp:
        g = got[r["value"]]
        for k in ("cnt", "n_agg", "sum_agg", "min_agg", "max_agg"):
            assert same(g[k], r[k]), (r["value"], k, g[k], r[k])
    # pin the headline case explicitly: min skips NaN, max keeps it
    assert got[0]["min_agg"] == 1.0 and math.isnan(got[0]["max_agg"])
    assert math.isnan(got[1]["min_agg"])


def test_group_agg_evolution_gaps(spark):
    """Rowgroups lacking a late-added column: a missing WHERE column
    contributes nothing (the probe value never equals NULL); a missing
    group/agg column fails with a clear message, not an opaque
    list-index error."""
    from columnstore_spark.operators.aggregate import group_agg
    sch_old = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.IntegerType(), True),
        T.StructField("v", T.LongType(), True),
    ])
    sch_new = T.StructType(
        sch_old.fields + [T.StructField("f", T.DoubleType(), True)])
    old = spark.createDataFrame(
        [(f"a{i}", i % 2, i) for i in range(20)], sch_old)
    new = spark.createDataFrame(
        [(f"b{i}", i % 2, 100 + i, float(i % 3)) for i in range(20)],
        sch_new)
    segs = (encode(old, rowgroup_expr=F.lit(0), order=("conv_id",))
            .unionByName(
                encode(new, rowgroup_expr=F.lit(1), order=("conv_id",))))

    # missing WHERE column: only the covered rowgroup contributes
    got = {r["value"]: (r["cnt"], r["sum_agg"])
           for r in group_agg(segs, "g", "v", where=("f", 1.0)).collect()}
    exp = {r["g"]: (r["cnt"], r["s"])
           for r in new.where(F.col("f") == 1.0).groupBy("g")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum("v").alias("s")).collect()}
    assert got == exp and got

    # missing AGG column: clear executor-side error names the gap
    with pytest.raises(Exception, match="lacks segments"):
        group_agg(segs, "g", "f").collect()


def test_distinct_nested_column_fails_on_driver(spark):
    """distinct/count_distinct on a nested column must raise a clean
    ValueError on the driver even when the caller supplies value_type
    (the facade always does) — not an executor-side
    ArrowNotImplementedError from pc.value_counts."""
    from columnstore_spark.operators.aggregate import distinct_values
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("emb", T.ArrayType(T.DoubleType()), True),
    ])
    df = spark.createDataFrame(
        [(f"c{i}", [float(i), 1.0]) for i in range(10)], sch)
    segs = encode(df, rowgroup_expr=F.lit(0), order=("conv_id",))
    for vt in (None, T.ArrayType(T.DoubleType())):
        with pytest.raises(ValueError, match="nested"):
            distinct_values(segs, "emb", value_type=vt)


def test_group_agg_int64_overflow_goes_null(spark):
    """A group whose int64 sum would wrap reports NULL (unknown beats
    silently-wrong); small groups in the same frame stay exact."""
    from columnstore_spark.operators.aggregate import group_agg
    big = (1 << 62) + 7
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.StringType(), False),
        T.StructField("v", T.LongType(), False),
    ])
    rows = ([(f"c{i:03d}", "huge", big) for i in range(4)]
            + [(f"d{i:03d}", "small", i) for i in range(10)])
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {r["value"]: (r["cnt"], r["sum_agg"])
           for r in group_agg(segs, "g", "v").collect()}
    assert got["huge"] == (4, None)          # 4*big wraps int64
    assert got["small"] == (10, sum(range(10)))


def test_group_agg_cross_rowgroup_sum_exact(spark):
    """Partials that are individually wrap-free combine exactly across
    rowgroups (decimal combine), matching Spark's own grouped sum."""
    from columnstore_spark.operators.aggregate import group_agg
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("g", T.StringType(), False),
        T.StructField("v", T.LongType(), False),
    ])
    rows = [(f"c{i:03d}", f"g{i % 3}", (i - 200) * 12345)
            for i in range(500)]
    df = spark.createDataFrame(rows, sch)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    got = {r["value"]: r["sum_agg"]
           for r in group_agg(segs, "g", "v").collect()}
    exp = {r["g"]: r["s"] for r in
           df.groupBy("g").agg(F.sum("v").alias("s")).collect()}
    assert got == exp


def test_aggregate_segments_exact_under_evolution(spark, tmp_path):
    """A late-added column's counts normalize against the STORE row
    total: n_rows reports what decode surfaces, the coverage gap lands
    in n_nulls — exact, not understated (round-3 review finding)."""
    from columnstore_spark.store import TranscriptColumnStore
    sch = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("v", T.LongType(), False),
    ])
    df = spark.createDataFrame(
        [(f"c{i:03d}", i) for i in range(40)], sch)
    store = TranscriptColumnStore(spark, str(tmp_path / "s"),
                                  num_rowgroups=2)
    store.add_range(df)
    store.close()
    store.add_column("score", "bigint")
    late = spark.createDataFrame(
        [(f"d{i:03d}", i, i * 10) for i in range(10)],
        sch.add("score", T.LongType()))
    store.add_range(late)
    store.close()
    out = {r["col_name"]: r.asDict() for r in aggregate_segments(
        store.warehouse.live_manifest(spark)).collect()}
    assert out["v"]["n_rows"] == 50
    assert out["score"]["n_rows"] == 50       # not 10
    assert out["score"]["n_nulls"] == 40      # the uncovered rowgroups
    assert out["score"]["n_values"] == 10
    assert out["score"]["sum_dec"] == Decimal(sum(i * 10
                                                  for i in range(10)))


# ---------------------------------------------------------------------------
# quantiles: exact order statistics in the encoded domain
# ---------------------------------------------------------------------------


def _type1_quantile(vals, q):
    vals = sorted(v for v in vals if v is not None)
    if not vals:
        return None
    import math
    rank = max(math.ceil(q * len(vals)), 1)
    return vals[rank - 1]


def test_quantiles_match_order_statistics(spark):
    from columnstore_spark.operators.aggregate import quantiles
    rows = [(f"c{i:03d}", (i * 13) % 97 if i % 5 else None)
            for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {r["q"]: r["value"]
           for r in quantiles(segs, "v", qs).collect()}
    vals = [v for _, v in rows]
    assert set(got) == set(qs)
    for q in qs:
        assert got[q] == _type1_quantile(vals, q), q


def test_quantiles_all_null_and_validation(spark):
    from columnstore_spark.operators.aggregate import quantiles
    rows = [(f"c{i:03d}", None) for i in range(10)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    assert quantiles(segs, "v", [0.5]).count() == 0
    with pytest.raises(ValueError, match="outside"):
        quantiles(segs, "v", [1.5])


def test_quantile_facade_multirowgroup(spark, tmp_path):
    """store.quantile on a multi-rowgroup store equals Spark's own
    order-statistic computation over the decoded rows."""
    from columnstore_spark.sources.transcripts import load_transcripts
    from columnstore_spark.store import TranscriptColumnStore
    t = load_transcripts(spark, "/root/testdata/sf0.001")
    store = TranscriptColumnStore(spark, str(tmp_path / "qstore"),
                                  num_rowgroups=8)
    store.add_range(t)
    store.close()
    qs = [0.1, 0.5, 0.99]
    got = {r["q"]: r["value"]
           for r in store.quantile("turn_idx", qs).collect()}
    vals = [r["turn_idx"] for r in t.select("turn_idx").collect()]
    for q in qs:
        assert got[q] == _type1_quantile(vals, q), q


def test_quantiles_duplicate_qs_one_row_per_distinct(spark):
    from columnstore_spark.operators.aggregate import quantiles
    rows = [(f"c{i:03d}", i) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    segs = encode(df, rowgroup_expr=_rg(), order=("conv_id",))
    out = quantiles(segs, "v", [0.5, 0.5, 0.99]).collect()
    assert len(out) == 2
    assert {r["q"] for r in out} == {0.5, 0.99}
