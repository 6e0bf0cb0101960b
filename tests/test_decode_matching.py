"""decode_matching — the reference's QueryByValue composition on the
encoded form (`Segments/ColumnSegment.cs:38-157`): probe one column's
segments for matching row ranges, gather only those ranges from the
other columns, optionally projecting columns at the encoded level.
Must be row-for-row equivalent to full decode + DataFrame filter.
"""

import os

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from columnstore_spark.codecs.query import gather_ranges
from columnstore_spark.codecs.segment import encode_segment
from columnstore_spark.operators import decode, decode_matching, encode

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def segs(spark, transcripts):
    s = encode(transcripts, num_rowgroups=4).persist()
    s.count()
    yield s
    s.unpersist()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("column,value", [
    ("role", "tool"),
    ("role", "user"),
    ("tool", "search"),          # null-bearing column: nulls never match
    ("turn_idx", 3),             # numeric probe
    ("role", "nonexistent"),     # matches nothing
])
def test_matches_full_decode_filter(spark, segs, transcripts, column, value):
    got = decode_matching(segs, column, value)
    want = decode(segs).where(F.col(column) == value)
    cols = transcripts.columns
    assert _rows(got, cols) == _rows(want, cols)


def test_column_projection_skips_wide_columns(spark, segs, transcripts):
    got = decode_matching(segs, "role", "tool",
                          columns=["conv_id", "turn_idx"])
    assert got.columns == ["conv_id", "turn_idx"]
    want = (decode(segs).where(F.col("role") == "tool")
            .select("conv_id", "turn_idx"))
    assert _rows(got, got.columns) == _rows(want, want.columns)
    # the projection filters segment ROWS before the decode stage: the
    # executed plan carries the column IN-list (probe + projection,
    # no text) ahead of the mapInArrow
    got.collect()
    flat = (got._jdf.queryExecution().executedPlan().toString()
            .replace(" ", ""))
    assert "IN(conv_id,role,turn_idx)" in flat
    # (the module fixture caches segs, so the cache scan still lists
    # every column; on parquet-backed segments the same IN filter is
    # pushed into the file scan — gated in test_pruning_typed.py)


def test_probe_column_projectable(spark, segs):
    got = decode_matching(segs, "role", "tool", columns=["role", "conv_id"])
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["role"] == "tool" for r in rows)


def test_lossy_probe_matches_nothing(spark, segs):
    # 7.5 must NOT match turn_idx 7 via a truncating cast
    assert decode_matching(segs, "turn_idx", 7.5).count() == 0
    # integral float equals its int rows (Spark's == semantics)
    a = decode_matching(segs, "turn_idx", 7.0).count()
    b = decode(segs).where(F.col("turn_idx") == 7).count()
    assert a == b > 0


def test_gather_ranges_kernel_paths():
    """Both kernel paths: dict_rle run clipping and decode-once-slice,
    against the plain materialization."""
    from columnstore_spark.codecs import dictrle, plain

    vals = ["a"] * 5 + ["b"] * 3 + ["a"] * 4 + ["c"] * 2
    arr = pa.array(vals, type=pa.large_utf8())
    seg = encode_segment(arr, codec=dictrle.CODEC_ID)  # run-clip path
    ranges = [(0, 5), (8, 4)]     # the two 'a' runs
    got = gather_ranges(seg.payload, seg.logical, ranges)
    assert got.to_pylist() == ["a"] * 9
    # ints through the generic decode-once-then-slice path
    iseg = encode_segment(pa.array(list(range(100)), type=pa.int64()),
                          codec=plain.CODEC_ID)
    got = gather_ranges(iseg.payload, iseg.logical, [(10, 3), (50, 2)])
    assert got.to_pylist() == [10, 11, 12, 50, 51]
    # empty ranges -> empty typed array
    assert len(gather_ranges(seg.payload, seg.logical, [])) == 0


@pytest.mark.parametrize("column,lo,hi", [
    ("turn_idx", 3, 7),
    ("turn_idx", 3.5, 6.5),          # float bounds on int column
    ("role", "assistant", "tool"),   # ASCII string range
    ("conv_id", "c000000000000", "c000000000005"),
    ("tool", "a", "zzz"),            # null-bearing column
    ("turn_idx", 10**9, 10**9 + 5),  # matches nothing
])
def test_range_matches_full_decode_filter(spark, segs, transcripts,
                                          column, lo, hi):
    from columnstore_spark.operators import decode_matching_range

    got = (decode_matching_range(segs, column, lo, hi)
           .where(F.col(column).between(lo, hi)))
    want = decode(segs).where(F.col(column).between(lo, hi))
    cols = transcripts.columns
    assert _rows(got, cols) == _rows(want, cols)


def test_range_timestamp_probe(spark, segs, transcripts):
    import datetime as dt

    from columnstore_spark.operators import decode_matching_range

    lo = dt.datetime(2024, 1, 3, tzinfo=dt.timezone.utc)
    hi = dt.datetime(2024, 1, 10, tzinfo=dt.timezone.utc)
    got = (decode_matching_range(segs, "ts", lo, hi,
                                 columns=["conv_id", "turn_idx", "ts"])
           .where(F.col("ts").between(lo, hi)))
    want = (decode(segs).where(F.col("ts").between(lo, hi))
            .select("conv_id", "turn_idx", "ts"))
    assert _rows(got, got.columns) == _rows(want, want.columns)
    assert got.count() > 0


def test_query_range_kernel_superset_fallbacks():
    """Unconvertible probes must return the WHOLE segment (superset),
    never under-select."""
    from columnstore_spark.codecs import dictrle
    from columnstore_spark.codecs.query import query_range

    arr = pa.array(["aé", "zz", "aa"] * 5, type=pa.large_utf8())
    seg = encode_segment(arr, codec=dictrle.CODEC_ID)
    # non-ASCII bound -> whole segment
    assert query_range(seg.payload, seg.logical, "aa", "zé") == [(0, 15)]
    # ASCII bounds -> dictionary-tested runs, exact
    ranges = query_range(seg.payload, seg.logical, "aa", "ab")
    n = sum(ln for _, ln in ranges)
    assert n == 5  # the five "aa" rows
    # int segment with widened float bounds
    iseg = encode_segment(pa.array(list(range(20)), type=pa.int32()),
                          codec=dictrle.CODEC_ID)
    ranges = query_range(iseg.payload, iseg.logical, 2.5, 5.5)
    assert sum(ln for _, ln in ranges) >= 3  # superset of {3,4,5}


def test_projection_of_late_added_column_nullfills(spark, transcripts):
    """Projecting ONLY a column that some rowgroups predate (schema
    evolution) must surface their matching rows as NULLs — pre-fix the
    rowgroup's name-filtered dict came back empty and the matched rows
    silently vanished."""
    from pyspark.sql import types as T

    t_old = transcripts.where(F.col("turn_idx") % 2 == 0)
    t_new = (transcripts.where(F.col("turn_idx") % 2 == 1)
             .withColumn("score", (F.col("turn_idx") * 2).cast("long")))
    segs = (encode(t_old, rowgroup_expr=F.lit(0))
            .unionByName(encode(t_new, rowgroup_expr=F.lit(1))))
    schema = T.StructType(
        list(transcripts.schema.fields)
        + [T.StructField("score", T.LongType(), True)])

    got = decode_matching(segs, "role", "user", columns=["score"],
                          schema=schema)
    assert got.columns == ["score"]
    vals = [r["score"] for r in got.collect()]
    n_old = t_old.where(F.col("role") == "user").count()
    exp_new = sorted(r["score"] for r in
                     t_new.where(F.col("role") == "user")
                     .select("score").collect())
    assert vals.count(None) == n_old and n_old > 0
    assert sorted(v for v in vals if v is not None) == exp_new
