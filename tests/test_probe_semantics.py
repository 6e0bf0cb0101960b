"""Facade probe semantics must equal Spark's own predicate semantics
for ANY probe/column type pairing — the encoded-form kernels may only
over-select (the trailing .where narrows), never under-select. Covers
the coercion corners where the exact-typed kernels diverge from
Spark's coercing comparisons (string probe on ints, NaN on floats,
float on decimals, tz-aware timestamps, infinite range bounds), plus
back-compat with manifests written before the typed-bounds columns and
the in-place (non-relocatable backend) rebuild protocol."""

import datetime as dt
import os
import shutil
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from columnstore_spark.store import TranscriptColumnStore

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rows = [
        (f"c{i:03d}", i, float(i) if i % 7 else float("nan"),
         Decimal(i).scaleb(-2) * 100,  # i.00 at scale 2
         dt.datetime(2024, 1, 1 + i % 5, 12, 0, 0))
        for i in range(120)
    ]
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("amount", T.DecimalType(10, 2)),
        T.StructField("ts", T.TimestampType()),
    ])
    df = spark.createDataFrame(rows, schema)
    s = TranscriptColumnStore(
        spark, str(tmp_path_factory.mktemp("probe") / "store"),
        num_rowgroups=3)
    s.add_range(df)
    s.close()
    return s, df


def _eq_counts(store_df, spark_df):
    # stringify so NaN compares equal to itself (nan != nan as floats)
    def rows(df):
        return sorted(str(tuple(r)) for r in df.collect())
    assert rows(store_df) == rows(spark_df)


def test_string_probe_on_int_column(store):
    s, df = store
    # Spark coerces '7' and matches turn_idx 7; the int kernel can't
    _eq_counts(s.query_by_value("turn_idx", "7"),
               df.where(F.col("turn_idx") == "7"))
    assert s.query_by_value("turn_idx", "7").count() == 1


def test_nan_probe_on_float_column(store):
    s, df = store
    nan = float("nan")
    want = df.where(F.col("score") == F.lit(nan))
    _eq_counts(s.query_by_value("score", nan), want)
    assert want.count() > 0  # Spark: NaN == NaN is TRUE


def test_float_probe_on_decimal_column(store):
    s, df = store
    # 7.0 is integral so Decimal-exactness would also match, but route
    # and result must agree with Spark's decimal->double coercion;
    # non-representable 7.00000001 must return [] in both
    _eq_counts(s.query_by_value("amount", 7.0),
               df.where(F.col("amount") == F.lit(7.0)))
    _eq_counts(s.query_by_value("amount", 7.00000001),
               df.where(F.col("amount") == F.lit(7.00000001)))
    assert s.query_by_value("amount", 7.0).count() == 1


def test_decimal_probe_still_rides_kernels(store):
    s, df = store
    _eq_counts(s.query_by_value("amount", Decimal("7.00")),
               df.where(F.col("amount") == Decimal("7.00")))
    assert s.query_by_value("amount", Decimal("7.00")).count() == 1


def test_tz_aware_timestamp_probe(store):
    s, df = store
    aware = dt.datetime(2024, 1, 3, 12, 0, 0, tzinfo=UTC)
    naive = dt.datetime(2024, 1, 3, 12, 0, 0)
    got = s.query_by_value("ts", aware)
    _eq_counts(got, df.where(F.col("ts") == F.lit(naive)))
    assert got.count() > 0
    # and an offset zone resolving to the same instant
    plus2 = aware.astimezone(dt.timezone(dt.timedelta(hours=2)))
    assert s.query_by_value("ts", plus2).count() == got.count()


def test_infinite_range_bounds(store):
    s, df = store
    inf = float("inf")
    _eq_counts(s.query_by_range("turn_idx", 100, inf),
               df.where(F.col("turn_idx").between(100, inf)))
    _eq_counts(s.query_by_range("amount", Decimal("100.00"), inf),
               df.where(F.col("amount").between(Decimal("100.00"),
                                                F.lit(inf))))
    _eq_counts(s.query_by_range("score", -inf, 5.0),
               df.where(F.col("score").between(-inf, 5.0)))
    assert s.query_by_range("turn_idx", 100, inf).count() == 20


def test_pre_typed_bounds_manifest_compat(spark, tmp_path, store):
    """A warehouse persisted before min_num/max_num/min_flt/max_flt
    existed must still answer queries and stats (conservatively),
    not fail analysis."""
    s, df = store
    old_root = str(tmp_path / "old_store")
    shutil.copytree(s.root, old_root)
    gen = f"{old_root}/gen_0000"
    mpath = f"{gen}/manifest"
    m = spark.read.parquet(mpath)
    stripped = m.drop("min_num", "max_num", "min_flt", "max_flt")
    stripped.write.mode("overwrite").parquet(f"{gen}/manifest_new")
    shutil.rmtree(mpath)
    os.rename(f"{gen}/manifest_new", mpath)

    old = TranscriptColumnStore(spark, old_root, num_rowgroups=3)
    _eq_counts(old.query_by_value("turn_idx", 7),
               df.where(F.col("turn_idx") == 7))
    _eq_counts(old.query_by_range("score", 1.0, 5.0),
               df.where(F.col("score").between(1.0, 5.0)))
    st = {r["column"]: r for r in old.stats().collect()}
    assert st["turn_idx"]["min_num"] is None  # degraded, not wrong
    assert st["turn_idx"]["n_rows"] == df.count()


def test_inplace_rebuild_protocol(spark, tmp_path, monkeypatch):
    """Non-relocatable backends (Iceberg embeds absolute paths) commit
    the rebuilt generation in place behind a _STAGING marker; the
    marker unlink is the commit point and a crashed attempt stays
    invisible."""
    from columnstore_spark.sources.storage import ParquetBackend

    monkeypatch.setattr(ParquetBackend, "relocatable", False)
    rows = [(f"c{i}", i) for i in range(40)]
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
    ])
    df = spark.createDataFrame(rows, schema)
    root = str(tmp_path / "ip_store")
    s = TranscriptColumnStore(spark, root, num_rowgroups=2)
    s.add_range(df)
    s.close()

    # a crashed prior attempt: staged dir with the marker present
    crashed = f"{root}/gen_0001"
    os.makedirs(crashed)
    open(f"{crashed}/_STAGING", "w").close()
    reopened = TranscriptColumnStore(spark, root, num_rowgroups=2)
    assert reopened._generation == 0  # staged gen invisible

    reopened.rebuild(num_rowgroups=2)
    assert reopened._generation == 1
    assert not os.path.exists(f"{root}/gen_0001/_STAGING")
    assert os.path.exists(f"{root}/gen_0001/retired_batches.txt")
    assert reopened.rows().count() == 40
    # a fresh handle sees the committed generation and no pendings
    fresh = TranscriptColumnStore(spark, root, num_rowgroups=2)
    assert fresh._generation == 1
    assert fresh.close() == 0
    assert fresh.rows().count() == 40
