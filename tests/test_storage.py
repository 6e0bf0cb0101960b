"""Storage capability layer: Iceberg when a runtime jar is present,
parquet fallback otherwise — the warehouse behaviors must be identical
through either backend."""

import pytest
from pyspark.sql import functions as F

from columnstore_spark.operators import decode
from columnstore_spark.sources.storage import (
    IcebergBackend,
    ParquetBackend,
    iceberg_available,
    resolve_backend,
)
from columnstore_spark.sources.transcripts import load_transcripts
from columnstore_spark.sources.warehouse import Warehouse

SF_DIR = __import__("os").environ.get("SPARK_GRAFT_TEST_SF",
                                      "/root/testdata/sf0.001")


def test_auto_resolution_matches_capability(spark, tmp_path):
    b = resolve_backend(spark, str(tmp_path), "auto")
    if iceberg_available(spark):
        assert isinstance(b, IcebergBackend)
    else:
        assert isinstance(b, ParquetBackend)


def test_explicit_iceberg_requires_jar(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("jar present — requirement satisfied")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        resolve_backend(spark, str(tmp_path), "iceberg")


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        resolve_backend(spark, str(tmp_path), "orc")


def _roundtrip_through(spark, root, fmt):
    t = load_transcripts(spark, SF_DIR)
    wh = Warehouse(root, format=fmt)
    info = wh.encode_resumable(t, num_rowgroups=4)
    assert info["storage"] == fmt
    assert info["rowgroups_encoded"] > 0
    # resume is a no-op on a complete warehouse
    again = wh.encode_resumable(t, num_rowgroups=4)
    assert again["rowgroups_encoded"] == 0
    decoded = decode(wh.committed_segments(spark))
    a = decoded.orderBy("conv_id", "turn_idx").collect()
    b = t.orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_parquet_warehouse_roundtrip(spark, tmp_path):
    _roundtrip_through(spark, str(tmp_path / "wh"), "parquet")


def test_iceberg_warehouse_roundtrip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    _roundtrip_through(spark, str(tmp_path / "wh_ice"), "iceberg")


def test_read_unified_mid_ingest(spark, tmp_path):
    """The reference's whole-store enumeration (solid + delta,
    `ColumnStore.cs:76-87`): a reader during a half-finished ingest
    sees every row exactly once — committed rowgroups decoded from the
    warehouse, pending ones raw from the delta frame."""
    t = load_transcripts(spark, SF_DIR)
    wh = Warehouse(str(tmp_path / "wh"))
    info = wh.encode_resumable(t, num_rowgroups=8, fail_after_rowgroups=3)
    assert info["rowgroups_encoded"] == 3

    uni = wh.read_unified(t, num_rowgroups=8)
    assert (uni.orderBy("conv_id", "turn_idx").collect()
            == t.orderBy("conv_id", "turn_idx").collect())
    # the solid part genuinely comes from the encoded warehouse
    n_solid = decode(wh.committed_segments(spark)).count()
    assert 0 < n_solid < t.count()

    # after ingest completes, unified == fully-decoded warehouse
    wh.encode_resumable(t, num_rowgroups=8)
    uni2 = wh.read_unified(t, num_rowgroups=8)
    assert (uni2.orderBy("conv_id", "turn_idx").collect()
            == t.orderBy("conv_id", "turn_idx").collect())


def test_manifest_append_atomic_under_crash(spark, tmp_path, monkeypatch):
    """The manifest append is the commit point: a crash at the rename
    (the atomic step) must leave the store exactly as it was — no
    tombstones without replacements, no double counting — and a retry
    must succeed cleanly."""
    import os as _os

    import pytest as _pytest

    from columnstore_spark.sources.transcripts import load_transcripts
    from columnstore_spark.store import TranscriptColumnStore

    store = TranscriptColumnStore(spark, str(tmp_path / "atomic"),
                                  num_rowgroups=2)
    t = load_transcripts(spark, "/root/testdata/sf0.001")
    store.add_range(t)
    store.close()
    before = sorted(str(tuple(r)) for r in store.rows().collect())

    real_rename = _os.rename

    def boom(src, dst):
        if "/commit-" in str(dst):
            raise OSError("injected crash before manifest commit")
        return real_rename(src, dst)

    monkeypatch.setattr("os.rename", boom)
    with _pytest.raises(OSError, match="injected crash"):
        store.delete_where("turn_idx", (0, 1))
    monkeypatch.setattr("os.rename", real_rename)

    after = sorted(str(tuple(r)) for r in store.rows().collect())
    assert after == before          # torn attempt fully invisible

    res = store.delete_where("turn_idx", (0, 1))
    assert res["rows_deleted"] > 0
    assert store.rows().where(
        F.col("turn_idx").between(0, 1)).count() == 0
