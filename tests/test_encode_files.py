"""Direct-scan encode (`encode_files`): worker-side parquet read must
produce segments bit-identical to the JVM-scan `encode` path on the
same bucketed layout, and decode back to the source.

The bucketed layout under test is exactly what
`scripts/cluster_encode_job.py --prebucketed` writes: parquet
partitioned by the salted rowgroup key, the key kept as a `__rg`
column, one file per bucket.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from columnstore_spark.operators import decode, encode, roundtrip_equal
from columnstore_spark.operators.encode import (
    default_rowgroup_expr,
    encode_files,
)


@pytest.fixture(scope="module")
def bucketed(spark, transcripts, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucketed"))
    rg = default_rowgroup_expr(8)
    (transcripts.withColumn("__rg", rg.cast("long"))
     .repartition(4, "__rg")
     .write.mode("overwrite").parquet(root))
    paths = sorted(glob.glob(os.path.join(root, "*.parquet")))
    assert paths
    return root, paths


def _canon(segs):
    rows = segs.select("rowgroup_id", "column", "codec", "logical_type",
                       "payload", "n_rows", "n_nulls", "n_distinct",
                       "n_runs", "min_repr", "max_repr", "min_num",
                       "max_num", "min_flt", "max_flt", "raw_bytes",
                       "enc_bytes", "checksum").collect()
    return sorted((tuple(r) for r in rows),
                  key=lambda t: (t[0], t[1]))


def test_bit_identical_to_jvm_scan(spark, bucketed):
    root, paths = bucketed
    jvm = encode(spark.read.parquet(root),
                 rowgroup_expr=F.col("__rg")).drop("encode_ms")
    direct = encode_files(spark, paths).drop("encode_ms")
    a, b = _canon(jvm), _canon(direct)
    # the JVM side also encoded the __rg carrier column; drop those rows
    a = [t for t in a if t[1] != "__rg"]
    assert a == b


def test_bloom_parity_across_scan_paths(spark, bucketed):
    # the opt-in bloom words must be identical across the two scan
    # paths too (same dictionary -> same bits, insertion-order-free)
    root, paths = bucketed
    jvm = (encode(spark.read.parquet(root), rowgroup_expr=F.col("__rg"),
                  bloom_columns=("conv_id",))
           .where(F.col("column") == "conv_id")
           .select("rowgroup_id", "bloom").collect())
    direct = (encode_files(spark, paths, bloom_columns=("conv_id",))
              .where(F.col("column") == "conv_id")
              .select("rowgroup_id", "bloom").collect())
    a = sorted((r["rowgroup_id"], tuple(r["bloom"])) for r in jvm)
    b = sorted((r["rowgroup_id"], tuple(r["bloom"])) for r in direct)
    assert a == b and all(w for _, w in a)


def test_roundtrip_and_projection(spark, transcripts, bucketed):
    _root, paths = bucketed
    segs = encode_files(spark, paths)
    assert roundtrip_equal(transcripts, decode(segs))["equal"]
    # column pruning reaches the parquet reader
    proj = encode_files(spark, paths, columns=["role", "turn_idx"])
    cols = {r["column"] for r in proj.select("column").distinct().collect()}
    assert cols == {"role", "turn_idx"}


def test_one_task_per_file(spark, bucketed):
    _root, paths = bucketed
    assert encode_files(spark, paths).rdd.getNumPartitions() == len(paths)


def test_presorted_streaming(spark, transcripts, bucketed,
                             tmp_path_factory):
    """Presorted mode streams batches (no full-file sort) and yields
    the same segments as the sort-in-task path on equivalent layouts;
    an unsorted file raises instead of emitting duplicate segments."""
    _root, unsorted_paths = bucketed
    root = str(tmp_path_factory.mktemp("sorted_bucketed"))
    rg = default_rowgroup_expr(8)
    (transcripts.withColumn("__rg", rg.cast("long"))
     .repartition(4, "__rg")
     .sortWithinPartitions("__rg", "conv_id", "turn_idx")
     .write.mode("overwrite").parquet(root))
    paths = sorted(glob.glob(os.path.join(root, "*.parquet")))

    sorted_in_task = _canon(encode_files(spark, unsorted_paths))
    streamed = _canon(encode_files(spark, paths, presorted=True))
    assert sorted_in_task == streamed

    import pyarrow as pa
    import pyarrow.parquet as pq
    bad = str(tmp_path_factory.mktemp("bad")) + "/interleaved.parquet"
    pq.write_table(pa.table({"__rg": [0, 1, 0, 1],
                             "conv_id": ["a", "b", "c", "d"],
                             "turn_idx": pa.array([1, 1, 2, 2],
                                                  type=pa.int32())}), bad)
    with pytest.raises(Exception, match="not.*presorted|contiguous"):
        encode_files(spark, [bad], presorted=True).collect()


def test_resumable_direct_scan(spark, transcripts, bucketed, tmp_path):
    """Crash-resume over the file queue: first run commits a path
    subset, the resume run encodes only the missing rowgroups, a third
    run finds nothing pending — and the committed store decodes back
    to the full source."""
    from columnstore_spark.sources.warehouse import Warehouse

    _root, paths = bucketed
    wh = Warehouse(str(tmp_path / "wh"), format="parquet")

    r1 = wh.encode_files_resumable(spark, paths[:2], run_id="runA")
    assert r1["rowgroups_encoded"] > 0
    r2 = wh.encode_files_resumable(spark, paths, run_id="runB")
    assert r2["rowgroups_encoded"] > 0
    # disjoint work: resume never re-encoded a committed rowgroup
    total = wh.committed_segments(spark).select(
        "rowgroup_id").distinct().count()
    assert total == r1["rowgroups_encoded"] + r2["rowgroups_encoded"]
    r3 = wh.encode_files_resumable(spark, paths, run_id="runC")
    assert r3["rowgroups_encoded"] == 0

    from columnstore_spark.operators import decode
    dec = decode(wh.committed_segments(spark))
    assert roundtrip_equal(transcripts, dec)["equal"]


def test_write_bucketed_layout_end_to_end(spark, transcripts,
                                          tmp_path_factory):
    """The ingest helper writes exactly the layout the presorted
    streaming scan consumes."""
    from columnstore_spark.operators import write_bucketed_layout

    root = str(tmp_path_factory.mktemp("ingest"))
    paths = write_bucketed_layout(transcripts, root, num_rowgroups=8,
                                  num_buckets=4)
    assert len(paths) == 4
    segs = encode_files(spark, paths, presorted=True)
    assert roundtrip_equal(transcripts, decode(segs))["equal"]

    # resume composes with the streaming scan
    from columnstore_spark.sources.warehouse import Warehouse
    wh = Warehouse(str(tmp_path_factory.mktemp("wh2")), format="parquet")
    r1 = wh.encode_files_resumable(spark, paths[:2], presorted=True,
                                   run_id="pA")
    r2 = wh.encode_files_resumable(spark, paths, presorted=True,
                                   run_id="pB")
    assert r1["rowgroups_encoded"] > 0 and r2["rowgroups_encoded"] > 0
    assert roundtrip_equal(
        transcripts, decode(wh.committed_segments(spark)))["equal"]


def test_missing_rowgroup_col(spark, tmp_path):
    p = str(tmp_path / "plain")
    spark.range(10).write.parquet(p)
    f = sorted(glob.glob(os.path.join(p, "*.parquet")))
    with pytest.raises(Exception, match="__rg"):
        encode_files(spark, f).collect()


def test_ns_timestamps_normalize_or_fail_at_ingest(spark, tmp_path):
    """ns-unit parquet (which the JVM scan path refuses outright):
    whole-microsecond values ingest losslessly as timestamp_us and
    decode fine; sub-microsecond values raise AT INGEST instead of
    committing segments the us-typed decode surface can never read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from columnstore_spark.operators.encode import encode_files

    def write(path, ns_vals):
        tbl = pa.table({
            "__rg": pa.array([0] * len(ns_vals), type=pa.int64()),
            "conv_id": pa.array([f"c{i}" for i in range(len(ns_vals))]),
            "ts": pa.array(ns_vals, type=pa.timestamp("ns", tz="UTC")),
        })
        pq.write_table(tbl, path)
        return path

    ok = write(str(tmp_path / "ok.parquet"),
               [1_000_000_000_000 * i for i in range(1, 5)])
    segs = encode_files(spark, [ok])
    out = decode(segs)
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.count() == 4

    bad = write(str(tmp_path / "bad.parquet"),
                [1_000_000_000_001])  # sub-us remainder: lossy
    with pytest.raises(Exception, match="(?i)lose data|truncat"):
        encode_files(spark, [bad]).collect()
    with pytest.raises(Exception, match="(?i)lose data|truncat"):
        encode_files(spark, [bad], presorted=True).collect()


def test_write_bucketed_layout_without_order_columns(spark, transcripts,
                                                     tmp_path):
    """A frame missing the default order columns (post-drop_column
    ingest) must still write — absent sort keys are skipped, same
    tolerance as encode() and default_rowgroup_expr."""
    from columnstore_spark.operators import write_bucketed_layout
    from columnstore_spark.operators.encode import encode_files

    df = transcripts.drop("turn_idx")
    paths = write_bucketed_layout(df, str(tmp_path / "b"),
                                  num_rowgroups=4, num_buckets=2)
    assert paths
    segs = encode_files(spark, paths)
    got = decode(segs)
    assert got.count() == transcripts.count()
    assert "turn_idx" not in got.columns
