"""Streaming ingest: micro-batches -> warehouse segments, bit-identical
union, and no reprocessing on restart (streaming checkpoint + manifest
resume compose). Mirrors the reference's delta-store lifecycle tests
(`DeltaStoreTests.cs:43-187`: close -> second row group -> stats)."""

import os

import pytest
from pyspark.sql import functions as F

from columnstore_spark.operators import decode
from columnstore_spark.sources.transcripts import load_transcripts
from columnstore_spark.sources.warehouse import Warehouse
from columnstore_spark.streaming.ingest import encode_stream

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def stream_dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("input", "warehouse", "ckpt")}
    os.makedirs(d["input"])
    return d


def _write_chunk(df, path: str) -> None:
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_ingest_roundtrip_and_restart(spark, stream_dirs):
    t = load_transcripts(spark, SF_DIR).persist()
    first = t.where(F.col("turn_idx") % 2 == 0)
    second = t.where(F.col("turn_idx") % 2 == 1)

    # batch 1
    _write_chunk(first, stream_dirs["input"])
    q = encode_stream(spark, stream_dirs["input"], stream_dirs["warehouse"],
                      stream_dirs["ckpt"], num_rowgroups=4)
    q.awaitTermination(120)

    wh = Warehouse(stream_dirs["warehouse"])
    n1 = decode(wh.committed_segments(spark)).count()
    assert n1 == first.count()

    # batch 2 arrives; restart the stream from the checkpoint
    _write_chunk(second, stream_dirs["input"])
    q = encode_stream(spark, stream_dirs["input"], stream_dirs["warehouse"],
                      stream_dirs["ckpt"], num_rowgroups=4)
    q.awaitTermination(120)

    decoded = decode(wh.committed_segments(spark))
    assert decoded.count() == t.count()
    # bit-identical union under stable order
    cols = t.columns
    a = decoded.orderBy("conv_id", "turn_idx").select(cols).collect()
    b = t.orderBy("conv_id", "turn_idx").select(cols).collect()
    assert a == b

    # restart with nothing new: no reprocessing, warehouse unchanged
    m_before = wh.manifest(spark).count()
    q = encode_stream(spark, stream_dirs["input"], stream_dirs["warehouse"],
                      stream_dirs["ckpt"], num_rowgroups=4)
    q.awaitTermination(120)
    assert wh.manifest(spark).count() == m_before

    # rowgroup ids are namespaced per batch (disjoint ranges)
    runs = (wh.manifest(spark).select("run_id").distinct()
            .toPandas()["run_id"].tolist())
    assert sorted(runs) == ["stream-000000", "stream-000001"]
    t.unpersist()


def test_stream_ingested_store_answers_encoded_analytics(spark, stream_dirs):
    """The encoded-domain analytics surface must work unchanged over a
    warehouse a STREAM built: segments committed by micro-batches are
    the same tables the batch path writes, so group_count / group_agg /
    count_matching / topk answer straight off them."""
    from columnstore_spark.operators import topk
    from columnstore_spark.operators.aggregate import (
        count_matching,
        group_agg,
        group_count,
    )

    t = load_transcripts(spark, SF_DIR).persist()
    _write_chunk(t, stream_dirs["input"])
    q = encode_stream(spark, stream_dirs["input"], stream_dirs["warehouse"],
                      stream_dirs["ckpt"], num_rowgroups=4)
    q.awaitTermination(120)
    segs = Warehouse(stream_dirs["warehouse"]).committed_segments(spark)

    got = {r["value"]: r["cnt"] for r in group_count(segs, "role").collect()}
    exp = {r[0]: r[1] for r in t.groupBy("role").count().collect()}
    assert got == exp

    ga = {r["value"]: r["sum_agg"]
          for r in group_agg(segs, "role", "turn_idx").collect()}
    ge = {r["role"]: r["s"] for r in t.groupBy("role")
          .agg(F.sum("turn_idx").alias("s")).collect()}
    assert ga == ge

    assert (count_matching(segs, "role", "tool").collect()[0]["cnt"]
            == t.where(F.col("role") == "tool").count())

    tk = [tuple(r) for r in
          topk(segs, "ts", 5, columns=["conv_id", "turn_idx", "ts"],
               tie_cols=("conv_id", "turn_idx")).collect()]
    te = [tuple(r) for r in t.where(F.col("ts").isNotNull())
          .orderBy(F.col("ts").desc(), "conv_id", "turn_idx").limit(5)
          .select("conv_id", "turn_idx", "ts").collect()]
    assert tk == te
