"""S7 compression-order mode: ascending-NDV row re-sort per rowgroup
(reference `SolidRowGroupFactoryGenerator.cs:35-53`) — round-trip stays
exact and scrambled input compresses no worse than unordered encode."""

import os

from pyspark.sql import functions as F

from columnstore_spark.operators import decode, encode

from columnstore_spark.sources.transcripts import load_transcripts

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_compression_order_roundtrip_and_ratio(spark):
    t = (load_transcripts(spark, SF_DIR)
         .orderBy(F.xxhash64("conv_id", "turn_idx")).persist())
    base = (encode(t, num_rowgroups=4, order=())
            .agg(F.sum("enc_bytes")).collect()[0][0])
    segs = encode(t, num_rowgroups=4, order=(), compression_order=True)
    co = segs.agg(F.sum("enc_bytes")).collect()[0][0]
    assert co <= base

    decoded = decode(segs).orderBy("conv_id", "turn_idx").collect()
    source = t.orderBy("conv_id", "turn_idx").collect()
    assert decoded == source
    t.unpersist()


def test_custom_sort_expression_order(spark):
    """encode(order=...) accepts Column expressions — the per-column
    custom-comparer option (`ColumnStorePropertyAttribute.cs:15-23`,
    ReverseComparer demo in `Outcompute.TestApp/Program.cs:124-137`):
    a descending expression changes the stored row order (visible in
    the decode, which preserves encode order) and still round-trips
    bit-identical after the verify re-sort."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rg = F.pmod(F.col("event_id"), F.lit(4))
    segs = encode(events, order=(F.col("event_id").desc(),),
                  rowgroup_expr=rg)

    # stored order inside each rowgroup is descending event_id
    dec = decode(segs).select("event_id").toPandas()["event_id"]
    rowgroup = (dec % 4).to_numpy()
    ids = dec.to_numpy()
    import numpy as np
    same_group = rowgroup[1:] == rowgroup[:-1]
    assert (ids[1:][same_group] < ids[:-1][same_group]).all()

    # bit-identical after the verifier's stable re-sort
    a = decode(segs).orderBy("event_id").collect()
    b = events.orderBy("event_id").collect()
    assert a == b
