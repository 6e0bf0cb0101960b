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
