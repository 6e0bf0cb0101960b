"""End-to-end Spark encode -> decode -> bit-identical verify
(north rule; SURVEY.md §7.2 step 3), plus warehouse checkpoint-resume
(FIXTURES.md F5) and the skew splitter.
"""

from pyspark.sql import functions as F

from columnstore_spark.operators import (
    decode,
    encode,
    manifest_of,
    roundtrip_equal,
    schema_from_segments,
)
from columnstore_spark.sources.warehouse import Warehouse


def test_transcript_roundtrip(spark, transcripts):
    segs = encode(transcripts, num_rowgroups=4).cache()
    dec = decode(segs)
    res = roundtrip_equal(transcripts, dec)
    assert res["equal"], res
    # every (rowgroup, column) present
    m = manifest_of(segs)
    per_col = {r["column"]: r["n"] for r in
               m.groupBy("column").agg(F.count("*").alias("n")).collect()}
    assert set(per_col) == set(transcripts.columns)
    segs.unpersist()


def test_roundtrip_all_modes(spark, transcripts):
    for mode in ("none", "speed", "size"):
        segs = encode(transcripts, num_rowgroups=2, mode=mode)
        assert roundtrip_equal(transcripts, decode(segs))["equal"], mode


def test_compression_beats_raw(spark, transcripts):
    m = manifest_of(encode(transcripts, num_rowgroups=2)).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    assert m["enc"] < m["raw"] * 0.5, (m["enc"], m["raw"])


def test_schema_reconstruction(spark, transcripts):
    segs = encode(transcripts, num_rowgroups=2)
    schema = schema_from_segments(segs)
    assert [f.name for f in schema.fields] == transcripts.columns


def test_events_table_roundtrip(spark):
    """Generalization beyond the transcript schema: int64/double/string/ts
    (reference TestModel has mixed types, `DeltaRowGroupTests.cs:256-263`)."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    segs = encode(events, num_rowgroups=2, order=("event_id",),
                  rowgroup_expr=F.pmod(F.col("event_id"), F.lit(2)))
    res = roundtrip_equal(events, decode(segs))
    assert res["equal"], res


def test_skew_splitter(spark, transcripts):
    """A huge conversation must split across rowgroups at rows_per_segment
    (FIXTURES.md F5 skew fixture) and still round-trip."""
    skewed = transcripts.withColumn(
        "conv_id",
        F.when(F.col("turn_idx") % 3 != 99, F.lit("c_hot")).otherwise(
            F.col("conv_id")))
    # re-number turns so (conv_id, turn_idx) stays unique
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    skewed = skewed.withColumn(
        "turn_idx", (F.row_number().over(w) - 1).cast("int")).cache()
    segs = encode(skewed, num_rowgroups=2, rows_per_segment=100).cache()
    n_rowgroups = segs.select("rowgroup_id").distinct().count()
    assert n_rowgroups >= 10  # 1000 rows / 100 per segment
    assert roundtrip_equal(skewed, decode(segs))["equal"]
    per_rg = [r["n"] for r in segs.where(F.col("column") == "conv_id")
              .select(F.col("n_rows").alias("n")).collect()]
    assert max(per_rg) <= 100
    skewed.unpersist()
    segs.unpersist()


def test_warehouse_resume(spark, transcripts, tmp_path):
    """Kill-and-resume: run 1 commits 2 of 4 rowgroups, run 2 the rest;
    the union must decode bit-identically; rerun 3 is a no-op."""
    wh = Warehouse(str(tmp_path / "wh"))
    r1 = wh.encode_resumable(transcripts, num_rowgroups=4,
                             fail_after_rowgroups=2, run_id="run1")
    assert r1["rowgroups_encoded"] == 2
    r2 = wh.encode_resumable(transcripts, num_rowgroups=4, run_id="run2")
    assert r2["rowgroups_encoded"] == 2
    r3 = wh.encode_resumable(transcripts, num_rowgroups=4, run_id="run3")
    assert r3["rowgroups_encoded"] == 0

    segs = wh.committed_segments(spark)
    assert segs.groupBy("rowgroup_id", "column").count() \
               .where(F.col("count") > 1).count() == 0
    res = roundtrip_equal(transcripts, decode(segs))
    assert res["equal"], res
    # resumed result identical to an uninterrupted run (checksum compare)
    wh2 = Warehouse(str(tmp_path / "wh2"))
    wh2.encode_resumable(transcripts, num_rowgroups=4, run_id="runA")
    a = {(r["rowgroup_id"], r["column"]): r["checksum"]
         for r in segs.select("rowgroup_id", "column", "checksum").collect()}
    b = {(r["rowgroup_id"], r["column"]): r["checksum"]
         for r in wh2.committed_segments(spark)
         .select("rowgroup_id", "column", "checksum").collect()}
    assert a == b


def test_empty_and_single_row_edges(spark, transcripts):
    """Degenerate inputs the skill's edge probes call out: fully-pruned
    (empty) segment decode, empty-input encode, single-row encode."""
    from columnstore_spark.plans.pruning import prune_rowgroups_by_value

    t = transcripts
    segs = encode(t, rowgroup_expr=F.expr(
        "CAST(substring(conv_id, 2) AS BIGINT) % 4"))
    pruned = prune_rowgroups_by_value(segs, "conv_id", "zzz_not_there")
    assert decode(pruned, schema=t.schema).count() == 0

    empty = t.where(F.lit(False))
    es = encode(empty, rowgroup_expr=F.lit(0))
    assert es.count() == 0
    assert decode(es, schema=t.schema).count() == 0

    one = t.limit(1)
    assert decode(encode(one, rowgroup_expr=F.lit(0))).collect() == \
        one.collect()


def test_torn_write_replay_same_run_id(spark, transcripts, tmp_path):
    """Crash-between-segments-and-manifest, then REPLAY with the SAME
    logical run_id (exactly what Structured Streaming does to a
    micro-batch, and what the facade's close() retry does): the torn
    attempt's segment rows must stay invisible — no duplicate
    (rowgroup, column) pairs, bit-identical round-trip."""
    from columnstore_spark.operators.encode import (
        default_rowgroup_expr,
        encode,
    )

    wh = Warehouse(str(tmp_path / "wh_torn"))
    # attempt 1: segments land, manifest append never happens (torn)
    rg = default_rowgroup_expr(4, 1_000_000)
    torn = (encode(transcripts, rowgroup_expr=rg)
            .withColumn("run_id", F.lit("batch-7"))
            .withColumn("attempt_id", F.lit("attempt-dead")))
    wh.backend(spark).append_segments(torn)

    # attempt 2: the replay, same run_id
    r = wh.encode_resumable(transcripts, num_rowgroups=4,
                            run_id="batch-7")
    assert r["rowgroups_encoded"] == 4

    segs = wh.committed_segments(spark)
    dups = (segs.groupBy("rowgroup_id", "column").count()
            .where(F.col("count") > 1).count())
    assert dups == 0
    res = roundtrip_equal(transcripts, decode(segs))
    assert res["equal"], res
