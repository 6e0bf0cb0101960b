"""Stream-static enrichment: a live event stream joined against the
COMMITTED encoded store.

The reference serves point reads from the same store its writer fills
(`IColumnStore` readers alongside `Add`); the streaming analogue at
warehouse scale is Spark's stream-static join — each micro-batch
hash-joins the static side, which here is the store's decoded
DataFrame, so stream rows are enriched from the encoded form without
any external index. The static side re-resolves per micro-batch,
which is exactly the read-committed semantics the facade documents."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from columnstore_spark.store import TranscriptColumnStore


def _write_chunk(df, path: str) -> None:
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_enriched_from_encoded_store(spark, transcripts, tmp_path):
    store = TranscriptColumnStore(spark, str(tmp_path / "store"),
                                  num_rowgroups=4)
    store.add_range(transcripts)
    store.close()

    # static side: first turn of every conversation, off the encoded
    # form (projection keeps only what enrichment needs)
    first_turns = (store.query_by_value("turn_idx", 0,
                                        columns=["conv_id", "role", "ts"])
                   .withColumnRenamed("role", "first_role")
                   .withColumnRenamed("ts", "conv_started"))

    # stream side: conversation-level "events" arriving as files
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    updates = (transcripts.groupBy("conv_id")
               .agg(F.max("turn_idx").alias("last_turn")))
    _write_chunk(updates, in_dir)

    stream = (spark.readStream.schema(updates.schema).parquet(in_dir)
              .join(first_turns, "conv_id"))  # stream-static hash join

    out_dir = str(tmp_path / "out")
    q = (stream.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    exp = updates.join(first_turns, "conv_id")
    assert got.count() == exp.count() == updates.count()
    g = {(r["conv_id"], r["last_turn"], r["first_role"])
         for r in got.collect()}
    e = {(r["conv_id"], r["last_turn"], r["first_role"])
         for r in exp.collect()}
    assert g == e
