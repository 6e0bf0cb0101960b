"""Event-time streaming: watermarked windowed rollup (late data
dropped, windows finalized exactly once) and the custom stateful
conversation-close operator (the reference's Open->Closed lifecycle
over event time, `DeltaRowGroup.cs:108-131` / `DeltaStore.cs:63-84`)."""

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from columnstore_spark.streaming.ingest import TRANSCRIPT_SCHEMA
from columnstore_spark.streaming.lifecycle import (
    conversation_close_stream,
    turn_rollup_stream,
)

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)


def _row(conv, idx, role, ts_s):
    return (conv, idx, role, f"text {conv} {idx}", None,
            BASE + dt.timedelta(seconds=ts_s))


def _write(spark, rows, path):
    (spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, dirs, build):
    """Drain the stream (availableNow) appending emissions to a parquet
    dir via foreachBatch (memory sink can't recover from a checkpoint);
    returns ALL emissions so far across runs."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(
        dirs["input"])
    out_dir = dirs["out"]

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (build(stream).writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", dirs["ckpt"])
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        return spark.read.parquet(out_dir).toPandas()
    except Exception:
        return pd.DataFrame()


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("input", "ckpt", "out")}
    os.makedirs(d["input"])
    return d


def test_turn_rollup_watermark_drops_late_rows(spark, dirs):
    # run 1: three turns in minute 0, one at minute 5
    _write(spark, [
        _row("cA", 0, "user", 5),
        _row("cA", 1, "assistant", 20),
        _row("cA", 2, "user", 40),
        _row("cB", 0, "user", 300),
    ], dirs["input"])
    _run(spark, dirs,
         lambda s: turn_rollup_stream(s, "1 minute", "2 minutes"))

    # run 2: a LATE row for minute 0 (watermark is already 3:00) plus a
    # fresh row at minute 6 that advances the watermark
    _write(spark, [
        _row("cA", 3, "user", 50),       # late -> dropped
        _row("cB", 1, "assistant", 360),
    ], dirs["input"])
    emitted = _run(spark, dirs,
                   lambda s: turn_rollup_stream(s, "1 minute", "2 minutes"))
    m0 = emitted[emitted["win_start"] == BASE]
    # minute-0 window finalized with the ON-TIME counts only
    assert int(m0["n_turns"].sum()) == 3
    assert set(m0["role"]) == {"user", "assistant"}
    assert int(m0[m0["role"] == "user"]["n_turns"].iloc[0]) == 2
    # each finalized window emitted exactly once across both runs
    assert not emitted.duplicated(["win_start", "role"]).any()
    # minute-5/6 windows not finalized yet (watermark at 4:00)
    assert (emitted["win_start"] > BASE).sum() == 0


def test_conversation_close_emits_on_inactivity(spark, dirs):
    # run 1: conv A finishes early; conv B starts much later
    _write(spark, [
        _row("cA", 0, "user", 0),
        _row("cA", 1, "assistant", 30),
        _row("cB", 0, "user", 300),
    ], dirs["input"])
    _run(spark, dirs, lambda s: conversation_close_stream(s, gap="1 minute"))

    # run 2: B keeps talking; the watermark (5:00 from run 1) is far
    # past A's last turn + gap (1:30) -> A closes, B stays open
    _write(spark, [_row("cB", 1, "assistant", 330)], dirs["input"])
    emitted = _run(spark, dirs,
                   lambda s: conversation_close_stream(s, gap="1 minute"))
    assert list(emitted["conv_id"]) == ["cA"]
    row = emitted.iloc[0]
    assert row["n_turns"] == 2
    assert row["first_ts"] == BASE
    assert row["last_ts"] == BASE + dt.timedelta(seconds=30)


def test_conversation_close_batch_parity(spark, dirs):
    """The streaming close semantics agree with the batch session
    computation for every conversation the watermark has passed."""
    rows = []
    for c in range(4):
        for i in range(c + 1):
            rows.append(_row(f"c{c}", i, "user", c * 120 + i * 10))
    rows.append(_row("late", 0, "user", 3600))  # advances watermark
    _write(spark, rows, dirs["input"])
    _run(spark, dirs, lambda s: conversation_close_stream(s, gap="1 minute"))
    # second run (no-data batch) applies the advanced watermark
    _write(spark, [_row("late", 1, "user", 3660)], dirs["input"])
    out = _run(spark, dirs,
               lambda s: conversation_close_stream(s, gap="1 minute"))

    batch = (pd.DataFrame(rows, columns=[f.name for f in
                                         TRANSCRIPT_SCHEMA.fields])
             .groupby("conv_id")
             .agg(n_turns=("turn_idx", "size"), first_ts=("ts", "min"),
                  last_ts=("ts", "max"))
             .reset_index())
    closed = batch[batch["conv_id"] != "late"]  # watermark passed these
    merged = out.merge(closed, on="conv_id", suffixes=("", "_b"))
    assert len(merged) == len(closed) == 4
    assert (merged["n_turns"] == merged["n_turns_b"]).all()
    assert (merged["first_ts"] == merged["first_ts_b"]).all()
    assert (merged["last_ts"] == merged["last_ts_b"]).all()


def test_dedup_stream_drops_within_watermark(spark, dirs):
    """Streaming exact dedup: re-arrivals of the same text are dropped
    across micro-batches while their hash is inside the watermark
    horizon; the first occurrence always passes."""
    from columnstore_spark.streaming.lifecycle import dedup_stream

    def _doc(conv, idx, text, ts_s):
        return (conv, idx, "user", text, None,
                BASE + dt.timedelta(seconds=ts_s))

    # run 1: two distinct texts, one in-batch duplicate
    _write(spark, [_doc("c0", 0, "alpha", 0), _doc("c1", 0, "beta", 5),
                   _doc("c2", 0, "alpha", 10)], dirs["input"])
    out = _run(spark, dirs,
               lambda s: dedup_stream(s, watermark="10 minutes"))
    assert sorted(out["text"]) == ["alpha", "beta"]

    # run 2: a cross-batch duplicate (state held) + a new text
    _write(spark, [_doc("c3", 0, "alpha", 20), _doc("c4", 0, "gamma", 25)],
           dirs["input"])
    out = _run(spark, dirs,
               lambda s: dedup_stream(s, watermark="10 minutes"))
    assert sorted(out["text"]) == ["alpha", "beta", "gamma"]
    # the kept alpha is the FIRST arrival
    assert out[out["text"] == "alpha"]["conv_id"].iloc[0] == "c0"


def test_duration_spec_parsing():
    from columnstore_spark.streaming.lifecycle import _duration_us
    assert _duration_us("1 minute") == 60_000_000
    assert _duration_us("2 hours 30 minutes") == 9_000_000_000
    assert _duration_us("1 day") == 86_400_000_000
    assert _duration_us("30 sec") == 30_000_000
    assert _duration_us("5 ms") == 5_000
    import pytest as _pytest
    with _pytest.raises(ValueError, match="accepted"):
        _duration_us("1 fortnight")
    with _pytest.raises(ValueError, match="expected"):
        _duration_us("soon")
