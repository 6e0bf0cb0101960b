"""Event-time streaming operators over the transcript stream —
watermarked windowed rollups and the reference's row-group lifecycle
re-expressed as a custom stateful operator.

Reference mapping: a `DeltaRowGroup` is Open while rows keep arriving
and transitions to Closed when capacity is reached
(`/root/reference/Outcompute.ColumnStore/DeltaRowGroup.cs:108-131`,
states `RowGroupState.cs:3-9`); `DeltaStore.TryTakeClosed` hands
closed groups to compaction (`DeltaStore.cs:63-84`). In event time the
natural close condition for a *conversation* is inactivity: no new
turn for `gap`. `conversation_close_stream` implements exactly that
state machine with ``applyInPandasWithState`` — per-conversation state
(turn count, first/last ts) accumulates while the conversation is
open, and the event-time timeout (watermark passing last_ts + gap)
emits the closed conversation, the streaming analogue of
`TryTakeClosed` returning a closed group.

Scale: state is per conversation key, hash-partitioned across
executors by the streaming state store; each micro-batch touches only
keys with new data plus keys timing out. The watermark bounds state
size — closed conversations leave the store. No per-row Python: the
state function receives whole pandas batches per key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CLOSED_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("n_turns", T.LongType(), False),
    T.StructField("first_ts", T.TimestampType(), False),
    T.StructField("last_ts", T.TimestampType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_turns", T.LongType(), False),
    T.StructField("first_us", T.LongType(), False),
    T.StructField("last_us", T.LongType(), False),
])


def turn_rollup_stream(stream: DataFrame, window: str = "1 minute",
                       watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window rollup: turns per (window, role).

    Late rows within `watermark` of the max event time are folded into
    their window; older ones are dropped and their windows finalized —
    append-mode sinks only ever see a window once.
    """
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "role")
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.length("text")).alias("n_chars"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "role", "n_turns", "n_chars"))


def conversation_close_stream(stream: DataFrame,
                              gap: str = "1 minute",
                              watermark: str = "0 seconds") -> DataFrame:
    """Emit conversations once they close (no turn for `gap`) — the
    Open->Closed state machine over event time.

    Implemented with ``applyInPandasWithState`` + EventTimeTimeout: the
    per-conversation state accumulates (n_turns, first_ts, last_ts)
    while open; the timeout fires when the watermark passes
    last_ts + gap, emitting the closed conversation and dropping its
    state (the reference's `TryTakeClosed`).
    """
    gap_us = _duration_us(gap)
    # Spark hands applyInPandasWithState tz-NAIVE timestamps in the
    # SESSION's time zone, but setTimeoutTimestamp compares against the
    # watermark in true UTC epoch millis — capture the session tz at
    # build time and convert both directions in the state function
    # (identity when the session runs UTC, which session.py pins)
    tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")

    def _out_ts(us: int) -> pd.Timestamp:
        return (pd.Timestamp(us, unit="us", tz="UTC")
                .tz_convert(tz).tz_localize(None))

    def close_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame({
                "conv_id": [key[0]],
                "n_turns": [n],
                "first_ts": [_out_ts(first_us)],
                "last_ts": [_out_ts(last_us)],
            })
            return
        n, first_us, last_us = (state.get if state.exists
                                else (0, None, None))
        for pdf in pdfs:
            if not len(pdf):  # defensive: skip empty Arrow chunks
                continue
            # non-UTC session tz: wall times inside a DST fold/gap are
            # inherently ambiguous — resolve deterministically (DST
            # side / shift forward) instead of crash-looping the query
            ts = (pdf["ts"].dt.tz_localize(tz, ambiguous=True,
                                           nonexistent="shift_forward")
                  .astype("datetime64[us, UTC]").astype("int64"))
            n += len(pdf)
            lo, hi = int(ts.min()), int(ts.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        if last_us is None:  # no rows and no prior state: nothing to track
            return
        state.update((n, first_us, last_us))
        # close when the watermark passes last turn + gap (UTC ms)
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)

    return (stream
            .withWatermark("ts", watermark)
            .groupBy("conv_id")
            .applyInPandasWithState(
                close_fn, CLOSED_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.EventTimeTimeout))


def dedup_stream(stream: DataFrame,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup — the ingest-time analogue of the batch
    `dedup_exact` pipeline op: keep the FIRST occurrence of each text
    (by md5 content hash) and drop re-arrivals within the watermark
    horizon.

    `dropDuplicatesWithinWatermark` keeps state = one row per distinct
    hash, hash-partitioned across executors and expired once the
    watermark passes — at ingest scale the state store holds only the
    dedup horizon, not history. Exact global dedup over the full corpus
    remains the batch op (one shuffle, map-side partial agg)."""
    return (stream
            .withColumn("content_hash", F.md5("text"))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_hash"])
            .drop("content_hash"))  # working column, not output schema


_DURATION_US = {
    "microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
    "sec": 1_000_000, "minute": 60_000_000, "min": 60_000_000,
    "hour": 3_600_000_000, "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _duration_us(spec: str) -> int:
    """Spark-style interval spec ('1 minute', '2 hours 30 minutes',
    '1 day') -> microseconds. Unsupported units fail with the accepted
    list, not a bare KeyError."""
    parts = spec.split()
    if not parts or len(parts) % 2:
        raise ValueError(f"bad duration {spec!r}: expected "
                         "'<n> <unit> [<n> <unit> ...]'")
    total = 0
    for n, unit in zip(parts[::2], parts[1::2]):
        u = unit.lower()
        u = u[:-1] if u.endswith("s") and u not in ("ms", "us") else u
        if u == "ms":
            u = "millisecond"
        elif u == "us":
            u = "microsecond"
        if u not in _DURATION_US:
            raise ValueError(
                f"unsupported duration unit {unit!r} in {spec!r}; "
                f"accepted: {sorted(_DURATION_US)}")
        total += int(n) * _DURATION_US[u]
    return total
