"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-vectorized decode / feature-extract plumbing.

Images/audio/video are carried as `binary` columns next to a metadata
struct, processed with ``mapInPandas`` (Arrow batches; batch shape =
one pandas DataFrame per partition slice). The image/audio libraries
are not in this container, so the REAL decoders are stubbed behind
clearly-marked NotImplementedError raises; the deterministic fake
decoder exercises the identical Spark plumbing (schema, partitioning,
UDF signature, batch iteration) and is what the tests/oracles cover.

At 100 TB: blobs dominate row size, so the media frame repartitions by
doc_id range to bound per-task bytes, prunes the blob column until the
decode stage (column pruning keeps metadata-only queries blob-free),
and decodes stream per Arrow batch — peak memory is one batch of
blobs, not a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA_FIELDS = [
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
]

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("first_byte", T.IntegerType(), False),
    T.StructField("byte_sum", T.LongType(), False),
    T.StructField("byte_mean", T.DoubleType(), False),
    T.StructField("byte_entropy", T.DoubleType(), False),
])


def media_frame(documents: DataFrame) -> DataFrame:
    """Build the media table: text bytes stand in for image payloads
    (same column shapes a real ingest would produce)."""
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("text/plain").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> dict:
    """Real image decode — requires PIL/libjpeg, absent here.

    STUB (task brief: decode step gated behind NotImplementedError).
    """
    raise NotImplementedError(
        "image decode requires PIL/pillow which is not available in "
        "this environment; use fake_decode_features for the tested "
        "deterministic path")


def sample_video_frames(payload: bytes, every_n: int = 30) -> list:
    """Real video frame sampling — requires pyav/ffmpeg, absent here.

    STUB (task brief: decode step gated behind NotImplementedError).
    """
    raise NotImplementedError(
        "video frame sampling requires pyav/ffmpeg which is not "
        "available in this environment")


FRAME_BYTES = 64  # fixed "frame" size for the deterministic sampler

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_frames", T.LongType(), False),
    T.StructField("n_sampled", T.LongType(), False),
    T.StructField("sampled_bytes", T.LongType(), False),
    T.StructField("sampled_byte_sum", T.LongType(), False),
])

RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("resized_bytes", T.LongType(), False),
    T.StructField("resized_byte_sum", T.LongType(), False),
])


def fake_sample_frames(media: DataFrame,
                       every_n: int = 4) -> DataFrame:
    """Deterministic 'video frame sampling': treat the payload as a
    sequence of fixed ``FRAME_BYTES``-byte frames and keep every
    ``every_n``-th frame (frame 0, every_n, 2*every_n, ...) — the
    plumbing (mapInPandas over Arrow batches, blob-bounded tasks,
    all-integer outputs) is exactly what a pyav-backed sampler would
    ride; only the pixel kernel is faked (`sample_video_frames` is the
    gated real decoder).

    Outputs are pure integers (frame counts, byte coverage, byte sum
    over sampled frames) so the driver's value hash carries zero
    float-formatting risk."""

    def sample_batches(
            it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["payload"]
            lengths = blobs.str.len().to_numpy(dtype=np.int64)
            n = len(lengths)
            arr = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=off[1:])
            n_frames = -(-lengths // FRAME_BYTES)  # ceil-div
            n_sampled = -(-n_frames // every_n)
            # per-byte: offset within its own blob -> frame id -> keep
            row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
            within = np.arange(arr.size, dtype=np.int64) - off[row_id]
            keep = (within // FRAME_BYTES) % every_n == 0
            # exact per-blob sums of the kept lanes via the same
            # cumsum-difference trick as fake_decode_features
            kept_b = np.where(keep, arr, 0).astype(np.int64)
            csb = np.zeros(arr.size + 1, dtype=np.int64)
            np.cumsum(kept_b, out=csb[1:])
            csn = np.zeros(arr.size + 1, dtype=np.int64)
            np.cumsum(keep.astype(np.int64), out=csn[1:])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                "n_frames": n_frames,
                "n_sampled": n_sampled,
                "sampled_bytes": csn[off[1:]] - csn[off[:-1]],
                "sampled_byte_sum": csb[off[1:]] - csb[off[:-1]],
            })

    return media.mapInPandas(sample_batches, FRAME_SAMPLE_SCHEMA)


def fake_resize(media: DataFrame, stride: int = 8) -> DataFrame:
    """Deterministic 'resize': byte decimation — keep bytes at offsets
    0, stride, 2*stride, ... (what a thumbnail pass does to pixels,
    applied to the opaque payload). Same Arrow-batch plumbing and
    integer-output contract as the other fake kernels; `decode_image`
    is the gated real decoder a PIL resize would plug into."""

    def resize_batches(
            it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["payload"]
            lengths = blobs.str.len().to_numpy(dtype=np.int64)
            n = len(lengths)
            arr = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=off[1:])
            row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
            within = np.arange(arr.size, dtype=np.int64) - off[row_id]
            keep = within % stride == 0
            kept_b = np.where(keep, arr, 0).astype(np.int64)
            csb = np.zeros(arr.size + 1, dtype=np.int64)
            np.cumsum(kept_b, out=csb[1:])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                "n_bytes": lengths,
                "resized_bytes": -(-lengths // stride),
                "resized_byte_sum": csb[off[1:]] - csb[off[:-1]],
            })

    return media.mapInPandas(resize_batches, RESIZE_SCHEMA)


def fake_decode_features(media: DataFrame,
                         repartition: int | None = None) -> DataFrame:
    """Deterministic 'decode': per-blob byte statistics via numpy over
    Arrow batches — the real plumbing with a fake kernel.

    Fully vectorized: per-blob sums via int64 cumsum differences (exact
    for any blob arrangement, including zero-length blobs anywhere) and
    per-blob byte histograms via one flat ``np.bincount`` over
    ``row_id*256 + byte`` — no per-row Python anywhere. ``byte_sum`` is
    the exact integer sum (the oracle-checkable stat); ``byte_mean`` /
    ``byte_entropy`` are derived doubles.

    By default the decode maps over the input splits as-is (the scan's
    maxPartitionBytes already bounds per-task blob bytes — shuffling
    every blob through an exchange first was pure waste, round-2
    verdict #5). Pass ``repartition=N`` to range-repartition by doc_id
    when the input genuinely needs re-bucketing (e.g. a few huge
    files with skewed blob sizes)."""

    def decode_batches(
            it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["payload"]
            lengths = blobs.str.len().to_numpy(dtype=np.int64)
            n = len(lengths)
            blob = b"".join(blobs)
            arr = np.frombuffer(blob, dtype=np.uint8)
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=off[1:])
            # exact per-blob sums as cumsum differences (no reduceat
            # index clamping: a zero-length blob yields sum 0 without
            # shortening its neighbor's segment)
            cs = np.zeros(arr.size + 1, dtype=np.int64)
            np.cumsum(arr, dtype=np.int64, out=cs[1:])
            sums = cs[off[1:]] - cs[off[:-1]]
            if arr.size:
                # clamp only the first-byte gather (fancy-index rejects
                # index == len(arr)); clamped lanes are masked below
                first = arr[np.minimum(off[:-1], arr.size - 1)].astype(np.int32)
            else:
                first = np.zeros(n, dtype=np.int32)
            means = np.where(lengths > 0,
                             sums / np.maximum(lengths, 1), 0.0)
            # per-blob 256-bin histograms in one flat bincount
            row_id = np.repeat(np.arange(n, dtype=np.int64), lengths)
            hist = np.bincount(row_id * 256 + arr,
                               minlength=n * 256).reshape(n, 256)
            p = hist / np.maximum(lengths, 1)[:, None]
            logp = np.zeros_like(p)
            np.log2(p, out=logp, where=hist > 0)
            ent = -(p * logp).sum(axis=1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                "n_bytes": lengths,
                "first_byte": np.where(lengths > 0, first, 0).astype(np.int32),
                "byte_sum": sums,
                "byte_mean": np.round(means, 4),
                "byte_entropy": np.round(ent, 4),
            })

    if repartition is not None:
        media = media.repartitionByRange(int(repartition), "doc_id")
    return media.mapInPandas(decode_batches, DECODED_SCHEMA)
