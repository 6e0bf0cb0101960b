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


def fake_decode_features(media: DataFrame,
                         num_partitions: int | None = None) -> DataFrame:
    """Deterministic 'decode': per-blob byte statistics via numpy over
    Arrow batches — the real plumbing with a fake kernel.

    byte_mean / byte_entropy are computed vectorized from the
    concatenated blob buffer (np.frombuffer + bincount); no per-row
    Python beyond the blob boundary offsets.
    """
    if num_partitions is None:
        num_partitions = int(media.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))

    def decode_batches(
            it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["payload"]
            lengths = blobs.str.len().to_numpy(dtype=np.int64)
            blob = b"".join(blobs)
            arr = np.frombuffer(blob, dtype=np.uint8)
            off = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=off[1:])
            # clamp start indices: reduceat/fancy-index reject index ==
            # len(arr) (zero-length blob at the tail); clamped lanes are
            # masked by the lengths > 0 guard below
            start = np.minimum(off[:-1], max(arr.size - 1, 0))
            if arr.size:
                means = np.add.reduceat(arr.astype(np.float64), start)
                first = arr[start].astype(np.int32)
            else:
                means = np.zeros(len(lengths))
                first = np.zeros(len(lengths), dtype=np.int32)
            means = np.where(lengths > 0, means / np.maximum(lengths, 1), 0.0)
            ent = np.empty(len(lengths))
            for i in range(len(lengths)):  # per-blob histogram: bounded
                seg = arr[off[i]:off[i + 1]]  # by batch, vectorized inside
                if seg.size == 0:
                    ent[i] = 0.0
                    continue
                counts = np.bincount(seg, minlength=256)
                p = counts[counts > 0] / seg.size
                ent[i] = float(-(p * np.log2(p)).sum())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                "n_bytes": lengths,
                "first_byte": np.where(lengths > 0, first, 0).astype(np.int32),
                "byte_mean": np.round(means, 4),
                "byte_entropy": np.round(ent, 4),
            })

    return (media.repartitionByRange(num_partitions, "doc_id")
            .mapInPandas(decode_batches, DECODED_SCHEMA))
