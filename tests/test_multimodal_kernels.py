"""Edge cases for the deterministic media kernels: frame sampling and
resize/decimation (multimodal.fake_sample_frames / fake_resize) against
a per-blob pure-Python reference — zero-length blobs, exact frame
boundaries, one-byte payloads, frames shorter than the stride."""
import pyspark.sql.types as T
import pytest

from columnstore_spark.functions.multimodal import (
    FRAME_BYTES,
    fake_resize,
    fake_sample_frames,
)

PAYLOADS = [
    b"",                        # zero-length blob between neighbors
    b"x",                       # single byte
    bytes(range(64)),           # exactly one frame
    bytes(range(65)),           # one full frame + 1-byte tail frame
    bytes((i * 7 + 3) % 256 for i in range(64 * 4)),      # 4 frames
    bytes((i * 13 + 1) % 256 for i in range(64 * 9 + 17)),  # partial 10th
    b"",                        # trailing empty blob
]


def _media_df(spark):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    rows = [(i, "application/octet-stream", p)
            for i, p in enumerate(PAYLOADS)]
    # single partition: all edge blobs land in ONE Arrow batch, so the
    # cumsum-difference kernels see empty blobs adjacent to full ones
    return spark.createDataFrame(rows, schema).coalesce(1)


def _ref_frame_sample(p: bytes, every_n: int = 4):
    frames = [p[i:i + FRAME_BYTES] for i in range(0, len(p), FRAME_BYTES)]
    kept = frames[::every_n]
    return {
        "n_frames": len(frames),
        "n_sampled": len(kept),
        "sampled_bytes": sum(len(f) for f in kept),
        "sampled_byte_sum": sum(sum(f) for f in kept),
    }


def _ref_resize(p: bytes, stride: int = 8):
    kept = p[::stride]
    return {"n_bytes": len(p), "resized_bytes": len(kept),
            "resized_byte_sum": sum(kept)}


@pytest.mark.parametrize("op,ref,cols", [
    (fake_sample_frames, _ref_frame_sample,
     ("n_frames", "n_sampled", "sampled_bytes", "sampled_byte_sum")),
    (fake_resize, _ref_resize,
     ("n_bytes", "resized_bytes", "resized_byte_sum")),
])
def test_kernel_matches_per_blob_reference(spark, op, ref, cols):
    got = {r["doc_id"]: r.asDict() for r in op(_media_df(spark)).collect()}
    assert len(got) == len(PAYLOADS)
    for i, p in enumerate(PAYLOADS):
        want = ref(p)
        for c in cols:
            assert got[i][c] == want[c], (i, c, got[i], want)
