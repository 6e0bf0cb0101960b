"""Round-5 regression gates.

Registry capacity policy (round-4 verdict #8): the driver records a
CORRECTNESS row per `queries()` key in a 50-entry window that is now
EXACTLY full. An accidental 51st key would silently drop the tail from
the correctness record — new operators must merge into an existing
tagged-UNION entry instead. This suite makes that policy a loud test
failure rather than a silent reporting gap.
"""

import __spark_entry__ as entrymod

REGISTRY_CAP = 50


def test_registry_exactly_at_cap():
    qs = entrymod.queries()
    assert len(qs) == REGISTRY_CAP, (
        f"queries() holds {len(qs)} entries; the driver records exactly "
        f"{REGISTRY_CAP} — merge new operators into a tagged-UNION entry "
        "instead of adding a key (round-4 verdict #8)")


def test_every_oracle_key_is_a_query_key():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    stray = set(oracles) - set(qs)
    assert not stray, f"oracle_sql keys without queries(): {sorted(stray)}"


def test_rows_only_queries_are_the_documented_two():
    """Every queries() entry except the two documented rows-only ones
    must carry an oracle — a silently oracle-less entry downgrades its
    correctness row to rows-only without the judge seeing why."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"compression_codecs", "media_entropy"}, rows_only


# -- real decoders: PPM vectorized batch + BMP RLE8 ---------------------------

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_ppm_batched_matches_reference_path(spark):
    """The vectorized (reduceat) PPM batch path must produce exactly
    the per-image reference parser's rows (round-4 verdict #5)."""
    from columnstore_spark.functions.multimodal import (
        media_frame,
        ppm_decode_features,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m = media_frame(docs)
    fast = sorted(map(tuple, ppm_decode_features(m, batched=True)
                      .collect()))
    ref = sorted(map(tuple, ppm_decode_features(m, batched=False)
                     .collect()))
    assert fast == ref and len(fast) > 0


def _rle8_stream(*chunks: bytes) -> bytes:
    """Hand-build a BMP container around a raw RLE8 byte stream."""
    import struct

    body = b"".join(chunks)
    palette = np.zeros((256, 4), dtype=np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256)
    off = 14 + 40 + 1024
    return (struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, 8, 2, 1, 8, 1,
                          len(body), 0, 0, 0, 0)
            + palette.tobytes() + body)


def test_bmp_rle8_absolute_mode_and_delta():
    """The decoder must handle every RLE8 construct the spec defines:
    encoded runs, absolute (literal) runs with word padding, position
    deltas (skipped pixels stay palette index 0), end-of-line and
    end-of-bitmap — not just the generator's encoded-run subset."""
    from columnstore_spark.functions.multimodal import decode_bmp_rle8

    # 8x2 image, bottom-up storage: first stored row = bottom row.
    # row 0 (bottom): encoded 3x7, absolute [1,2,3] (padded), 2 skipped
    # via delta -> zeros; row 1 (top): encoded 8x9
    px = decode_bmp_rle8(_rle8_stream(
        bytes([3, 7]),               # 7 7 7
        bytes([0, 3, 1, 2, 3, 0]),   # absolute run of 3, pad byte
        bytes([0, 2, 2, 0]),         # delta: skip 2 right
        bytes([0, 0]),               # end of line
        bytes([8, 9]),               # full top row of 9s
        bytes([0, 1]),               # end of bitmap
    ))
    assert px.shape == (2, 8, 3)
    # bottom-up flip: stored row 0 is the LAST returned row
    assert px[1, :, 0].tolist() == [7, 7, 7, 1, 2, 3, 0, 0]
    assert px[0, :, 0].tolist() == [9] * 8
    assert (px[..., 0] == px[..., 1]).all()


def test_bmp_rle8_malformed_raises():
    from columnstore_spark.functions.multimodal import decode_bmp_rle8

    with pytest.raises(ValueError):
        decode_bmp_rle8(b"not a bmp")
    with pytest.raises(ValueError):  # run overflows the 8-wide row
        decode_bmp_rle8(_rle8_stream(bytes([9, 1]), bytes([0, 1])))
    with pytest.raises(ValueError):  # stream ends before EOB
        decode_bmp_rle8(_rle8_stream(bytes([2, 5])))


@pytest.mark.parametrize("blob", [
    b"", b"\x00", b"hello world", bytes(range(256)),
    "unicode café × über".encode(), b"\xff" * 300,
])
def test_bmp_generator_roundtrip_properties(blob):
    """Generator->decoder round-trip: width is the run-count sum,
    height 1, grayscale channels agree, and the channel sum equals
    the run-weighted byte sum."""
    from columnstore_spark.functions.multimodal import (
        decode_bmp_rle8,
        encode_bmp_rle8,
    )

    px = decode_bmp_rle8(encode_bmp_rle8(blob))
    b = np.frombuffer(blob if blob else b"\x00", dtype=np.uint8)
    counts = (b % 15).astype(np.int64) + 1
    assert px.shape == (1, int(counts.sum()), 3)
    assert int(px[..., 0].sum(dtype=np.int64)) == int((counts * b).sum())
    assert (px[..., 0] == px[..., 1]).all()
    assert (px[..., 0] == px[..., 2]).all()
