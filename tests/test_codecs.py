"""Codec round-trip tests on the reference's cardinality profiles.

Mirrors the reference's table-driven encode/decode tests
(`Outcompute.ColumnStore.Tests/DefaultEncodingTests.cs:12-88`,
`SequentialEncodingTests.cs:57-115`, `DictionaryEncodingTests.cs:12-138`):
(a) exact value equality after decode, (b) encoded size within the golden
ceilings recorded in BASELINE.md.
"""

import numpy as np
import pyarrow as pa
import pytest

from columnstore_spark.codecs import (
    CODEC_IDS,
    CODEC_NAMES,
    decode_segment,
    encode_segment,
)
from columnstore_spark.codecs import bitpack, dictrle, fsst, sequential
from columnstore_spark.codecs import values as V

N = 1_000_000


def int_profiles():
    # name, values, reference golden ceiling for the *best* ref codec
    return {
        "empty": (np.array([], dtype=np.int32), 64),
        "small": (np.array([1, 2, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4], dtype=np.int32), 26),
        "negative": (np.array([-9, -8, -7], dtype=np.int32), 17),
        "const": (np.ones(N, dtype=np.int32), 12),
        "sparse": ((np.arange(1, N + 1) // 10000).astype(np.int32), 1_000_004),
        "wave": ((np.arange(1, N + 1) % 10000).astype(np.int32), 1_987_204),
        "distinct": (np.arange(1, N + 1).astype(np.int32), 2_983_494),
        "runs_of_1": ((np.arange(N) % 1000).astype(np.int32), 2_874_945),
    }


def str_profiles():
    return {
        "empty": ([], 64),
        "small": (["A", "B", "C", "A", "A", "A", "B", "B", "B", "C", "C", "C", "D"], 64),
        "const": (["Value"] * N, 13_000_004),
        "sparse": ([f"Value{x // 10000}" for x in range(1, N + 1)], 14_830_006),
        "wave": ([f"Value{x % 10000}" for x in range(1, N + 1)], 16_821_804),
        "distinct": ([f"Value{x}" for x in range(1, N + 1)], 18_826_020),
    }


@pytest.mark.parametrize("name", list(int_profiles().keys()))
def test_int_roundtrip_and_ceiling(name):
    vals, ceiling = int_profiles()[name]
    arr = pa.array(vals)
    seg = encode_segment(arr)
    out = decode_segment(seg.payload, seg.logical)
    assert out.to_pylist() == arr.to_pylist()
    assert len(seg.payload) <= ceiling, (
        f"{name}: {len(seg.payload)} > reference ceiling {ceiling} "
        f"(codec {CODEC_NAMES[seg.codec_id]})")


@pytest.mark.parametrize("name", list(str_profiles().keys()))
def test_str_roundtrip_and_ceiling(name):
    vals, ceiling = str_profiles()[name]
    arr = pa.array(vals, type=pa.string())
    seg = encode_segment(arr)
    out = decode_segment(seg.payload, seg.logical)
    assert out.to_pylist() == arr.to_pylist()
    assert len(seg.payload) <= ceiling


def test_sequential_golden_parity():
    """Byte-exact parity with the reference's SequentialEncoding sizes
    (`SequentialEncodingTests.cs:70-83`): id byte + varint(count) + stream."""
    goldens = {
        "const": (np.ones(N, dtype=np.int32), 1_000_004),
        "sparse": ((np.arange(1, N + 1) // 10000).astype(np.int32), 1_000_004),
        "wave": ((np.arange(1, N + 1) % 10000).astype(np.int32), 1_987_204),
        "distinct": (np.arange(1, N + 1).astype(np.int32), 2_983_494),
        "negative": (np.array([-9, -8, -7], dtype=np.int32), 17),
    }
    for name, (vals, golden) in goldens.items():
        body = sequential.encode(vals, "int32")
        total = 1 + len(bitpack.write_varint(len(vals))) + len(body)
        assert total == golden, f"{name}: {total} != {golden}"
        out = sequential.decode(memoryview(body), len(vals), "int32")
        np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("dtype,vals", [
    ("float64", np.array([np.nan, 1.5, np.inf, -np.inf, -0.0, 0.0] * 500)),
    ("float32", np.array([np.nan, 1.5, -0.0] * 500, dtype=np.float32)),
])
def test_float_bit_identical(dtype, vals):
    """NaN payloads and signed zeros must survive (bit-level round-trip,
    the Spark-side analogue of the reference's byte-identical serialization
    asserts `DeltaRowGroupTests.cs:213,253`)."""
    arr = pa.array(vals)
    seg = encode_segment(arr)
    out = decode_segment(seg.payload, seg.logical).to_numpy(zero_copy_only=False)
    width = "<u4" if dtype == "float32" else "<u8"
    np.testing.assert_array_equal(out.view(width), vals.view(width))


def test_distinct_nan_payloads():
    a = np.frombuffer(b"\x00\x00\x00\x00\x00\x00\xf8\x7f", dtype="<f8")
    b = np.frombuffer(b"\x01\x00\x00\x00\x00\x00\xf8\x7f", dtype="<f8")
    vals = np.concatenate([a, b] * 100)
    seg = encode_segment(pa.array(vals))
    out = decode_segment(seg.payload, seg.logical).to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(out.view("<u8"), vals.view("<u8"))


@pytest.mark.parametrize("arr", [
    pa.array(["a", None, "b", None, "a"] * 1000),
    pa.array([1, None, 2, None, 3] * 1000, type=pa.int32()),
    pa.array([None] * 100, type=pa.string()),
    pa.array([None, None, 1.5] * 100, type=pa.float64()),
    pa.array([True, None, False] * 100),
])
def test_null_roundtrip(arr):
    seg = encode_segment(arr)
    out = decode_segment(seg.payload, seg.logical)
    assert out.to_pylist() == arr.to_pylist()
    assert out.null_count == arr.null_count


def test_timestamp_roundtrip():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    gaps = np.cumsum(np.random.RandomState(0).randint(1, 300, 100000))
    ts = base + gaps.astype("timedelta64[us]")
    arr = pa.array(ts)
    seg = encode_segment(arr)
    out = decode_segment(seg.payload, seg.logical)
    assert seg.codec_id == CODEC_IDS["delta_bitpack"]  # monotone -> delta
    np.testing.assert_array_equal(out.to_numpy(zero_copy_only=False), ts)


def test_unicode_and_binary():
    uni = pa.array((["héllo wörld 你好" * 5, "🎉🚀" * 9, "ascii " * 11] * 500)
                   + [f"uniq–{i}·™" for i in range(3000)])
    seg = encode_segment(uni)
    out = decode_segment(seg.payload, seg.logical)
    assert out.to_pylist() == uni.to_pylist()
    rng = np.random.RandomState(7)
    rb = pa.array([rng.randint(0, 256, 64, dtype=np.uint8).tobytes()
                   for _ in range(2000)], type=pa.binary())
    seg = encode_segment(rb)
    out = decode_segment(seg.payload, seg.logical)
    assert out.to_pylist() == rb.to_pylist()


def test_fsst_direct_roundtrip():
    rng = np.random.RandomState(42)
    words = ["transcript", "assistant", "tool", "the", "call", "spark", "a"]
    texts = [" ".join(rng.choice(words, size=rng.randint(5, 60)))
             for _ in range(3000)]
    blob = "".join(texts).encode()
    lengths = np.array([len(t.encode()) for t in texts], dtype=np.int64)
    vc = V.VarChunk(lengths=lengths, blob=blob)
    body = fsst.encode(vc, "string")
    out = fsst.decode(memoryview(body), len(texts), "string")
    assert out.blob == blob
    np.testing.assert_array_equal(out.lengths, lengths)
    assert len(body) < len(blob) * 0.6  # actually compresses prose


def test_dict_first_appearance_order():
    """Dictionary must be first-appearance ordered like the reference
    (`DictionaryEncoding.cs:77-81`)."""
    vals = np.array([5, 3, 5, 9, 3, 5], dtype=np.int64)
    codes, uniques = dictrle.factorize(vals, "int64")
    np.testing.assert_array_equal(uniques, [5, 3, 9])
    np.testing.assert_array_equal(codes, [0, 1, 0, 2, 1, 0])


def test_varint_vectorized():
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 2**62, 10000, dtype=np.int64).astype(np.uint64)
    stream = bitpack.varint_encode_array(vals)
    out, consumed = bitpack.varint_decode_array(stream, len(vals))
    assert consumed == len(stream)
    np.testing.assert_array_equal(out, vals)


def test_bitpack_roundtrip():
    rng = np.random.RandomState(4)
    for width in [0, 1, 3, 7, 8, 13, 31, 33, 64]:
        if width == 0:
            vals = np.zeros(999, dtype=np.uint64)
        else:
            hi = (1 << width) - 1
            vals = rng.randint(0, hi + 1 if hi < 2**63 else 2**63, 999,
                               dtype=np.uint64)
            if width == 64:
                vals = vals * 2 + 1
        packed = bitpack.pack_bits(vals, width)
        out = bitpack.unpack_bits(packed, len(vals), width)
        np.testing.assert_array_equal(out, vals)


def test_varint_decode_rejects_overlong_values():
    """A corrupted stream with 10+ continuation bytes must raise, not
    feed numpy a shift >= 64 (undefined -> silent garbage)."""
    import numpy as np
    import pytest

    from columnstore_spark.codecs import bitpack

    with pytest.raises(ValueError, match="corrupt"):
        bitpack.varint_decode_array(b"\x80" * 12 + b"\x01", 1)
    # a legal 10-byte varint (uint64 max) still round-trips
    enc = bitpack.varint_encode_array(
        np.array([2**64 - 1, 0, 127, 128], dtype=np.uint64))
    out, _ = bitpack.varint_decode_array(enc, 4)
    assert out.tolist() == [2**64 - 1, 0, 127, 128]


def test_empty_gather_and_window_skip_decode_with_right_type():
    """gather_ranges([]) / zero-length windows return a 0-row array of
    the segment's exact arrow type without decoding the body."""
    import numpy as np
    import pyarrow as pa

    from columnstore_spark.codecs.query import gather_ranges, query_window
    from columnstore_spark.codecs.segment import encode_segment

    cases = [
        (pa.array(np.arange(50, dtype=np.int64)), "int64"),
        (pa.array([f"s{i % 5}" for i in range(50)],
                  type=pa.large_utf8()), "string"),
        (pa.array(np.linspace(0, 1, 50)), "float64"),
    ]
    for arr, logical in cases:
        seg = encode_segment(arr)
        payload = seg.payload
        e = gather_ranges(payload, logical, [])
        w = query_window(payload, logical, 10, 0)
        assert len(e) == len(w) == 0
        assert e.type == w.type == arr.type
        # concat with a real gather keeps the type (no drift)
        g = gather_ranges(payload, logical, [(0, 3)])
        assert pa.concat_arrays([e, g]).type == arr.type
