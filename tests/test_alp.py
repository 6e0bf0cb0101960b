"""ALP float codec: bit-exact round-trips, exception patching, chooser
integration, and a size win on decimal-in-disguise doubles.

The reference stores its `double?` TestModel column through
DefaultEncoding at 8 B/value
(`/root/reference/Outcompute.ColumnStore/Encodings/DefaultEncoding.cs:6-11`);
ALP (public VLDB'23 scheme) is our float-family addition to the codec
family, so losslessness has to hold for every float64 bit pattern —
including NaN payloads, -0.0, and infinities.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from columnstore_spark.codecs import alp, chooser, segment


def _roundtrip(vals: np.ndarray, logical: str) -> np.ndarray:
    body = alp.encode(vals, logical)
    return alp.decode(memoryview(body), vals.size, logical)


def _assert_bits_equal(a: np.ndarray, b: np.ndarray) -> None:
    assert a.dtype == b.dtype
    u = np.uint32 if a.dtype == np.float32 else np.uint64
    np.testing.assert_array_equal(a.view(u), b.view(u))


def test_decimal_doubles_roundtrip_and_shrink():
    rng = np.random.default_rng(7)
    # two-decimal prices: the ALP sweet spot
    vals = np.round(rng.uniform(0, 1000, 50_000), 2)
    body = alp.encode(vals, "float64")
    _assert_bits_equal(_roundtrip(vals, "float64"), vals)
    # range 0..100000 at k=2 -> 17-bit ints vs 64-bit plain
    assert len(body) < vals.nbytes / 3


def test_exceptions_patched_bitwise():
    vals = np.round(np.linspace(0.05, 99.95, 64), 2)
    vals[3] = -0.0
    # NaN with a payload: quiet NaN with extra mantissa bits
    vals[11] = np.uint64(0x7FF8_0000_DEAD_BEEF).view(np.float64)
    vals[17] = np.inf
    vals[23] = -np.inf
    vals[29] = np.float64(np.pi)
    vals[37] = 1e300
    _assert_bits_equal(_roundtrip(vals, "float64"), vals)


def test_float32_roundtrip():
    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(-50, 50, 10_000), 1).astype(np.float32)
    vals[::97] = np.float32(np.pi)  # sprinkle exceptions
    _assert_bits_equal(_roundtrip(vals, "float32"), vals)
    assert len(alp.encode(vals, "float32")) < vals.nbytes


def test_negative_exponent_trailing_zero_ints():
    # 12000, 34000, ... : k = -3 packs d = 12, 34, ...
    rng = np.random.default_rng(3)
    vals = (rng.integers(1, 500, 20_000) * 1000.0).astype(np.float64)
    body = alp.encode(vals, "float64")
    _assert_bits_equal(_roundtrip(vals, "float64"), vals)
    assert len(body) < vals.nbytes / 4


def test_estimate_matches_reality():
    rng = np.random.default_rng(5)
    vals = np.round(rng.uniform(0, 10, 8192), 3)
    est = alp.estimate_size(vals, "float64")
    real = len(alp.encode(vals, "float64"))
    assert est is not None
    # the estimate is the chooser's ranking key: exact up to varint slack
    assert abs(est - real) <= 32


def test_chooser_picks_alp_for_decimal_doubles():
    rng = np.random.default_rng(13)
    vals = np.round(rng.uniform(0, 100, 4096), 2)
    arr = pa.array(vals, type=pa.float64())
    seg = segment.encode_segment(arr, mode=chooser.MODE_SIZE)
    assert segment.CODEC_NAMES[seg.codec_id] == "alp"
    out = segment.decode_segment(seg.payload, seg.logical)
    _assert_bits_equal(np.asarray(out, dtype=np.float64), vals)


def test_chooser_rejects_alp_for_true_random_doubles():
    # full-mantissa doubles survive only at k~17 with ~57-bit packed
    # ints — the size arithmetic must rank ALP behind plain
    rng = np.random.default_rng(17)
    vals = rng.standard_normal(4096)
    est = alp.estimate_size(vals, "float64")
    assert est is None or est >= vals.nbytes
    seg = segment.encode_segment(pa.array(vals), mode=chooser.MODE_SIZE)
    assert segment.CODEC_NAMES[seg.codec_id] == "plain"


def test_segment_roundtrip_with_nulls():
    rng = np.random.default_rng(19)
    vals = np.round(rng.uniform(0, 1, 2048), 4)
    py = [None if i % 7 == 0 else float(v) for i, v in enumerate(vals)]
    arr = pa.array(py, type=pa.float64())
    seg = segment.encode_segment(arr, mode=chooser.MODE_SIZE)
    out = segment.decode_segment(seg.payload, seg.logical)
    assert out.equals(arr)


def test_float_profile_goldens():
    """Table-driven float profiles (the float analogue of
    test_codecs.py's reference-golden tables; the reference's best for
    any double column is plain at 8 B/value). Ceilings are our own
    measured sizes +1% slack — a codec/chooser regression that inflates
    any profile fails here."""
    N = 1_000_000
    rng = np.random.default_rng(42)
    profiles = {
        "prices_2dp": (np.round(rng.uniform(0, 10000, N), 2),
                       2_530_000, "alp"),
        "scores_4dp": (np.round(rng.uniform(0, 1, N), 4),
                       1_770_000, "alp"),
        "trailing_zero_ints": ((rng.integers(1, 1000, N) * 1000)
                               .astype(np.float64), 1_270_000, "alp"),
        "random_doubles": (rng.standard_normal(N), 8_000_100, "plain"),
        "nan_sprinkled": (np.where(rng.uniform(size=N) < 0.01, np.nan,
                                   np.round(rng.uniform(0, 100, N), 2)),
                          1_870_000, "alp"),
    }
    for name, (vals, ceiling, codec) in profiles.items():
        seg = segment.encode_segment(pa.array(vals))
        out = segment.decode_segment(seg.payload, seg.logical)
        _assert_bits_equal(np.asarray(out, dtype=np.float64), vals)
        assert segment.CODEC_NAMES[seg.codec_id] == codec, name
        assert len(seg.payload) <= ceiling, (
            f"{name}: {len(seg.payload)} > {ceiling}")


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.one_of(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.decimals(min_value=-10**6, max_value=10**6, places=2)
        .map(float)),
    min_size=1, max_size=300))
def test_fuzz_bit_exact(xs):
    vals = np.array(xs, dtype=np.float64)
    if alp.estimate_size(vals, "float64") is None:
        return  # chooser would never route here
    _assert_bits_equal(_roundtrip(vals, "float64"), vals)
