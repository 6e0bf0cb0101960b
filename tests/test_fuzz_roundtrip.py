"""Property-based round-trip fuzzing of the segment codec layer:
whatever Arrow array goes in (any dtype the engine claims, any null
pattern, adversarial values — NaN payloads, int extremes, empty and
unicode strings, decimal extremes) must come back bit-identical from
encode_segment -> decode_segment, under EVERY codec the chooser could
pick. The reference pins behavior with enumerated profiles
(`DefaultEncodingTests.cs`, `DictionaryEncodingTests.cs`); hypothesis
generalizes the same contract to the whole input space."""

import math
from decimal import Context, Decimal

_CTX50 = Context(prec=50)  # scaleb via default 28-digit context rounds

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from columnstore_spark.codecs.segment import decode_segment, encode_segment

MAX_N = 200


def _with_nulls(values_st, null_rate=0.3):
    return st.lists(st.one_of(st.none(), values_st), min_size=0,
                    max_size=MAX_N)


INT64 = _with_nulls(st.integers(min_value=-(2**63), max_value=2**63 - 1))
INT32 = _with_nulls(st.integers(min_value=-(2**31), max_value=2**31 - 1))
FLOATS = _with_nulls(st.floats(allow_nan=True, allow_infinity=True,
                               width=64))
STRINGS = _with_nulls(st.text(max_size=40))
BOOLS = _with_nulls(st.booleans())
DEC38 = _with_nulls(st.integers(min_value=-(10**38 - 1),
                                max_value=10**38 - 1)
                    .map(lambda u: Decimal(u).scaleb(-6, context=_CTX50)))
DEC18 = _with_nulls(st.integers(min_value=-(10**18 - 1),
                                max_value=10**18 - 1)
                    .map(lambda u: Decimal(u).scaleb(-2, context=_CTX50)))


def _roundtrip(values, typ):
    arr = pa.array(values, type=typ)
    seg = encode_segment(arr)
    out = decode_segment(seg.payload, seg.logical)
    assert out.type == arr.cast(out.type).type
    return arr, out


def _assert_equal(arr, out):
    assert len(out) == len(arr)
    a, b = arr.to_pylist(), out.to_pylist()
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float) \
                and math.isnan(x) and math.isnan(y):
            continue
        assert x == y


@settings(max_examples=60, deadline=None)
@given(INT64)
def test_fuzz_int64(values):
    _assert_equal(*_roundtrip(values, pa.int64()))


@settings(max_examples=40, deadline=None)
@given(INT32)
def test_fuzz_int32(values):
    _assert_equal(*_roundtrip(values, pa.int32()))


@settings(max_examples=60, deadline=None)
@given(FLOATS)
def test_fuzz_float64_bit_identical(values):
    arr, out = _roundtrip(values, pa.float64())
    # NaN payloads must survive BIT-identically, not just compare-NaN
    av = arr.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.uint64)
    bv = out.fill_null(0.0).to_numpy(zero_copy_only=False).view(np.uint64)
    assert (av == bv).all()
    assert arr.is_null().equals(out.is_null())


@settings(max_examples=60, deadline=None)
@given(STRINGS)
def test_fuzz_strings(values):
    _assert_equal(*_roundtrip(values, pa.large_utf8()))


@settings(max_examples=30, deadline=None)
@given(BOOLS)
def test_fuzz_bools(values):
    _assert_equal(*_roundtrip(values, pa.bool_()))


@settings(max_examples=40, deadline=None)
@given(DEC18)
def test_fuzz_decimal18(values):
    _assert_equal(*_roundtrip(values, pa.decimal128(18, 2)))


@settings(max_examples=40, deadline=None)
@given(DEC38)
def test_fuzz_decimal38(values):
    _assert_equal(*_roundtrip(values, pa.decimal128(38, 6)))


# stay inside Python datetime's year-9999 ceiling: the comparison via
# as_py() (not the codec) overflows beyond it
_TS_MAX_US = 253_402_300_799 * 1_000_000


@settings(max_examples=30, deadline=None)
@given(_with_nulls(st.integers(min_value=0, max_value=_TS_MAX_US)))
def test_fuzz_timestamps(values):
    _assert_equal(*_roundtrip(values, pa.timestamp("us")))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=MAX_N))
def test_fuzz_binary(values):
    _assert_equal(*_roundtrip(values, pa.large_binary()))