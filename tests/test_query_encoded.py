"""Query-on-encoded golden results — mirrors the reference's
``Decode(value)`` / ``Decode(start,len)`` test pattern
(`DefaultEncodingTests.cs:104-162`, `SequentialEncodingTests.cs:117-175`):
hand-written vectors with expected (start, length) run lists covering
first / middle / last / run / mixed positions, across every codec the
chooser can pick, plus window slices with clipping."""

import pyarrow as pa
import pytest

from columnstore_spark.codecs import CODEC_IDS
from columnstore_spark.codecs.query import query_value, query_window
from columnstore_spark.codecs.segment import encode_segment

I32 = pa.int32()
S = pa.large_utf8()


def seg(values, typ, codec=None):
    return encode_segment(pa.array(values, type=typ),
                          codec=CODEC_IDS[codec] if codec else None)


CASES = [
    # (values, type, probe, expected ranges)
    ([1, 2, 2, 3, 2], I32, 2, [(1, 2), (4, 1)]),          # run + single
    ([1, 2, 2, 3, 2], I32, 1, [(0, 1)]),                  # first
    ([1, 2, 2, 3, 2], I32, 3, [(3, 1)]),                  # middle
    ([1, 2, 2, 3, 2], I32, 9, []),                        # absent
    ([7, 7, 7, 7], I32, 7, [(0, 4)]),                     # all-equal
    (["a", "b", "b", "a"], S, "a", [(0, 1), (3, 1)]),     # string ends
    (["a", "b", "b", "a"], S, "b", [(1, 2)]),             # string run
    (list(range(100)), I32, 99, [(99, 1)]),               # last, distinct
]


@pytest.mark.parametrize("values,typ,probe,expected", CASES)
def test_query_value_auto_codec(values, typ, probe, expected):
    assert query_value(seg(values, typ).payload,
                       "string" if typ == S else "int32", probe) == expected


@pytest.mark.parametrize("codec", ["plain", "dict_rle", "sequential",
                                   "for_bitpack"])
def test_query_value_per_codec(codec):
    values = [5, 5, 9, 5, 1, 1]
    s = seg(values, I32, codec)
    assert query_value(s.payload, "int32", 5) == [(0, 2), (3, 1)]
    assert query_value(s.payload, "int32", 1) == [(4, 2)]
    assert query_value(s.payload, "int32", 404) == []


def test_query_value_with_nulls():
    arr = pa.array([1, None, 1, 2, None], type=I32)
    s = encode_segment(arr)
    assert query_value(s.payload, "int32", 1) == [(0, 1), (2, 1)]
    assert query_value(s.payload, "int32", 2) == [(3, 1)]


@pytest.mark.parametrize("codec", ["plain", "dict_rle", "for_bitpack"])
def test_query_window_clipping(codec):
    values = [10, 10, 20, 20, 20, 30, 30, 40]
    s = seg(values, I32, codec)
    # middle window cutting two runs (clip both edges)
    assert query_window(s.payload, "int32", 1, 5).to_pylist() == \
        values[1:6]
    # window past the end clips
    assert query_window(s.payload, "int32", 6, 99).to_pylist() == values[6:]
    # empty window
    assert query_window(s.payload, "int32", 3, 0).to_pylist() == []
    # full scan
    assert query_window(s.payload, "int32", 0, 8).to_pylist() == values


def test_query_window_strings_dict():
    values = ["x", "x", "y", "z", "z", "z"]
    s = seg(values, S, "dict_rle")
    assert query_window(s.payload, "string", 2, 3).to_pylist() == \
        ["y", "z", "z"]


def test_query_value_decimal_dict():
    """ADVICE round-1: Decimal probes on dict_rle decimal segments must
    rescale to the unscaled domain, not truncate (Decimal('1.23') -> 123
    at scale 2)."""
    from decimal import Decimal

    D = pa.decimal128(10, 2)
    values = [Decimal("1.23"), Decimal("1.23"), Decimal("4.56"),
              Decimal("1.23"), Decimal("-7.89"), Decimal("-7.89")]
    s = seg(values, D, "dict_rle")
    log = "decimal64_10_2"
    assert query_value(s.payload, log, Decimal("1.23")) == [(0, 2), (3, 1)]
    assert query_value(s.payload, log, Decimal("-7.89")) == [(4, 2)]
    assert query_value(s.payload, log, Decimal("9.99")) == []
    # probe finer than the column scale can never match
    assert query_value(s.payload, log, Decimal("1.234")) == []


def test_query_window_decimal_dict():
    """Window over a dict decimal segment must come back as decimal128
    (same type as decode_segment), not raw unscaled int64."""
    from decimal import Decimal

    D = pa.decimal128(10, 2)
    values = [Decimal("1.00"), Decimal("1.00"), Decimal("2.50"),
              Decimal("2.50"), Decimal("3.75")]
    s = seg(values, D, "dict_rle")
    out = query_window(s.payload, "decimal64_10_2", 1, 3)
    assert pa.types.is_decimal(out.type)
    assert out.to_pylist() == values[1:4]


def test_query_value_decimal_generic_codecs():
    from decimal import Decimal

    D = pa.decimal128(12, 3)
    values = [Decimal("0.001") * i for i in range(50)]
    for codec in ("plain", "for_bitpack", "delta_bitpack"):
        s = seg(values, D, codec)
        assert query_value(s.payload, "decimal64_12_3",
                           Decimal("0.007")) == [(7, 1)]
        assert query_window(s.payload, "decimal64_12_3",
                            10, 5).to_pylist() == values[10:15]


def test_query_value_fsst_text():
    values = ["the quick brown fox jumps over the lazy dog " * 8,
              "lorem ipsum dolor sit amet consectetur adipiscing " * 8] * 40
    s = seg(values, S, "fsst")
    assert query_value(s.payload, "string", values[0]) == \
        [(i, 1) for i in range(0, 80, 2)]


# --- probe corners found by review: every equal dict slot must hit,
# ns-timestamp dict probes, mistyped probes never raise, and open-ended
# range bounds still narrow on non-dict codecs ---

def test_signed_zero_hits_every_dict_slot():
    """A float dictionary can hold 0.0 and -0.0 as distinct slots that
    compare equal — equality must return BOTH slots' runs, matching
    the decoded-path (IEEE) semantics."""
    vals = [0.0, -0.0] * 200
    s = seg(vals, pa.float64(), codec="dict_rle")
    got = query_value(s.payload, "float64", 0.0)
    assert sum(ln for _, ln in got) == 400
    assert query_value(s.payload, "float64", -0.0) == got


def test_ns_timestamp_dict_probe():
    import datetime as dt
    typ = pa.timestamp("ns")
    base = dt.datetime(2020, 1, 1)
    vals = [base, base, dt.datetime(2020, 1, 2)] * 30
    s = seg(vals, typ, codec="dict_rle")
    got = query_value(s.payload, "timestamp_ns", base)
    assert sum(ln for _, ln in got) == 60
    # sub-precision probe cannot match any stored value
    s2 = seg(vals, pa.timestamp("s"), codec="dict_rle")
    assert query_value(
        s2.payload, "timestamp_s",
        base.replace(microsecond=5)) == []


def test_mistyped_probe_returns_empty_on_every_codec():
    """The generic decoded path returns [] for a probe of the wrong
    type; the dict fast path must do the same, not raise."""
    for codec in ("dict_rle", "fsst", "plain"):
        s = seg(["a", "b", "b", "a"] * 10, S, codec=codec)
        assert query_value(s.payload, "string", 7) == []


def test_open_ended_range_narrows_on_plain_codec():
    """±inf bounds clamp to the stored dtype instead of overflowing
    pa.scalar into the whole-segment fallback."""
    from columnstore_spark.codecs.query import query_range
    vals = list(range(1000))
    s = seg(vals, pa.int64(), codec="plain")
    assert query_range(s.payload, "int64", float("-inf"), 10.0) == [(0, 11)]
    assert query_range(s.payload, "int64", 990, float("inf")) == [(990, 10)]
